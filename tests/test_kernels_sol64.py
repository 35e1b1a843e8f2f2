"""Solinas-trinomial MXU Pallas-kernel tests — interpret mode on CPU.

The reference's shipped 60-bit modulus (rtl/ntt_poly_mult.sv:18-24) is
q = 1152921504606830593 = 2^60 - 2^14 + 1, a Solinas trinomial: the
fused kernel reduces via constant shift-add folds with ZERO multiplies
(kernels/sol64.py), keeping the generic 8-digit/15-diagonal matmul.
Oracle: pure-Python goldens (reference.py, plain big-int arithmetic —
independent of the kernel's digit/fold machinery)."""

import numpy as np
import pytest

from tpu_ntt import reference
from tpu_ntt.modmath import GOLDILOCKS_Q
from tpu_ntt.params import PRESETS, make_params
from tpu_ntt.kernels.sol64 import (SolinasPlan64, solinas_exponents,
                                   _DirectFoldPlan, _FoldPlan, _lane_bound)

Q60 = PRESETS["p60_4096"].q  # 1152921504606830593 = 2^60 - 2^14 + 1
SOL_SMALL = make_params(256, Q60)


def enc(rows):
    return (
        np.array([[x >> 32 for x in r] for r in rows], dtype=np.uint32),
        np.array([[x & 0xFFFFFFFF for x in r] for r in rows], dtype=np.uint32),
    )


def dec(hi, lo):
    return (np.asarray(hi).astype(object) << 32) + np.asarray(lo).astype(object)


def make_plan(p):
    mp = SolinasPlan64(p)
    mp.groups_per_step = 1  # keep interpret-mode cost down
    return mp


def test_exponent_detection():
    assert solinas_exponents(Q60) == (60, 14)
    assert solinas_exponents(GOLDILOCKS_Q) == (64, 32)
    assert solinas_exponents(998244353) is None  # 119*2^23+1
    # (the old 60-bit test modulus 576460752303415297 is itself
    # 2^59 - 2^13 + 1 — also coverable!)
    assert solinas_exponents(576460752303415297) == (59, 13)
    assert solinas_exponents(576460752308273153) is None  # 2-adicity-17 prime


def test_plan_validation():
    with pytest.raises(ValueError):
        SolinasPlan64(make_params(256, 576460752308273153))  # not trinomial
    mp = SolinasPlan64(SOL_SMALL)
    assert mp.lazy and mp.nlimbs == 8 and mp.ndiags == 15
    assert mp.cs_lanes == 8
    assert SolinasPlan64.covers_q(Q60, 4096)
    assert SolinasPlan64.covers_q(Q60, 32768)
    assert not SolinasPlan64.covers_q(998244353, 4096)
    # Goldilocks is width 64: outside this plan's operand range
    assert not SolinasPlan64.covers_q(GOLDILOCKS_Q, 4096)


def test_fold_plan_exactness_exhaustive_digits():
    """The _FoldPlan term tables are exact integer identities: re-verify
    Σ coeff·2^16dst ≡ 2^weight (mod q) for every source."""
    f = _FoldPlan(60, 14, _lane_bound(4096), Q60)
    for j, terms in f.src_terms.items():
        got = sum(c << (16 * dst) for dst, c in terms) % Q60
        assert got == pow(2, 16 * j, Q60)
    got = sum(c << (16 * dst) for dst, c in f.c8_terms) % Q60
    assert got == pow(2, 128, Q60)
    # shift decomposition reproduces the coefficients
    for j, shifts in f.src_shifts.items():
        rebuilt = {}
        for dst, s, sign in shifts:
            rebuilt[dst] = rebuilt.get(dst, 0) + sign * (1 << s)
        assert sorted(rebuilt.items()) == sorted(f.src_terms[j])


def test_nwc_sol_matches_golden_boundary_rows(rng):
    p = SOL_SMALL
    mp = make_plan(p)
    a = [[p.q - 1] * p.n,
         [0] * p.n,
         [rng.randrange(p.q) for _ in range(p.n)]]
    b = [[p.q - 1] * p.n,
         [rng.randrange(p.q) for _ in range(p.n)],
         [rng.randrange(p.q) for _ in range(p.n)]]
    got = dec(*mp.nwc_poly_mult(enc(a), enc(b), interpret=True))
    for i in range(3):
        want = reference.nwc_poly_mult(a[i], b[i], p)
        assert [int(v) for v in got[i]] == want


def test_nwc_sol_vs_schoolbook(rng):
    p = SOL_SMALL
    mp = make_plan(p)
    a = [[rng.randrange(p.q) for _ in range(p.n)]]
    b = [[rng.randrange(p.q) for _ in range(p.n)]]
    got = dec(*mp.nwc_poly_mult(enc(a), enc(b), interpret=True))
    want = reference.schoolbook_negacyclic(a[0], b[0], p.q)
    assert [int(v) for v in got[0]] == want


def test_cyclic_sol_matches_golden(rng):
    p = SOL_SMALL
    mp = make_plan(p)
    a = [[rng.randrange(p.q) for _ in range(p.n)]]
    b = [[p.q - 1] * p.n]
    got = dec(*mp.cyclic_poly_mult(enc(a), enc(b), interpret=True))
    want = reference.cyclic_poly_mult(a[0], b[0], p)
    assert [int(v) for v in got[0]] == want


def test_fwd_sol_matches_golden_and_roundtrips(rng):
    p = SOL_SMALL
    mp = make_plan(p)
    x = [[rng.randrange(p.q) for _ in range(p.n)]]
    f = mp.ntt_fwd(enc(x), interpret=True)
    got4 = dec(*f)[0]
    perm = mp.fourstep_to_natural_perm()
    nat = [int(got4[perm[j]]) for j in range(p.n)]
    want = reference.cg_ntt(x[0], p.omega, p.q)
    assert nat == want
    rt = dec(*mp.ntt_inv(f, interpret=True))
    assert [int(v) for v in rt[0]] == x[0]


def test_nwc_inv_sol_staged_spectrum_product(rng):
    p = SOL_SMALL
    mp = make_plan(p)
    a = [rng.randrange(p.q) for _ in range(p.n)]
    b = [rng.randrange(p.q) for _ in range(p.n)]
    sa = dec(*mp.nwc_ntt_fwd(enc([a]), interpret=True))[0]
    sb = dec(*mp.nwc_ntt_fwd(enc([b]), interpret=True))[0]
    prod = [int(x) * int(y) % p.q for x, y in zip(sa, sb)]
    got = dec(*mp.nwc_ntt_inv(enc([prod]), interpret=True))
    want = reference.nwc_poly_mult(a, b, p)
    assert [int(v) for v in got[0]] == want

    edge = [[0, 1, p.q - 1, 1 << 32, 1 << 59] + [0] * (p.n - 5),
            [p.q - 1] * p.n]
    rt = dec(*mp.nwc_ntt_inv(
        mp.nwc_ntt_fwd(enc(edge), interpret=True), interpret=True
    ))
    assert [[int(v) for v in row] for row in rt] == edge


def test_cached_spectrum_product_sol(rng):
    p = SOL_SMALL
    mp = make_plan(p)
    b = [rng.randrange(p.q) for _ in range(p.n)]
    a_rows = [[rng.randrange(p.q) for _ in range(p.n)],
              [p.q - 1] * p.n]
    spec = mp.nwc_spectrum(enc([b, b]), interpret=True)
    got = dec(*mp.nwc_poly_mult_cached(enc(a_rows), spec, interpret=True))
    for i in range(2):
        want = reference.nwc_poly_mult(a_rows[i], b, p)
        assert [int(v) for v in got[i]] == want


def test_toggle_combos_bit_identical(rng):
    """emul_montgomery x direct_fold: all four variants are exact and
    agree with the golden (the defaults are just the measured winners)."""
    p = SOL_SMALL
    a = [[rng.randrange(p.q) for _ in range(p.n)], [p.q - 1] * p.n]
    b = [[rng.randrange(p.q) for _ in range(p.n)], [p.q - 1] * p.n]
    want = [reference.nwc_poly_mult(a[i], b[i], p) for i in range(2)]
    for mont in (True, False):
        for direct in (True, False):
            # emul_montgomery changes the tables: subclass, don't mutate
            cls = type("V", (SolinasPlan64,),
                       {"emul_montgomery": mont, "direct_fold": direct})
            mp = cls(p)
            mp.groups_per_step = 1
            if direct:
                assert mp._fold_direct is not None
            got = dec(*mp.nwc_poly_mult(enc(a), enc(b), interpret=True))
            for i in range(2):
                assert [int(v) for v in got[i]] == want[i], (mont, direct)


def test_direct_fold_rejected_at_large_rows():
    """rows = 256 (n = 32768) exceeds the direct fold's i32 bounds for
    (60, 14): the plan must fall back to the staged fold."""
    with pytest.raises(ValueError):
        _DirectFoldPlan(60, 14, _lane_bound(32768), Q60)


def test_nwc_dot_matches_sum_of_products(rng):
    """Fused spectrum dot (K=3, boundary rows included) == Σ_k a_k ⊛ b_k
    computed via the golden model."""
    p = SOL_SMALL
    mp = make_plan(p)
    K, B = 3, 2
    a = [[[rng.randrange(p.q) for _ in range(p.n)] for _ in range(B)]
         for _ in range(K)]
    b = [[[rng.randrange(p.q) for _ in range(p.n)] for _ in range(B)]
         for _ in range(K)]
    a[0][0] = [p.q - 1] * p.n
    b[0][0] = [p.q - 1] * p.n
    enc3 = lambda rows: (
        np.array([[[x >> 32 for x in r] for r in kk] for kk in rows],
                 dtype=np.uint32),
        np.array([[[x & 0xFFFFFFFF for x in r] for r in kk] for kk in rows],
                 dtype=np.uint32),
    )
    got = dec(*mp.nwc_dot(enc3(a), enc3(b), interpret=True))
    for i in range(B):
        want = [0] * p.n
        for k in range(K):
            prod = reference.nwc_poly_mult(a[k][i], b[k][i], p)
            want = [(x + y) % p.q for x, y in zip(want, prod)]
        assert [int(v) for v in got[i]] == want


def test_nwc_dot_cached_matches_dot(rng):
    """dot against precomputed Montgomery-64 spectrum stacks == the full
    dot (the key-switching shape: K forwards + 1 inverse)."""
    p = SOL_SMALL
    mp = make_plan(p)
    K, B = 2, 1
    a = [[[rng.randrange(p.q) for _ in range(p.n)] for _ in range(B)]
         for _ in range(K)]
    b = [[[rng.randrange(p.q) for _ in range(p.n)] for _ in range(B)]
         for _ in range(K)]
    a[0][0] = [p.q - 1] * p.n
    enc3 = lambda rows: (
        np.array([[[x >> 32 for x in r] for r in kk] for kk in rows],
                 dtype=np.uint32),
        np.array([[[x & 0xFFFFFFFF for x in r] for r in kk] for kk in rows],
                 dtype=np.uint32),
    )
    eb = enc3(b)
    specs = [mp.nwc_spectrum((eb[0][k], eb[1][k]), interpret=True)
             for k in range(K)]
    spectra = (np.stack([np.asarray(s[0]) for s in specs]),
               np.stack([np.asarray(s[1]) for s in specs]))
    got = dec(*mp.nwc_dot_cached(enc3(a), spectra, interpret=True))
    want = dec(*mp.nwc_dot(enc3(a), eb, interpret=True))
    assert (got == want).all()


def test_nwc_matvec_cached_matches_golden(rng):
    """Fused A @ s at width 60 (k=l=2): rows vs golden sums, boundary
    entries included."""
    p = SOL_SMALL
    mp = make_plan(p)
    k, l, B = 2, 2, 1
    A = [[[rng.randrange(p.q) for _ in range(p.n)] for _ in range(l)]
         for _ in range(k)]
    s = [[[rng.randrange(p.q) for _ in range(p.n)] for _ in range(B)]
         for _ in range(l)]
    A[0][0] = [p.q - 1] * p.n
    s[0][0] = [p.q - 1] * p.n
    enc3 = lambda rows: (
        np.array([[[x >> 32 for x in r] for r in kk] for kk in rows],
                 dtype=np.uint32),
        np.array([[[x & 0xFFFFFFFF for x in r] for r in kk] for kk in rows],
                 dtype=np.uint32),
    )
    blocks = mp.nwc_matvec_spectra(enc3(A), interpret=True)
    got = dec(*mp.nwc_matvec_cached(enc3(s), blocks, interpret=True))
    for i in range(k):
        want = [0] * p.n
        for j in range(l):
            prod = reference.nwc_poly_mult(A[i][j], s[j][0], p)
            want = [(x + y) % p.q for x, y in zip(want, prod)]
        assert [int(v) for v in got[i, 0]] == want


def test_second_trinomial_modulus(rng):
    """A different (a, b): q = 2^52 - 2^20 + 1 (prime, 2-adicity 20) —
    exercises the generic fold-term generation away from the shipped
    (60, 14) pair."""
    q = (1 << 52) - (1 << 20) + 1
    p = make_params(256, q)  # make_params verifies primality
    mp = make_plan(p)
    a = [[rng.randrange(q) for _ in range(p.n)], [q - 1] * p.n]
    b = [[rng.randrange(q) for _ in range(p.n)], [q - 1] * p.n]
    got = dec(*mp.nwc_poly_mult(enc(a), enc(b), interpret=True))
    for i in range(2):
        want = reference.nwc_poly_mult(a[i], b[i], p)
        assert [int(v) for v in got[i]] == want
