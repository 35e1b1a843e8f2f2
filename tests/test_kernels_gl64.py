"""Goldilocks-prime MXU Pallas-kernel tests — interpret mode on CPU.

q = 2^64 - 2^32 + 1 is WIDER than the reference's WIDTH=60 ceiling
(rtl/ntt_poly_mult.sv:15-28); the fused kernel covers it via 9 balanced
digits and a phi-fold reducer (kernels/gl64.py).  Oracle: pure-Python
goldens (reference.py, plain big-int arithmetic — independent of the
kernel's digit/fold machinery)."""

import numpy as np
import pytest

from tpu_ntt import reference
from tpu_ntt.modmath import GOLDILOCKS_Q
from tpu_ntt.params import make_params
from tpu_ntt.kernels.gl64 import GoldilocksPlan64
from tpu_ntt.kernels.mxu64 import MxuPlan64

GL_SMALL = make_params(256, GOLDILOCKS_Q)


def enc(rows):
    return (
        np.array([[x >> 32 for x in r] for r in rows], dtype=np.uint32),
        np.array([[x & 0xFFFFFFFF for x in r] for r in rows], dtype=np.uint32),
    )


def dec(hi, lo):
    return (np.asarray(hi).astype(object) << 32) + np.asarray(lo).astype(object)


def make_plan(p):
    mp = GoldilocksPlan64(p)
    mp.groups_per_step = 1  # keep interpret-mode cost down
    return mp


def test_plan_validation():
    with pytest.raises(ValueError):
        GoldilocksPlan64(make_params(256, 576460752303415297))  # not GL q
    with pytest.raises(ValueError):
        # generic double-word plan must keep rejecting width-64 moduli
        MxuPlan64(GL_SMALL)
    mp = GoldilocksPlan64(GL_SMALL)
    assert mp.lazy and mp.nlimbs == 9 and mp.ndiags == 17


def test_nwc_gl_matches_golden_boundary_rows(rng):
    p = GL_SMALL
    mp = make_plan(p)
    B = 3
    a = [[p.q - 1] * p.n,
         [0] * p.n,
         [rng.randrange(p.q) for _ in range(p.n)]]
    b = [[p.q - 1] * p.n,
         [rng.randrange(p.q) for _ in range(p.n)],
         [rng.randrange(p.q) for _ in range(p.n)]]
    got = dec(*mp.nwc_poly_mult(enc(a), enc(b), interpret=True))
    for i in range(B):
        want = reference.nwc_poly_mult(a[i], b[i], p)
        assert [int(v) for v in got[i]] == want


def test_nwc_gl_vs_schoolbook(rng):
    p = GL_SMALL
    mp = make_plan(p)
    a = [[rng.randrange(p.q) for _ in range(p.n)]]
    b = [[rng.randrange(p.q) for _ in range(p.n)]]
    got = dec(*mp.nwc_poly_mult(enc(a), enc(b), interpret=True))
    want = reference.schoolbook_negacyclic(a[0], b[0], p.q)
    assert [int(v) for v in got[0]] == want


def test_cyclic_gl_matches_golden(rng):
    p = GL_SMALL
    mp = make_plan(p)
    a = [[rng.randrange(p.q) for _ in range(p.n)]]
    b = [[p.q - 1] * p.n]
    got = dec(*mp.cyclic_poly_mult(enc(a), enc(b), interpret=True))
    want = reference.cyclic_poly_mult(a[0], b[0], p)
    assert [int(v) for v in got[0]] == want


def test_fwd_gl_matches_golden_and_roundtrips(rng):
    p = GL_SMALL
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


def test_nwc_fwd_gl_matches_twisted_ntt(rng):
    p = GL_SMALL
    mp = make_plan(p)
    x = [rng.randrange(p.q) for _ in range(p.n)]
    hi, lo = mp.nwc_ntt_fwd(enc([x]), interpret=True)
    out = dec(hi, lo)[0]
    twisted = [x[i] * pow(p.psi, i, p.q) % p.q for i in range(p.n)]
    nat = reference.cg_ntt(twisted, p.omega, p.q)
    perm = mp.fourstep_to_natural_perm()
    assert [int(out[perm[j]]) for j in range(p.n)] == nat


def test_nwc_inv_gl_staged_spectrum_product(rng):
    """Staged-spectrum API (Goldilocks): fwd both operands, pointwise
    multiply host-side with big ints, nwc_ntt_inv back — equals the golden
    product; boundary roundtrip included."""
    p = GL_SMALL
    mp = make_plan(p)
    a = [rng.randrange(p.q) for _ in range(p.n)]
    b = [rng.randrange(p.q) for _ in range(p.n)]
    sa = dec(*mp.nwc_ntt_fwd(enc([a]), interpret=True))[0]
    sb = dec(*mp.nwc_ntt_fwd(enc([b]), interpret=True))[0]
    prod = [int(x) * int(y) % p.q for x, y in zip(sa, sb)]
    got = dec(*mp.nwc_ntt_inv(enc([prod]), interpret=True))
    want = reference.nwc_poly_mult(a, b, p)
    assert [int(v) for v in got[0]] == want

    edge = [[0, 1, p.q - 1, 1 << 32, 1 << 63] + [0] * (p.n - 5),
            [p.q - 1] * p.n]
    rt = dec(*mp.nwc_ntt_inv(
        mp.nwc_ntt_fwd(enc(edge), interpret=True), interpret=True
    ))
    assert [[int(v) for v in row] for row in rt] == edge


def test_nwc_dot_gl_wrap_aware_accumulate(rng):
    """K=3 fused dot at width 64: spectrum sums routinely wrap the 64-bit
    pair (q > 2^63), exercising the φ-fold accumulate; all-(q-1) rows
    force near-maximal spectra."""
    p = GL_SMALL
    mp = make_plan(p)
    K = 3
    a = [[[p.q - 1] * p.n], [[rng.randrange(p.q) for _ in range(p.n)]],
         [[rng.randrange(p.q) for _ in range(p.n)]]]
    b = [[[p.q - 1] * p.n], [[p.q - 1] * p.n],
         [[rng.randrange(p.q) for _ in range(p.n)]]]
    enc3 = lambda rows: (
        np.array([[[x >> 32 for x in r] for r in kk] for kk in rows],
                 dtype=np.uint32),
        np.array([[[x & 0xFFFFFFFF for x in r] for r in kk] for kk in rows],
                 dtype=np.uint32),
    )
    got = dec(*mp.nwc_dot(enc3(a), enc3(b), interpret=True))
    want = [0] * p.n
    for k in range(K):
        prod = reference.nwc_poly_mult(a[k][0], b[k][0], p)
        want = [(x + y) % p.q for x, y in zip(want, prod)]
    assert [int(v) for v in got[0]] == want


def test_nwc_dot_cached_matches_dot_gl(rng):
    """dot against precomputed spectrum stacks == the full dot at width
    64 (inherits the φ-fold accumulate; checks the gl64 spectrum-domain
    conventions compose with the cached b-side)."""
    p = GL_SMALL
    mp = make_plan(p)
    K = 2
    a = [[[p.q - 1] * p.n], [[rng.randrange(p.q) for _ in range(p.n)]]]
    b = [[[p.q - 1] * p.n], [[rng.randrange(p.q) for _ in range(p.n)]]]
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


def test_nwc_matvec_cached_matches_golden_gl(rng):
    """Fused A @ s at width 64 (k=l=2, all-(q-1) row forces the φ-fold
    wrap path in the accumulate)."""
    p = GL_SMALL
    mp = make_plan(p)
    k, l = 2, 2
    A = [[[p.q - 1] * p.n, [rng.randrange(p.q) for _ in range(p.n)]],
         [[rng.randrange(p.q) for _ in range(p.n)],
          [rng.randrange(p.q) for _ in range(p.n)]]]
    s = [[[p.q - 1] * p.n], [[rng.randrange(p.q) for _ in range(p.n)]]]
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


def test_cached_spectrum_product_gl(rng):
    p = GL_SMALL
    mp = make_plan(p)
    b = [rng.randrange(p.q) for _ in range(p.n)]
    a_rows = [[rng.randrange(p.q) for _ in range(p.n)],
              [p.q - 1] * p.n]
    spec = mp.nwc_spectrum(enc([b, b]), interpret=True)
    got = dec(*mp.nwc_poly_mult_cached(enc(a_rows), spec, interpret=True))
    for i in range(2):
        want = reference.nwc_poly_mult(a_rows[i], b, p)
        assert [int(v) for v in got[i]] == want


def test_split_standalone_entries_gl_n32768(rng):
    """Round 5: split-radix standalone entries on the Goldilocks kernel
    (const multiplies ride goldilocks_mul; domain scales are all ones so
    the 'plain' inverse leaves coincide with the fused ones).  Forward
    layout via nwc_fourstep_to_natural_perm, staged + cached products vs
    the golden, inverse roundtrip."""
    p = make_params(32768, GOLDILOCKS_Q)
    mp = make_plan(p)
    assert mp._split_depth() == 1
    rnd = rng
    a = [rnd.randrange(p.q) for _ in range(p.n)]
    b = [p.q - 1] * p.n  # boundary operand
    sa = dec(*mp.nwc_ntt_fwd(enc([a]), interpret=True))[0]
    perm = mp.nwc_fourstep_to_natural_perm()
    twisted = [a[i] * pow(p.psi, i, p.q) % p.q for i in range(p.n)]
    nat = reference.cg_ntt(twisted, p.omega, p.q)
    assert [int(sa[perm[j]]) for j in range(p.n)] == nat
    sb = dec(*mp.nwc_ntt_fwd(enc([b]), interpret=True))[0]
    prod = [int(x) * int(y) % p.q for x, y in zip(sa, sb)]
    got = dec(*mp.nwc_ntt_inv(enc([prod]), interpret=True))
    want = reference.nwc_poly_mult(a, b, p)
    assert [int(v) for v in got[0]] == want
    spec = mp.nwc_spectrum(enc([b]), interpret=True)
    got2 = dec(*mp.nwc_poly_mult_cached(enc([a]), spec, interpret=True))
    assert [int(v) for v in got2[0]] == want
