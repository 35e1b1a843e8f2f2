"""MXU Pallas-kernel bit-exactness tests (SURVEY.md §4 tier (b)).

Run in Pallas interpret mode on CPU so the suite is hardware-independent;
the identical kernels compile and run on real TPU (exercised by bench.py and
the verify flow).  Oracles: pure-Python goldens (new_reference/cg_ntt.py
semantics) and the XLA path.
"""

import numpy as np
import pytest

from tpu_ntt import DILITHIUM_256, P24_1024, P24_4096, P60_4096, NttParams
from tpu_ntt import reference
from tpu_ntt.params import FALCON_512, FALCON_1024
from tpu_ntt.kernels.mxu import MxuPlan

# FALCON presets exercise the 14-bit / 2-limb corner of the int8 path
# (every other preset is 23-24-bit / 3-limb).
PARAMS = [DILITHIUM_256, P24_1024, P24_4096, FALCON_512, FALCON_1024]


def rand_batch(p, b, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, p.q, size=(b, p.n), dtype=np.uint32)


@pytest.mark.parametrize("p", PARAMS, ids=lambda p: p.name)
def test_fwd_matches_golden(p):
    mp = MxuPlan(p)
    a = rand_batch(p, 2, 1)
    got = np.asarray(mp.fourstep_to_natural(mp.ntt_fwd(a, interpret=True)))
    for i in range(2):
        want = reference.cg_ntt([int(v) for v in a[i]], p.omega, p.q)
        assert [int(v) for v in got[i]] == want


@pytest.mark.parametrize("p", PARAMS, ids=lambda p: p.name)
def test_fwd_inv_roundtrip(p):
    mp = MxuPlan(p)
    a = rand_batch(p, mp.t + 1, 2)  # non-multiple of t exercises padding
    rt = np.asarray(mp.ntt_inv(mp.ntt_fwd(a, interpret=True), interpret=True))
    assert (rt == a).all()


@pytest.mark.parametrize("p", PARAMS, ids=lambda p: p.name)
def test_nwc_poly_mult_matches_golden(p):
    mp = MxuPlan(p)
    a, b = rand_batch(p, 2, 3), rand_batch(p, 2, 4)
    got = np.asarray(mp.nwc_poly_mult(a, b, interpret=True))
    for i in range(2):
        want = reference.nwc_poly_mult(
            [int(v) for v in a[i]], [int(v) for v in b[i]], p
        )
        assert [int(v) for v in got[i]] == want


def test_nwc_small_vs_schoolbook():
    p = DILITHIUM_256
    mp = MxuPlan(p)
    a, b = rand_batch(p, 1, 5), rand_batch(p, 1, 6)
    got = np.asarray(mp.nwc_poly_mult(a, b, interpret=True))
    want = reference.schoolbook_negacyclic(
        [int(v) for v in a[0]], [int(v) for v in b[0]], p.q
    )
    assert [int(v) for v in got[0]] == want


def test_cyclic_poly_mult_matches_golden():
    p = P24_1024
    mp = MxuPlan(p)
    a, b = rand_batch(p, 2, 7), rand_batch(p, 2, 8)
    got = np.asarray(mp.cyclic_poly_mult(a, b, interpret=True))
    for i in range(2):
        want = reference.cyclic_poly_mult(
            [int(v) for v in a[i]], [int(v) for v in b[i]], p
        )
        assert [int(v) for v in got[i]] == want


def test_edge_values():
    """Boundary operands q-1 / 0 / 1 (mirrors test_mod_add.py edge tests)."""
    p = DILITHIUM_256
    mp = MxuPlan(p)
    a = np.zeros((3, p.n), dtype=np.uint32)
    b = np.zeros((3, p.n), dtype=np.uint32)
    a[0, :] = p.q - 1
    b[0, :] = p.q - 1
    a[1, 0] = 1  # delta * b = b
    b[1, :] = np.arange(p.n, dtype=np.uint32) % p.q
    a[2, :] = 0
    b[2, :] = p.q - 1
    got = np.asarray(mp.nwc_poly_mult(a, b, interpret=True))
    for i in range(3):
        want = reference.nwc_poly_mult(
            [int(v) for v in a[i]], [int(v) for v in b[i]], p
        )
        assert [int(v) for v in got[i]] == want


def test_nwc_dot_matches_sum_of_products():
    """Fused spectrum dot (K=4, the Dilithium A@s row shape) == the sum
    of golden products; K=1 degenerates to nwc_poly_mult."""
    p = DILITHIUM_256
    mp = MxuPlan(p)
    rng = np.random.default_rng(11)
    K, B = 4, 2
    a = rng.integers(0, p.q, size=(K, B, p.n), dtype=np.uint32)
    b = rng.integers(0, p.q, size=(K, B, p.n), dtype=np.uint32)
    a[0, 0, :] = p.q - 1
    b[0, 0, :] = p.q - 1
    got = np.asarray(mp.nwc_dot(a, b, interpret=True))
    for i in range(B):
        want = [0] * p.n
        for k in range(K):
            prod = reference.nwc_poly_mult(
                [int(v) for v in a[k, i]], [int(v) for v in b[k, i]], p
            )
            want = [(x + y) % p.q for x, y in zip(want, prod)]
        assert [int(v) for v in got[i]] == want
    one = np.asarray(mp.nwc_dot(a[:1], b[:1], interpret=True))
    single = np.asarray(mp.nwc_poly_mult(a[0], b[0], interpret=True))
    assert (one == single).all()
    with pytest.raises(ValueError, match="1 <= K <= 8"):
        mp.nwc_dot(np.zeros((9, 1, p.n), np.uint32),
                   np.zeros((9, 1, p.n), np.uint32), interpret=True)


def test_nwc_dot_cached_matches_dot():
    """dot against precomputed nwc_spectrum stacks == the full dot (the
    fixed-key / public-A shape: K forwards + 1 inverse)."""
    p = DILITHIUM_256
    mp = MxuPlan(p)
    rng = np.random.default_rng(13)
    K, B = 3, 2
    a = rng.integers(0, p.q, size=(K, B, p.n), dtype=np.uint32)
    b = rng.integers(0, p.q, size=(K, B, p.n), dtype=np.uint32)
    a[0, 0, :] = p.q - 1
    b[0, 0, :] = p.q - 1
    spectra = np.stack(
        [np.asarray(mp.nwc_spectrum(b[k], interpret=True)) for k in range(K)]
    )
    got = np.asarray(mp.nwc_dot_cached(a, spectra, interpret=True))
    want = np.asarray(mp.nwc_dot(a, b, interpret=True))
    assert (got == want).all()


def test_nwc_matvec_cached_matches_golden():
    """Fused A @ s (k=2, l=3): every output row == Σ_j A[i,j] ⊛ s[j] via
    the golden model; boundary all-(q-1) entries included."""
    p = DILITHIUM_256
    mp = MxuPlan(p)
    rng = np.random.default_rng(19)
    k, l, B = 2, 3, 2
    A = rng.integers(0, p.q, size=(k, l, p.n), dtype=np.uint32)
    s = rng.integers(0, p.q, size=(l, B, p.n), dtype=np.uint32)
    A[0, 0, :] = p.q - 1
    s[0, 0, :] = p.q - 1
    blocks = mp.nwc_matvec_spectra(A, interpret=True)
    out = np.asarray(mp.nwc_matvec_cached(s, blocks, interpret=True))
    assert out.shape == (k, B, p.n)
    for i in range(k):
        for bb in range(B):
            want = [0] * p.n
            for j in range(l):
                prod = reference.nwc_poly_mult(
                    [int(v) for v in A[i, j]], [int(v) for v in s[j, bb]], p
                )
                want = [(x + y) % p.q for x, y in zip(want, prod)]
            assert [int(v) for v in out[i, bb]] == want
    with pytest.raises(ValueError, match="rows"):
        mp.nwc_matvec_cached(s[:1], blocks, interpret=True)


def test_balanced_and_zero_point_bit_identical():
    """The balanced-digit matmul (default) and the legacy zero-point
    scheme are exact rewrites of the same reduction: boundary + random
    batches must agree bit-for-bit (the toggle is a measured ablation,
    BENCH_NOTES.md round 2)."""
    p = DILITHIUM_256
    rng = np.random.default_rng(7)
    a = rng.integers(0, p.q, size=(3, p.n), dtype=np.uint32)
    b = rng.integers(0, p.q, size=(3, p.n), dtype=np.uint32)
    a[0, :] = p.q - 1
    b[0, :] = p.q - 1
    outs = []
    for bal in (True, False):
        cls = type("V", (MxuPlan,), {"balanced": bal})
        mp = cls(p)
        outs.append(np.asarray(mp.nwc_poly_mult(a, b, interpret=True)))
        spec = mp.nwc_spectrum(b, interpret=True)
        cached = np.asarray(
            mp.nwc_poly_mult_cached(a, spec, interpret=True))
        assert (cached == outs[-1]).all()
    assert (outs[0] == outs[1]).all()
    want = reference.nwc_poly_mult(
        [int(v) for v in a[0]], [int(v) for v in b[0]], p
    )
    assert [int(v) for v in outs[0][0]] == want


def test_rejects_wide_modulus():
    with pytest.raises(ValueError, match="2\\^24"):
        MxuPlan(P60_4096)


def test_rejects_small_n():
    with pytest.raises(ValueError):
        MxuPlan(NttParams(n=128, q=8380417, psi=3241972, name="tiny"))


def test_fourstep_perm_is_involution_consistent():
    mp = MxuPlan(P24_4096)
    perm = mp.fourstep_to_natural_perm()
    inv = np.argsort(perm)
    x = np.arange(P24_4096.n)
    assert (x[perm][inv] == x).all()


def test_nwc_fwd_kernel_matches_twisted_ntt(rng):
    """Folded forward kernel = psi-twist + cyclic NTT, four-step layout."""
    p = DILITHIUM_256
    mp = MxuPlan(p)
    x = [rng.randrange(p.q) for _ in range(p.n)]
    out = np.asarray(
        mp.nwc_ntt_fwd(np.array([x], dtype=np.uint32), interpret=True)
    )[0]
    twisted = [x[i] * pow(p.psi, i, p.q) % p.q for i in range(p.n)]
    nat = reference.cg_ntt(twisted, p.omega, p.q)
    perm = mp.fourstep_to_natural_perm()
    assert [int(out[perm[j]]) for j in range(p.n)] == nat


def test_nwc_inv_kernel_staged_spectrum_product(rng):
    """Staged-spectrum API: nwc_ntt_fwd both operands, pointwise multiply
    host-side (independent big-int), nwc_ntt_inv back — equals the golden
    negacyclic product; plus a boundary-operand roundtrip."""
    p = DILITHIUM_256
    mp = MxuPlan(p)
    a = [rng.randrange(p.q) for _ in range(p.n)]
    b = [rng.randrange(p.q) for _ in range(p.n)]
    sa = np.asarray(
        mp.nwc_ntt_fwd(np.array([a], dtype=np.uint32), interpret=True)
    ).astype(object)
    sb = np.asarray(
        mp.nwc_ntt_fwd(np.array([b], dtype=np.uint32), interpret=True)
    ).astype(object)
    prod = ((sa * sb) % p.q).astype(np.uint32)
    got = np.asarray(mp.nwc_ntt_inv(prod, interpret=True))
    want = reference.nwc_poly_mult(a, b, p)
    assert [int(v) for v in got[0]] == want

    edge = np.array([[0, 1, p.q - 1] + [0] * (p.n - 3),
                     [p.q - 1] * p.n], dtype=np.uint32)
    rt = mp.nwc_ntt_inv(mp.nwc_ntt_fwd(edge, interpret=True), interpret=True)
    assert (np.asarray(rt) == edge).all()


def test_largest_kernel_n_16384(rng):
    """n = 16384 (n1 = 128, t = 1: the full-dense-W1 edge case) with a
    24-bit prime of 2-adicity 15 (q = 506*32768 + 1), checked against the
    independent native oracle (beyond the reference's largest n = 4096)."""
    from tpu_ntt import native
    from tpu_ntt.params import make_params

    if not native.available():
        pytest.skip("native oracle unavailable")
    p = make_params(16384, 16580609)
    mp = MxuPlan(p)
    assert (mp.n1, mp.t) == (128, 1)
    a = [rng.randrange(p.q) for _ in range(p.n)]
    b = [rng.randrange(p.q) for _ in range(p.n)]
    got = np.asarray(
        mp.nwc_poly_mult(
            np.array([a], dtype=np.uint32), np.array([b], dtype=np.uint32),
            interpret=True,
        )
    )[0]
    want = native.nwc_fast(a, b, p.q, p.psi)
    assert [int(v) for v in got] == want


def test_cached_spectrum_product(rng):
    """Repeated-operand workload: NTT(b) cached once, many a*b products —
    one forward transform per product instead of two."""
    p = DILITHIUM_256
    mp = MxuPlan(p)
    b = [rng.randrange(p.q) for _ in range(p.n)]
    a_rows = [[rng.randrange(p.q) for _ in range(p.n)] for _ in range(3)]
    spec = mp.nwc_spectrum(np.array([b] * 3, dtype=np.uint32), interpret=True)
    got = np.asarray(
        mp.nwc_poly_mult_cached(np.array(a_rows, dtype=np.uint32), spec,
                                interpret=True)
    )
    for i in range(3):
        want = reference.nwc_poly_mult(a_rows[i], b, p)
        assert [int(v) for v in got[i]] == want
