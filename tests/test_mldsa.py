"""ML-DSA (Dilithium, FIPS-204) tests: golden self-consistency, the XLA
serialization-order transforms, the routed kernel API (interpret mode on
CPU), and all three FIPS-204 matrix shapes — bit-exact against the
Algorithm-41/42 golden (reference.py) and the schoolbook negacyclic oracle.

q = 8380417 is the reference's own shipped 24-bit modulus
(rtl/ntt_poly_mult_openroad.sv:22-24); FIPS-204 fixes zeta = 1753 and the
serialization order on top of it.
"""

import numpy as np
import pytest

from tpu_ntt import mldsa, reference
from tpu_ntt.reference import MLDSA_N, MLDSA_Q

Q, N = MLDSA_Q, MLDSA_N


def rand_poly(rng):
    return [rng.randrange(Q) for _ in range(N)]


def batch(polys):
    return np.array(polys, dtype=np.uint32)


BOUNDARY = [[0] * N, [1] * N, [Q - 1] * N,
            [0, Q - 1] * (N // 2), [Q - 1] + [0] * (N - 1)]


# ---------------------------------------------------------------------------
# Golden model
# ---------------------------------------------------------------------------


def test_golden_roundtrip_and_schoolbook(rng):
    a, b = rand_poly(rng), rand_poly(rng)
    assert reference.mldsa_intt(reference.mldsa_ntt(a)) == a
    assert reference.mldsa_poly_mult(a, b) == reference.schoolbook_negacyclic(
        a, b, Q
    )


def test_golden_ntt_is_odd_power_evaluation(rng):
    """Cross-check the FIPS network against the definitional form: the
    NTT representation evaluates w at the 256 odd powers of zeta, in
    bit-reversed arrangement (a_hat[i] = w(zeta^(2*br8(i)+1)))."""
    a = rand_poly(rng)
    nt = reference.mldsa_ntt(a)
    import random

    for i in random.Random(7).sample(range(N), 8):
        root = pow(mldsa.ZETA, 2 * reference._br8(i) + 1, Q)
        want = sum(a[j] * pow(root, j, Q) for j in range(N)) % Q
        assert nt[i] == want


def test_golden_zeta_is_primitive_512th_root():
    assert pow(mldsa.ZETA, 256, Q) == Q - 1
    assert pow(mldsa.ZETA, 512, Q) == 1


# ---------------------------------------------------------------------------
# XLA path (serialization-order contract)
# ---------------------------------------------------------------------------


def test_xla_ntt_intt_vs_golden(rng):
    polys = [rand_poly(rng) for _ in range(3)] + BOUNDARY
    x = batch(polys)
    got = np.asarray(mldsa.ntt_xla(x))
    for row, p in zip(got, polys):
        assert list(map(int, row)) == reference.mldsa_ntt(p)
    back = np.asarray(mldsa.intt_xla(got))
    for row, p in zip(back, polys):
        assert list(map(int, row)) == p


def test_xla_multiply_vs_golden(rng):
    a, b = rand_poly(rng), rand_poly(rng)
    ah, bh = reference.mldsa_ntt(a), reference.mldsa_ntt(b)
    got = np.asarray(mldsa.multiply_xla(batch([ah]), batch([bh])))[0]
    assert list(map(int, got)) == reference.mldsa_multiply(ah, bh)


# ---------------------------------------------------------------------------
# Routed public API (fused MXU kernel, interpret mode on CPU)
# ---------------------------------------------------------------------------


def test_routed_transforms_vs_golden(rng):
    a = rand_poly(rng)
    assert mldsa.impl_name() == "pallas-mxu"
    nt = np.asarray(mldsa.ntt(batch([a])))[0]
    assert list(map(int, nt)) == reference.mldsa_ntt(a)
    back = np.asarray(mldsa.intt(batch([reference.mldsa_ntt(a)])))[0]
    assert list(map(int, back)) == a


def test_routed_poly_mult_vs_schoolbook(rng):
    pairs = [(rand_poly(rng), rand_poly(rng)) for _ in range(2)]
    pairs += [([Q - 1] * N, [Q - 1] * N), ([0] * N, rand_poly(rng))]
    a = batch([p[0] for p in pairs])
    b = batch([p[1] for p in pairs])
    got = np.asarray(mldsa.poly_mult(a, b))
    for row, (pa, pb) in zip(got, pairs):
        assert list(map(int, row)) == reference.schoolbook_negacyclic(
            pa, pb, Q
        )


def test_routed_cached_spectrum(rng):
    a, b = rand_poly(rng), rand_poly(rng)
    spec = mldsa.spectrum(batch([b]))
    got = np.asarray(mldsa.poly_mult_cached(batch([a]), spec))[0]
    assert list(map(int, got)) == reference.schoolbook_negacyclic(a, b, Q)


def test_routed_dot_and_dot_cached(rng):
    K, B = 3, 2
    a = [[rand_poly(rng) for _ in range(B)] for _ in range(K)]
    b = [[rand_poly(rng) for _ in range(B)] for _ in range(K)]
    aa, bb = batch(a), batch(b)
    want = []
    for i in range(B):
        acc = [0] * N
        for k in range(K):
            c = reference.schoolbook_negacyclic(a[k][i], b[k][i], Q)
            acc = [(x + y) % Q for x, y in zip(acc, c)]
        want.append(acc)
    got = np.asarray(mldsa.dot(aa, bb))
    for i in range(B):
        assert list(map(int, got[i])) == want[i]
    specs = np.stack([np.asarray(mldsa.spectrum(bb[k])) for k in range(K)])
    got2 = np.asarray(mldsa.dot_cached(aa, specs))
    for i in range(B):
        assert list(map(int, got2[i])) == want[i]


@pytest.mark.parametrize("level", sorted(mldsa.MATRIX_SHAPES))
def test_routed_matvec_all_fips_shapes(rng, level):
    """A y over all three FIPS-204 matrix shapes: ML-DSA-44 (4,4),
    -65 (6,5), -87 (8,7) — the largest exercises the kernel's k=8 cap."""
    k, l = mldsa.MATRIX_SHAPES[level]
    B = 1
    A = [[rand_poly(rng) for _ in range(l)] for _ in range(k)]
    s = [[rand_poly(rng) for _ in range(B)] for _ in range(l)]
    blocks = mldsa.matvec_spectra(batch(A))
    got = np.asarray(mldsa.matvec(batch(s), blocks))
    assert got.shape == (k, B, N)
    for i in range(k):
        for bidx in range(B):
            acc = [0] * N
            for j in range(l):
                c = reference.schoolbook_negacyclic(A[i][j], s[j][bidx], Q)
                acc = [(x + y) % Q for x, y in zip(acc, c)]
            assert list(map(int, got[i, bidx])) == acc


def test_routed_ntt_domain_blocks(rng):
    """The ExpandA route: blocks built from FIPS-NTT-order spectra must
    match blocks built from coefficients (A_hat never leaves the
    transform domain on the host)."""
    k, l = 2, 2
    A = [[rand_poly(rng) for _ in range(l)] for _ in range(k)]
    A_hat = [[reference.mldsa_ntt(A[i][j]) for j in range(l)]
             for i in range(k)]
    via_coeff = np.asarray(mldsa.matvec_spectra(batch(A)))
    via_ntt = np.asarray(mldsa.ntt_domain_blocks(batch(A_hat)))
    assert np.array_equal(via_coeff, via_ntt)


def test_routed_api_composes_under_user_jit(rng):
    """Same contract as kyber.py: module entry points must be safe to wrap
    in a USER jit, including as the first backend touch."""
    import jax

    mldsa._backend.cache_clear()
    a, b = rand_poly(rng), rand_poly(rng)
    fn = jax.jit(lambda x, y: mldsa.poly_mult(x, y))
    got = np.asarray(fn(batch([a]), batch([b])))[0]
    assert list(map(int, got)) == reference.schoolbook_negacyclic(a, b, Q)
    got2 = np.asarray(mldsa.poly_mult([a], [b]))[0]
    assert list(map(int, got2)) == reference.schoolbook_negacyclic(a, b, Q)
