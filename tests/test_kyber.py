"""ML-KEM (Kyber) incomplete-NTT tests: golden self-consistency, the XLA
path, the fused Pallas kernel (interpret mode on CPU), and the routed API —
all bit-exact against the FIPS-203 golden (reference.py) and the schoolbook
negacyclic oracle.

The reference's own exploration of this workload is
test/archive/ntt_inverse_kyber.py (abandoned before RTL); here it is a
production surface.
"""

import random

import numpy as np
import pytest

from tpu_ntt import kyber, reference
from tpu_ntt.kernels.kyber import KyberPlan
from tpu_ntt.reference import KYBER_N, KYBER_Q

Q, N = KYBER_Q, KYBER_N


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
    assert reference.kyber_intt(reference.kyber_ntt(a)) == a
    assert reference.kyber_poly_mult(a, b) == reference.schoolbook_negacyclic(
        a, b, Q
    )


def test_golden_ntt_matches_dense_definitional_form(rng):
    """Cross-check the butterfly network against the definitional dense
    form a_hat[2i] = sum_j a[2j] gamma_i^j — the two independent
    formulations FIPS-203 §4.3 equates (and the form the MXU kernel
    computes as a matmul)."""
    a = rand_poly(rng)
    nt = reference.kyber_ntt(a)
    gam = kyber.gamma_table()
    for i in random.Random(5).sample(range(128), 16):
        e = sum(a[2 * j] * pow(gam[i], j, Q) for j in range(128)) % Q
        o = sum(a[2 * j + 1] * pow(gam[i], j, Q) for j in range(128)) % Q
        assert nt[2 * i] == e and nt[2 * i + 1] == o


def test_golden_basemul_is_quadratic_slot_product(rng):
    """basemul(i) must equal multiplication mod (x^2 - gamma_i)."""
    a, b = rand_poly(rng), rand_poly(rng)
    ah, bh = reference.kyber_ntt(a), reference.kyber_ntt(b)
    ch = reference.kyber_basemul(ah, bh)
    gam = kyber.gamma_table()
    for i in random.Random(6).sample(range(128), 16):
        a0, a1, b0, b1 = ah[2 * i], ah[2 * i + 1], bh[2 * i], bh[2 * i + 1]
        assert ch[2 * i] == (a0 * b0 + a1 * b1 * gam[i]) % Q
        assert ch[2 * i + 1] == (a0 * b1 + a1 * b0) % Q


def test_full_size_params_reject_kyber_q():
    """The motivation for the incomplete transform: q = 3329 supports no
    512th root, so the full-size surface must reject it cleanly."""
    from tpu_ntt.params import make_params

    with pytest.raises(ValueError, match="does not support|q must satisfy"):
        make_params(256, Q)


# ---------------------------------------------------------------------------
# XLA path
# ---------------------------------------------------------------------------


def test_xla_ntt_intt_vs_golden(rng):
    polys = [rand_poly(rng) for _ in range(3)] + BOUNDARY
    x = batch(polys)
    got = np.asarray(kyber.ntt_xla(x))
    for row, p in zip(got, polys):
        assert list(map(int, row)) == reference.kyber_ntt(p)
    back = np.asarray(kyber.intt_xla(got))
    for row, p in zip(back, polys):
        assert list(map(int, row)) == p


def test_xla_basemul_and_poly_mult_vs_golden(rng):
    a, b = rand_poly(rng), rand_poly(rng)
    ah, bh = reference.kyber_ntt(a), reference.kyber_ntt(b)
    got = np.asarray(kyber.basemul_xla(batch([ah]), batch([bh])))[0]
    assert list(map(int, got)) == reference.kyber_basemul(ah, bh)
    prod = np.asarray(kyber.poly_mult_xla(batch([a]), batch([b])))[0]
    assert list(map(int, prod)) == reference.schoolbook_negacyclic(a, b, Q)


# ---------------------------------------------------------------------------
# Fused Pallas kernel (interpret mode on CPU)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def kp():
    return KyberPlan()


def test_kernel_ntt_intt_vs_golden(kp, rng):
    polys = [rand_poly(rng) for _ in range(3)] + BOUNDARY
    x = batch(polys)
    got = np.asarray(kp.ntt(x, interpret=True))
    for row, p in zip(got, polys):
        assert list(map(int, row)) == reference.kyber_ntt(p)
    back = np.asarray(kp.intt(got, interpret=True))
    for row, p in zip(back, polys):
        assert list(map(int, row)) == p


def test_kernel_poly_mult_vs_schoolbook(kp, rng):
    pairs = [(rand_poly(rng), rand_poly(rng)) for _ in range(2)]
    pairs += [([Q - 1] * N, [Q - 1] * N), ([0] * N, rand_poly(rng))]
    a = batch([p[0] for p in pairs])
    b = batch([p[1] for p in pairs])
    got = np.asarray(kp.poly_mult(a, b, interpret=True))
    for row, (pa, pb) in zip(got, pairs):
        assert list(map(int, row)) == reference.schoolbook_negacyclic(
            pa, pb, Q
        )


def test_kernel_batch_padding(kp, rng):
    """Batch sizes that do not divide the 64-poly group size pad safely."""
    for bsz in (1, 63, 65):
        polys = [rand_poly(rng) for _ in range(bsz)]
        got = np.asarray(kp.ntt(batch(polys), interpret=True))
        assert got.shape == (bsz, N)
        assert list(map(int, got[-1])) == reference.kyber_ntt(polys[-1])


def test_kernel_cached_spectrum(kp, rng):
    a, b = rand_poly(rng), rand_poly(rng)
    spec = kp.spectrum(batch([b]), interpret=True)
    got = np.asarray(kp.poly_mult_cached(batch([a]), spec, interpret=True))[0]
    assert list(map(int, got)) == reference.schoolbook_negacyclic(a, b, Q)


def test_kernel_dot_and_dot_cached(kp, rng):
    K, B = 3, 2
    a = [[rand_poly(rng) for _ in range(B)] for _ in range(K)]
    b = [[rand_poly(rng) for _ in range(B)] for _ in range(K)]
    aa = np.array(a, dtype=np.uint32)
    bb = np.array(b, dtype=np.uint32)
    want = []
    for i in range(B):
        acc = [0] * N
        for k in range(K):
            c = reference.schoolbook_negacyclic(a[k][i], b[k][i], Q)
            acc = [(x + y) % Q for x, y in zip(acc, c)]
        want.append(acc)
    got = np.asarray(kp.dot(aa, bb, interpret=True))
    for i in range(B):
        assert list(map(int, got[i])) == want[i]
    specs = np.stack(
        [np.asarray(kp.spectrum(bb[k], interpret=True)) for k in range(K)]
    )
    got2 = np.asarray(kp.dot_cached(aa, specs, interpret=True))
    for i in range(B):
        assert list(map(int, got2[i])) == want[i]


def test_kernel_matvec_vs_loop(kp, rng):
    k, l, B = 2, 3, 2
    A = [[rand_poly(rng) for _ in range(l)] for _ in range(k)]
    s = [[rand_poly(rng) for _ in range(B)] for _ in range(l)]
    blocks = kp.matvec_spectra(np.array(A, dtype=np.uint32), interpret=True)
    got = np.asarray(
        kp.matvec(np.array(s, dtype=np.uint32), blocks, interpret=True)
    )
    assert got.shape == (k, B, N)
    for i in range(k):
        for bidx in range(B):
            acc = [0] * N
            for j in range(l):
                c = reference.schoolbook_negacyclic(A[i][j], s[j][bidx], Q)
                acc = [(x + y) % Q for x, y in zip(acc, c)]
            assert list(map(int, got[i, bidx])) == acc


def test_kernel_ntt_domain_blocks(kp, rng):
    """The FIPS-203 route: A_hat sampled directly in the NTT domain
    (Algorithm 13) — blocks built from plain spectra must match blocks
    built from coefficients."""
    k, l = 2, 2
    A = [[rand_poly(rng) for _ in range(l)] for _ in range(k)]
    A_hat = [[reference.kyber_ntt(A[i][j]) for j in range(l)]
             for i in range(k)]
    via_coeff = np.asarray(
        kp.matvec_spectra(np.array(A, dtype=np.uint32), interpret=True)
    )
    via_ntt = np.asarray(kp.ntt_domain_blocks(np.array(A_hat,
                                                       dtype=np.uint32)))
    assert np.array_equal(via_coeff, via_ntt)


# ---------------------------------------------------------------------------
# Routed public API
# ---------------------------------------------------------------------------


def test_routed_api_vs_golden(rng):
    a, b = rand_poly(rng), rand_poly(rng)
    assert kyber.impl_name() == "pallas-kyber"
    got = np.asarray(kyber.poly_mult(batch([a]), batch([b])))[0]
    assert list(map(int, got)) == reference.schoolbook_negacyclic(a, b, Q)
    nt = np.asarray(kyber.ntt(batch([a])))[0]
    assert list(map(int, nt)) == reference.kyber_ntt(a)
    bm = kyber.basemul(batch([reference.kyber_ntt(a)]),
                       batch([reference.kyber_ntt(b)]))
    assert list(map(int, np.asarray(bm)[0])) == reference.kyber_basemul(
        reference.kyber_ntt(a), reference.kyber_ntt(b)
    )
    back = np.asarray(kyber.intt(batch([reference.kyber_ntt(a)])))[0]
    assert list(map(int, back)) == a


def test_routed_api_composes_under_user_jit(rng):
    """The module-level API must be safe to wrap in a USER jit — including
    when that traced call is the FIRST backend touch (regression: _u32's
    unconditional np.asarray broke on tracers, and a first-touch-under-
    trace staged KyberPlan's constant tables as leaked tracers, poisoning
    the lru_cached backend for every later host call)."""
    import jax

    kyber._backend.cache_clear()
    a, b = rand_poly(rng), rand_poly(rng)
    fn = jax.jit(lambda x, y: kyber.poly_mult(x, y))
    got = np.asarray(fn(batch([a]), batch([b])))[0]
    assert list(map(int, got)) == reference.schoolbook_negacyclic(a, b, Q)
    # host-container path still healthy after the traced first touch
    got2 = np.asarray(kyber.poly_mult([a], [b]))[0]
    assert list(map(int, got2)) == reference.schoolbook_negacyclic(a, b, Q)
