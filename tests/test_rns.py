"""RNS/CRT wide-modulus negacyclic multiplication (VERDICT.md next #8).

The reference caps WIDTH at 60 (rtl/ntt_poly_mult.sv:15-28); RNS extends
the framework to arbitrary moduli — including non-NTT-friendly ones — by
running each residue channel on the standard (kernel-backed) dispatch
path and recombining exactly via CRT.
"""

import random

import numpy as np
import pytest

from tpu_ntt import rns
from tpu_ntt.modmath import GOLDILOCKS_Q
from tpu_ntt.params import make_params


def schoolbook_nwc(a, b, q):
    n = len(a)
    c = [0] * n
    for i in range(n):
        if not a[i]:
            continue
        for j in range(n):
            k = i + j
            v = a[i] * b[j]
            if k >= n:
                c[k - n] = (c[k - n] - v) % q
            else:
                c[k] = (c[k] + v) % q
    return c


def test_ntt_friendly_primes():
    ps = rns.ntt_friendly_primes(4096, 24, 3)
    assert len(ps) == 3 and len(set(ps)) == 3
    for p in ps:
        assert p.bit_length() <= 24 and (p - 1) % 8192 == 0


def test_rns_80bit_modulus_vs_bigint_oracle(rng):
    """>62-bit modulus (80-bit prime, NOT NTT-friendly) — the headline
    deliverable: bit-exact vs an independent big-int schoolbook."""
    q = (1 << 80) - 65  # 2^80 - 65 is prime
    from tpu_ntt.params import _is_probable_prime

    assert _is_probable_prime(q)
    assert (q - 1) % 512 != 0  # genuinely not NTT-friendly for n=256
    n = 256
    a = [rng.randrange(q) for _ in range(n)]
    b = [rng.randrange(q) for _ in range(n)]
    got = rns.nwc_poly_mult(n, q, a, b)
    assert [int(v) for v in got] == schoolbook_nwc(a, b, q)


def test_rns_128bit_modulus_small_n(rng):
    q = (1 << 128) - 159  # prime
    n = 64
    a = [rng.randrange(q) for _ in range(n)]
    b = [rng.randrange(q) for _ in range(n)]
    got = rns.nwc_poly_mult(n, q, a, b)
    assert [int(v) for v in got] == schoolbook_nwc(a, b, q)


def test_rns_batched_and_matches_direct_ring(rng):
    """For a modulus the direct Ring64 path also supports, RNS must agree."""
    from tpu_ntt import reference

    p = make_params(256, 1152921504606830593)  # the 60-bit preset prime
    a = [[rng.randrange(p.q) for _ in range(p.n)] for _ in range(2)]
    b = [[rng.randrange(p.q) for _ in range(p.n)] for _ in range(2)]
    got = rns.nwc_poly_mult(p.n, p.q, a, b)
    for i in range(2):
        assert [int(v) for v in got[i]] == reference.nwc_poly_mult(
            a[i], b[i], p
        )


def test_goldilocks_ring_and_transform(rng):
    """Goldilocks prime 2^64 - 2^32 + 1: dedicated special-form reduction
    ring, full transform path (VERDICT.md next #8 second half)."""
    import jax
    from tpu_ntt import reference
    from tpu_ntt.modmath import make_ring, GoldilocksRing
    from tpu_ntt.ntt import NttPlan, nwc_poly_mult_merged

    q = GOLDILOCKS_Q
    p = make_params(256, q, name="goldilocks_256")
    ring = make_ring(p)
    assert isinstance(ring, GoldilocksRing)

    edge = [0, 1, q - 1, q - 2, (1 << 32) - 1, 1 << 32, 1 << 63, q >> 1]
    pairs = [(a, b) for a in edge for b in edge] + [
        (rng.randrange(q), rng.randrange(q)) for _ in range(128)
    ]
    a = ring.encode([x for x, _ in pairs])
    b = ring.encode([y for _, y in pairs])
    mul = ring.decode(ring.mul(a, b))
    add = ring.decode(ring.add(a, b))
    sub = ring.decode(ring.sub(a, b))
    for (x, y), m, s, d in zip(pairs, mul, add, sub):
        assert m == x * y % q
        assert s == (x + y) % q
        assert d == (x - y) % q

    plan = NttPlan(p)
    av = [rng.randrange(q) for _ in range(p.n)]
    bv = [rng.randrange(q) for _ in range(p.n)]
    got = plan.decode(
        jax.jit(lambda u, v: nwc_poly_mult_merged(plan, u, v))(
            plan.encode(av), plan.encode(bv)
        )
    )
    assert list(got) == reference.nwc_poly_mult(av, bv, p)


def test_wide_modulus_rejected_by_direct_ring():
    """A >62-bit non-Goldilocks modulus cannot use the double-word ring;
    the error must point at the RNS path."""
    from tpu_ntt.modmath import make_ring

    q80 = rns.ntt_friendly_primes(64, 80, 1)[0]
    with pytest.raises(ValueError, match="rns"):
        make_ring(make_params(64, q80))


# ---------------------------------------------------------------------------
# RnsRing: RNS-resident ring (q = prod p_j) + exact device reconstruction
# ---------------------------------------------------------------------------


def test_rns_ring_roundtrip_and_product(rng=random.Random(40)):
    n = 256
    ring = rns.RnsRing(n, channels=6)
    q = ring.q
    assert q.bit_length() >= 128  # a CKKS-scale ciphertext modulus
    a = [rng.randrange(q) for _ in range(n)]
    b = [rng.randrange(q) for _ in range(n)]
    ra, rb = ring.encode([a]), ring.encode([b])
    # roundtrip
    assert [int(v) for v in ring.decode(ra)[0]] == a
    # single product vs big-int oracle
    rc = ring.nwc_mult(ra, rb)
    assert [int(v) for v in ring.decode(rc)[0]] == schoolbook_nwc(a, b, q)


def test_rns_ring_chained_ops_stay_exact(rng=random.Random(41)):
    """The FHE-practice property: products/adds chain indefinitely in RNS
    (q = prod p_j makes per-channel reduction reduction mod q) with no
    recombination between operations."""
    n = 256
    ring = rns.RnsRing(n, channels=4)
    q = ring.q
    a = [rng.randrange(q) for _ in range(n)]
    b = [rng.randrange(q) for _ in range(n)]
    ra, rb = ring.encode([a]), ring.encode([b])
    # d = (a*b + a) * b - b
    rc = ring.add(ring.nwc_mult(ra, rb), ra)
    rd = ring.sub(ring.nwc_mult(rc, rb), rb)
    t = schoolbook_nwc(a, b, q)
    t = [(x + y) % q for x, y in zip(t, a)]
    want = schoolbook_nwc(t, b, q)
    want = [(x - y) % q for x, y in zip(want, b)]
    assert [int(v) for v in ring.decode(rd)[0]] == want


def test_rns_ring_device_reconstruction(rng=random.Random(42)):
    """reconstruct_words (exact on-device CRT, float32 k-estimate + exact
    fixups) must match the host big-int decode bit-for-bit — including the
    k-estimate edge cases (c = 0, c = q-1, single tiny coefficient)."""
    n = 256
    ring = rns.RnsRing(n, channels=6)
    q = ring.q
    rows = [
        [rng.randrange(q) for _ in range(n)],
        [0] * n,
        [q - 1] * n,
        [1] + [0] * (n - 1),
        [q - 1] + [0] * (n - 1),
    ]
    res = ring.encode(rows)
    want = ring.decode(res)
    got = ring.decode_words(np.asarray(ring.reconstruct_words(res)))
    assert (want == got).all()
    # and through a product (the real exit path)
    ra = ring.encode([rows[0]])
    rc = ring.nwc_mult(ra, ra)
    want_c = ring.decode(rc)
    got_c = ring.decode_words(np.asarray(ring.reconstruct_words(rc)))
    assert (want_c == got_c).all()


def test_rns_ring_rejects_duplicate_moduli():
    with pytest.raises(ValueError, match="distinct"):
        rns.RnsRing(256, moduli=[16770049, 16770049])
