"""Modular-arithmetic kernel tests (oracle tier 2, SURVEY.md §4).

Mirrors the reference's arithmetic unit tests (test/cocotb_tests/
test_mod_add.py, test_mod_mult.py, test_barrett_*.py): random + boundary
operands (0, 1, q-1) for every backend and both widths, checked against
Python big-int arithmetic.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_ntt import modmath as mm
from tpu_ntt.params import DILITHIUM_256, P60_4096, Reduction

Q24 = DILITHIUM_256.q
Q60 = P60_4096.q


def boundary_pairs(q, rng, count=64):
    edge = [0, 1, 2, q - 1, q - 2, q // 2]
    pairs = [(a, b) for a in edge for b in edge]
    pairs += [(rng.randrange(q), rng.randrange(q)) for _ in range(count)]
    return pairs


def test_mul32_exact(rng):
    cases = [(0, 0), (1, 1), (0xFFFFFFFF, 0xFFFFFFFF), (0x80000000, 2)]
    cases += [(rng.randrange(1 << 32), rng.randrange(1 << 32)) for _ in range(200)]
    a = jnp.array([c[0] for c in cases], dtype=jnp.uint32)
    b = jnp.array([c[1] for c in cases], dtype=jnp.uint32)
    hi, lo = mm.mul32(a, b)
    for (x, y), h, l in zip(cases, np.asarray(hi), np.asarray(lo)):
        prod = x * y
        assert (int(h) << 32 | int(l)) == prod, (x, y)


def test_add_sub_mod32(rng):
    pairs = boundary_pairs(Q24, rng)
    a = jnp.array([p[0] for p in pairs], dtype=jnp.uint32)
    b = jnp.array([p[1] for p in pairs], dtype=jnp.uint32)
    s = np.asarray(mm.add_mod32(a, b, Q24))
    d = np.asarray(mm.sub_mod32(a, b, Q24))
    for (x, y), sv, dv in zip(pairs, s, d):
        assert int(sv) == (x + y) % Q24
        assert int(dv) == (x - y) % Q24


@pytest.mark.parametrize("backend", ["barrett", "montgomery"])
def test_mul_mod32(backend, rng):
    p = DILITHIUM_256
    pairs = boundary_pairs(Q24, rng, count=256)
    a = jnp.array([c[0] for c in pairs], dtype=jnp.uint32)
    b = jnp.array([c[1] for c in pairs], dtype=jnp.uint32)
    if backend == "barrett":
        out = mm.barrett_mul32(a, b, Q24, p.barrett_k, p.barrett_mu)
        expected = [(x * y) % Q24 for x, y in pairs]
    else:
        # REDC returns a*b*R^-1; compare against that directly.
        out = mm.mont_mul32(a, b, Q24, p.mont_q_prime)
        r_inv = pow(p.mont_r, Q24 - 2, Q24)
        expected = [(x * y * r_inv) % Q24 for x, y in pairs]
    for (x, y), got, want in zip(pairs, np.asarray(out), expected):
        assert int(got) == want, (x, y)


def test_mul64_full_exact(rng):
    cases = [(0, 0), (1, (1 << 64) - 1), ((1 << 64) - 1, (1 << 64) - 1)]
    cases += [(rng.randrange(1 << 64), rng.randrange(1 << 64)) for _ in range(200)]
    a = mm.encode64([c[0] for c in cases])
    b = mm.encode64([c[1] for c in cases])
    a = (jnp.asarray(a[0]), jnp.asarray(a[1]))
    b = (jnp.asarray(b[0]), jnp.asarray(b[1]))
    w3, w2, w1, w0 = [np.asarray(w) for w in mm.mul64_full(a, b)]
    for (x, y), ws in zip(cases, zip(w3, w2, w1, w0)):
        got = sum(int(w) << (32 * i) for i, w in enumerate(reversed(ws)))
        assert got == x * y, (x, y)


def test_mul64_lo_exact(rng):
    cases = [(rng.randrange(1 << 64), rng.randrange(1 << 64)) for _ in range(100)]
    a = tuple(map(jnp.asarray, mm.encode64([c[0] for c in cases])))
    b = tuple(map(jnp.asarray, mm.encode64([c[1] for c in cases])))
    hi, lo = mm.mul64_lo(a, b)
    got = mm.decode64(hi, lo)
    for (x, y), g in zip(cases, got):
        assert g == (x * y) % (1 << 64)


def test_add_sub_mod64(rng):
    pairs = boundary_pairs(Q60, rng)
    a = tuple(map(jnp.asarray, mm.encode64([p[0] for p in pairs])))
    b = tuple(map(jnp.asarray, mm.encode64([p[1] for p in pairs])))
    s = mm.decode64(*mm.add_mod64(a, b, Q60))
    d = mm.decode64(*mm.sub_mod64(a, b, Q60))
    for (x, y), sv, dv in zip(pairs, s, d):
        assert sv == (x + y) % Q60
        assert dv == (x - y) % Q60


@pytest.mark.parametrize("backend", ["barrett", "montgomery"])
def test_mul_mod64(backend, rng):
    p = P60_4096
    pairs = boundary_pairs(Q60, rng, count=256)
    a = tuple(map(jnp.asarray, mm.encode64([c[0] for c in pairs])))
    b = tuple(map(jnp.asarray, mm.encode64([c[1] for c in pairs])))
    if backend == "barrett":
        ring = mm.Ring64(p, Reduction.BARRETT)
        got = mm.decode64(*ring._barrett(a, b))
        expected = [(x * y) % Q60 for x, y in pairs]
    else:
        got = mm.decode64(*mm.mont_mul64(a, b, Q60, p.mont_q_prime))
        r_inv = pow(p.mont_r, Q60 - 2, Q60)
        expected = [(x * y * r_inv) % Q60 for x, y in pairs]
    for (x, y), g, w in zip(pairs, got, expected):
        assert g == w, (x, y)


@pytest.mark.parametrize(
    "ring_cls,p,red",
    [
        (mm.Ring32, DILITHIUM_256, Reduction.BARRETT),
        (mm.Ring32, DILITHIUM_256, Reduction.MONTGOMERY),
        (mm.Ring64, P60_4096, Reduction.BARRETT),
        (mm.Ring64, P60_4096, Reduction.MONTGOMERY),
    ],
    ids=["r32-barrett", "r32-mont", "r64-barrett", "r64-mont"],
)
def test_ring_standard_domain_mul(ring_cls, p, red, rng):
    """ring.mul and ring.mul_tw must return standard-domain products for every
    backend (the Montgomery twiddle encoding is transparent)."""
    ring = ring_cls(p, red)
    q = p.q
    vals = [(rng.randrange(q), rng.randrange(q)) for _ in range(64)]
    vals += [(q - 1, q - 1), (0, q - 1), (1, 1)]
    a = ring.encode([v[0] for v in vals])
    tw_plain = [v[1] for v in vals]
    tw = ring.encode_tw(tw_plain)
    a = jax.tree.map(jnp.asarray, a)
    tw = jax.tree.map(jnp.asarray, tw)
    got = ring.decode(ring.mul_tw(a, tw))
    for (x, y), g in zip(vals, got):
        assert g == (x * y) % q

    b = jax.tree.map(jnp.asarray, ring.encode(tw_plain))
    got2 = ring.decode(ring.mul(a, b))
    for (x, y), g in zip(vals, got2):
        assert g == (x * y) % q


@pytest.mark.parametrize("backend", [Reduction.SHOUP, Reduction.MONTGOMERY,
                                     Reduction.BARRETT])
def test_ring64_width31_modulus_exact(backend, rng):
    """Regression: a 31-bit modulus routes to Ring64 (Ring32 caps at width
    30) while NttParams derives Montgomery constants for R=2^32 — the ring
    must derive its own R=2^64 constants or products silently corrupt."""
    from tpu_ntt.params import make_params
    from tpu_ntt.modmath import make_ring

    p = make_params(8, 1073741857)  # 31-bit prime, 16 | q-1
    assert p.mont_bits == 32  # the hazardous configuration
    ring = make_ring(p, backend)
    assert ring.nlimbs == 2
    pairs = boundary_pairs(p.q, rng, count=64)
    a = ring.encode([x for x, _ in pairs])
    b = ring.encode([y for _, y in pairs])
    tw = ring.encode_tw([y for _, y in pairs])
    got_mul = ring.decode(ring.mul(a, b))
    got_tw = ring.decode(ring.mul_tw(a, tw))
    for (x, y), m, t in zip(pairs, got_mul, got_tw):
        assert m == x * y % p.q
        assert t == x * y % p.q


def test_ring64_width31_poly_mult(rng):
    """End-to-end product through the default dispatch for a 31-bit prime
    (the exact reachable path of the round-1 advisor finding)."""
    from tpu_ntt import reference
    from tpu_ntt.params import make_params
    from tpu_ntt.ntt import NttPlan, nwc_poly_mult

    p = make_params(16, 1073741857)
    plan = NttPlan(p)
    a = [rng.randrange(p.q) for _ in range(p.n)]
    b = [rng.randrange(p.q) for _ in range(p.n)]
    got = plan.decode(nwc_poly_mult(plan, plan.encode(a), plan.encode(b)))
    assert list(got) == reference.nwc_poly_mult(a, b, p)
