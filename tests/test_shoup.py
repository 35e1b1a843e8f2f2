"""Shoup precomputed-quotient multiplication tests (all rings/backends agree
bit-exactly; reference arithmetic contract: rtl/mod_mult.v — every
REDUCTION_TYPE computes exactly (a*b) mod q)."""

import numpy as np
import pytest

import jax

from tpu_ntt import DILITHIUM_256, P60_4096, NttPlan, Reduction, reference
from tpu_ntt import ntt as N
from tpu_ntt.modmath import (
    Ring32, Ring64, encode32, encode64, shoup_mul32, shoup_mul64,
)


def test_shoup32_exhaustive_boundaries():
    q = DILITHIUM_256.q
    vals = [0, 1, 2, q - 2, q - 1, 12345, q // 2]
    a = encode32(vals * len(vals))
    w_vals = [v for v in vals for _ in vals]
    w = encode32(w_vals)
    ws = encode32([(v << 32) // q for v in w_vals])
    got = np.asarray(jax.jit(lambda x, y, z: shoup_mul32(x, y, z, q))(a, w, ws))
    for i, (av, wv) in enumerate(zip(vals * len(vals), w_vals)):
        assert int(got[i]) == av * wv % q


def test_shoup64_boundaries():
    q = P60_4096.q
    vals = [0, 1, 2, q - 2, q - 1, q // 2, 1 << 32, (1 << 59) + 1]
    pairs = [(a, w) for a in vals for w in vals]
    a = encode64([p[0] for p in pairs])
    w = encode64([p[1] for p in pairs])
    ws = encode64([(p[1] << 64) // q for p in pairs])
    got_hi, got_lo = jax.jit(
        lambda x, y, z: shoup_mul64(x, y, z, q)
    )((a[0], a[1]), (w[0], w[1]), (ws[0], ws[1]))
    got = (np.asarray(got_hi).astype(object) << 32) + np.asarray(got_lo).astype(object)
    for i, (av, wv) in enumerate(pairs):
        assert int(got[i]) == av * wv % q


def test_shoup_random_vs_barrett(rng):
    q = DILITHIUM_256.q
    a_vals = [rng.randrange(q) for _ in range(512)]
    w_vals = [rng.randrange(q) for _ in range(512)]
    ring = Ring32(DILITHIUM_256, Reduction.SHOUP)
    tw = ring.encode_tw(w_vals)
    got = np.asarray(ring.mul_tw(encode32(a_vals), tuple(map(np.asarray, tw))))
    for i in range(512):
        assert int(got[i]) == a_vals[i] * w_vals[i] % q


@pytest.mark.parametrize("p", [DILITHIUM_256, P60_4096], ids=lambda p: p.name)
def test_all_backends_bit_identical_poly_mult(p, rng):
    a = [rng.randrange(p.q) for _ in range(p.n)]
    b = [rng.randrange(p.q) for _ in range(p.n)]
    want = reference.nwc_poly_mult(a, b, p)
    backends = [Reduction.MONTGOMERY, Reduction.SHOUP]
    if p.width <= 30:
        backends.append(Reduction.BARRETT)
    for red in backends:
        plan = NttPlan(p, red)
        ea = plan.encode(np.array([a], dtype=object))
        eb = plan.encode(np.array([b], dtype=object))
        got = plan.decode(
            jax.jit(lambda x, y: N.nwc_poly_mult_merged(plan, x, y))(ea, eb)
        )[0]
        assert [int(v) for v in got] == want, red
