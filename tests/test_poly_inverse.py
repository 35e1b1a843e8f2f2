"""Ring inversion / division (ntt.nwc_poly_inverse / nwc_poly_div): the
f^-1 mod (x^n + 1, q) step of NTRU/Falcon key generation.  Oracle: the
product with the claimed inverse must be the identity polynomial."""

import random

import numpy as np
import pytest

import jax

from tpu_ntt import ntt
from tpu_ntt.params import make_params
from tpu_ntt.ntt import NttPlan

CASES = [
    (256, 8380417),             # reference 24-bit modulus
    (256, 1152921504606830593), # 60-bit pair layout
    (512, 12289),               # Falcon's actual keygen ring
]


def _identity(n):
    return [1] + [0] * (n - 1)


@pytest.mark.parametrize("n,q", CASES)
def test_inverse_times_self_is_identity(n, q, rng=random.Random(70)):
    p = make_params(n, q)
    plan = NttPlan(p)
    rows = [[rng.randrange(q) for _ in range(n)] for _ in range(2)]
    x = plan.encode(np.array(rows, dtype=object))
    g, ok = ntt.nwc_poly_inverse(plan, x, return_ok=True)
    assert bool(np.asarray(ok).all()), "random f should be a unit w.h.p."
    prod = ntt.nwc_poly_mult(plan, x, g)
    for row in plan.decode(prod):
        assert [int(v) for v in row] == _identity(n)


def test_identity_inverts_to_itself():
    p = make_params(256, 8380417)
    plan = NttPlan(p)
    e = plan.encode(np.array([_identity(256)], dtype=object))
    g = ntt.nwc_poly_inverse(plan, e)
    assert [int(v) for v in plan.decode(g)[0]] == _identity(256)


def test_non_invertible_detected():
    """A polynomial with a zero spectrum slot is not a unit: build one by
    inverse-transforming a spectrum with a zeroed slot."""
    p = make_params(256, 8380417)
    plan = NttPlan(p)
    rng = random.Random(71)
    spec = np.array([[rng.randrange(1, p.q) for _ in range(256)]],
                    dtype=object)
    spec[0, 7] = 0
    x = ntt.nwc_inv_merged(plan, plan.encode(spec))
    _, ok = ntt.nwc_poly_inverse(plan, x, return_ok=True)
    assert not bool(np.asarray(ok).any())


@pytest.mark.parametrize("n,q", CASES[:2])
def test_division_roundtrip(n, q, rng=random.Random(72)):
    """div(f ⊛ h, h) == f for unit h."""
    p = make_params(n, q)
    plan = NttPlan(p)
    f = plan.encode(np.array([[rng.randrange(q) for _ in range(n)]],
                             dtype=object))
    h = plan.encode(np.array([[rng.randrange(q) for _ in range(n)]],
                             dtype=object))
    fh = ntt.nwc_poly_mult(plan, f, h)
    got = ntt.nwc_poly_div(plan, fh, h)
    assert [[int(v) for v in r] for r in plan.decode(got)] == \
        [[int(v) for v in r] for r in plan.decode(f)]


def test_composes_under_user_jit():
    p = make_params(256, 8380417)
    plan = NttPlan(p)
    rng = random.Random(73)
    x = plan.encode(np.array([[rng.randrange(p.q) for _ in range(256)]],
                             dtype=object))
    g = jax.jit(lambda v: ntt.nwc_poly_inverse(plan, v))(x)
    prod = ntt.nwc_poly_mult(plan, x, g)
    assert [int(v) for v in plan.decode(prod)[0]] == _identity(256)
