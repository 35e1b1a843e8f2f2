"""Transform-level tests: jnp/XLA path vs the pure-Python golden oracle.

Oracle tier 3-5 of SURVEY.md §4 (engine integration + top-level e2e of the
reference's cocotb suites test_ntt_forward.py / test_ntt_inverse.py /
test_ntt_poly_mult.py): impulse, all-ones, structured, seeded-random vectors,
round-trips, full poly-mult — all bit-exact, batched, for every parameter set
and both reduction backends.
"""

import numpy as np
import pytest

import jax

from tpu_ntt import reference as ref
from tpu_ntt import ntt
from tpu_ntt.params import (
    DILITHIUM_256,
    P24_1024,
    P24_4096,
    P60_4096,
    Reduction,
    make_params,
)

SMALL = make_params(16, 8380417, name="small16")
SMALL60 = make_params(16, P60_4096.q, name="small60")

ALL_PARAMS = [SMALL, DILITHIUM_256, P24_1024, SMALL60]
IDS = ["n16", "dilithium", "p24_1024", "n16_60bit"]


def plans(p, reductions=(None,)):
    return [ntt.NttPlan(p, r) for r in reductions]


def rand_polys(rng, p, batch):
    return [[rng.randrange(p.q) for _ in range(p.n)] for _ in range(batch)]


def run(plan, fn, *coeff_lists):
    """Encode python-int polys, run jitted fn, decode to python ints."""
    args = [plan.encode(np.array(c, dtype=object)) for c in coeff_lists]
    args = [jax.tree.map(lambda a: a, x) for x in args]
    out = ntt.jit_fn(plan, fn)(*args)
    return plan.decode(out)


@pytest.mark.parametrize("p", ALL_PARAMS, ids=IDS)
def test_forward_matches_golden_random(p, rng):
    plan = ntt.NttPlan(p)
    batch = rand_polys(rng, p, 3)
    got = run(plan, ntt.ntt_fwd, batch)
    for row, poly in zip(got, batch):
        assert list(row) == ref.cg_ntt(poly, p.omega, p.q)


@pytest.mark.parametrize("p", ALL_PARAMS, ids=IDS)
def test_forward_impulse(p):
    plan = ntt.NttPlan(p)
    x = [[1] + [0] * (p.n - 1)]
    got = run(plan, ntt.ntt_fwd, x)
    assert list(got[0]) == [1] * p.n


@pytest.mark.parametrize("p", ALL_PARAMS, ids=IDS)
def test_roundtrip_identity(p, rng):
    plan = ntt.NttPlan(p)
    batch = rand_polys(rng, p, 2)
    fwd = run(plan, ntt.ntt_fwd, batch)
    back = run(plan, ntt.ntt_inv, [list(r) for r in fwd])
    for row, poly in zip(back, batch):
        assert list(row) == poly


@pytest.mark.parametrize(
    "red", [Reduction.BARRETT, Reduction.MONTGOMERY], ids=["barrett", "mont"]
)
@pytest.mark.parametrize("p", [DILITHIUM_256, SMALL60], ids=["24bit", "60bit"])
def test_reduction_backends_agree(p, red, rng):
    plan = ntt.NttPlan(p, red)
    batch = rand_polys(rng, p, 2)
    a, b = batch
    got = run(plan, ntt.nwc_poly_mult, [a], [b])
    assert list(got[0]) == ref.nwc_poly_mult(a, b, p)


@pytest.mark.parametrize("p", ALL_PARAMS, ids=IDS)
def test_cyclic_poly_mult_matches_golden(p, rng):
    plan = ntt.NttPlan(p)
    a, b = rand_polys(rng, p, 2)
    got = run(plan, ntt.cyclic_poly_mult, [a], [b])
    assert list(got[0]) == ref.cyclic_poly_mult(a, b, p)


@pytest.mark.parametrize("p", ALL_PARAMS, ids=IDS)
def test_nwc_poly_mult_matches_golden(p, rng):
    plan = ntt.NttPlan(p)
    a, b = rand_polys(rng, p, 2)
    got = run(plan, ntt.nwc_poly_mult, [a], [b])
    want = ref.nwc_poly_mult(a, b, p)
    assert list(got[0]) == want
    # and against schoolbook for the small sizes
    if p.n <= 64:
        assert want == ref.schoolbook_negacyclic(a, b, p.q)


def test_batched_matches_scalar(rng):
    """8-lane batch ≡ scalar (mirrors new_reference/test_cg_ntt_8butterfly.py
    vector-vs-scalar equivalence, :60-68)."""
    p = DILITHIUM_256
    plan = ntt.NttPlan(p)
    batch = rand_polys(rng, p, 8)
    got = run(plan, ntt.ntt_fwd, batch)
    for row, poly in zip(got, batch):
        assert list(row) == ref.cg_ntt(poly, p.omega, p.q)


def test_multi_dim_batch(rng):
    p = SMALL
    plan = ntt.NttPlan(p)
    flat = rand_polys(rng, p, 6)
    nested = [flat[0:3], flat[3:6]]  # (2, 3, n)
    got = run(plan, ntt.ntt_fwd, nested)
    assert got.shape == (2, 3, p.n)
    for i in range(2):
        for j in range(3):
            assert list(got[i][j]) == ref.cg_ntt(nested[i][j], p.omega, p.q)


def test_4096_forward_once(rng):
    p = P24_4096
    plan = ntt.NttPlan(p)
    poly = [rng.randrange(p.q) for _ in range(p.n)]
    got = run(plan, ntt.ntt_fwd, [poly])
    assert list(got[0]) == ref.cg_ntt(poly, p.omega, p.q)
