"""AOT lowering/compilation smoke tests.

The reference validates its design through synthesis flows (synth/synth.ys
Yosys stats, LibreLane).  The TPU analog of "does it synthesize, and how big
is it": every public entry point must lower and compile ahead-of-time, and
XLA's cost analysis must report sane static op counts."""

import numpy as np
import pytest

import jax

from tpu_ntt import DILITHIUM_256, NttPlan
from tpu_ntt import ntt as N


def _encoded_pair(plan, batch=4):
    rng = np.random.default_rng(0)
    a = rng.integers(0, plan.p.q, size=(batch, plan.n), dtype=np.uint64)
    return plan.encode(a.astype(object))


@pytest.mark.parametrize(
    "name,fn,nargs",
    [
        ("nwc_merged", N.nwc_poly_mult_merged, 2),
        ("nwc_cg", N.nwc_poly_mult, 2),
        ("cyclic", N.cyclic_poly_mult, 2),
        ("fwd", N.ntt_fwd, 1),
        ("inv", N.ntt_inv, 1),
    ],
)
def test_lower_compile(name, fn, nargs):
    plan = NttPlan(DILITHIUM_256)
    args = [_encoded_pair(plan) for _ in range(nargs)]
    compiled = jax.jit(lambda *xs: fn(plan, *xs)).lower(*args).compile()
    assert compiled is not None
    # executes after AOT compile
    out = compiled(*args)
    assert jax.tree.leaves(out)[0].shape[-1] == plan.n


def test_cost_analysis_reports_work():
    plan = NttPlan(DILITHIUM_256)
    a, b = _encoded_pair(plan), _encoded_pair(plan)
    lowered = jax.jit(lambda x, y: N.nwc_poly_mult_merged(plan, x, y)).lower(a, b)
    cost = lowered.compile().cost_analysis()
    # XLA reports some positive static cost for the pipeline (the "area
    # report" analog); exact keys vary by backend.
    assert cost and any(v > 0 for v in cost.values() if isinstance(v, float))


def test_compiled_signature_stable():
    """The jitted pipeline must not recompile for new data of same shape."""
    plan = NttPlan(DILITHIUM_256)
    f = jax.jit(lambda x, y: N.nwc_poly_mult_merged(plan, x, y))
    a, b = _encoded_pair(plan), _encoded_pair(plan)
    f(a, b)
    n0 = f._cache_size()
    f(_encoded_pair(plan), _encoded_pair(plan))
    assert f._cache_size() == n0
