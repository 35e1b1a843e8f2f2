"""Full-size end-to-end checks against the *independent* native C++ oracle
(SURVEY.md §4 tier (d): e2e NWC vs schoolbook for all four (n, q, psi)
sets — at n=4096 the O(n^2) schoolbook is only tractable natively)."""

import numpy as np
import pytest

import jax

from tpu_ntt import (
    DILITHIUM_256, P24_1024, P24_4096, P60_4096, NttPlan, native,
)
from tpu_ntt import ntt as N

needs_native = pytest.mark.skipif(
    not native.available(), reason="no g++ / native oracle unavailable"
)

ALL_SETS = [DILITHIUM_256, P24_1024, P24_4096, P60_4096]


@needs_native
@pytest.mark.parametrize("p", ALL_SETS, ids=lambda p: p.name)
def test_nwc_full_size_vs_native_schoolbook(p, rng):
    a = [rng.randrange(p.q) for _ in range(p.n)]
    b = [rng.randrange(p.q) for _ in range(p.n)]
    plan = NttPlan(p)
    got = plan.decode(
        jax.jit(lambda x, y: N.nwc_poly_mult_merged(plan, x, y))(
            plan.encode(np.array([a], dtype=object)),
            plan.encode(np.array([b], dtype=object)),
        )
    )[0]
    want = native.nwc_schoolbook(a, b, p.q)
    assert [int(v) for v in got] == want


@needs_native
@pytest.mark.parametrize("p", ALL_SETS, ids=lambda p: p.name)
def test_cyclic_full_size_vs_native_schoolbook(p, rng):
    a = [rng.randrange(p.q) for _ in range(p.n)]
    b = [rng.randrange(p.q) for _ in range(p.n)]
    plan = NttPlan(p)
    got = plan.decode(
        jax.jit(lambda x, y: N.cyclic_poly_mult(plan, x, y))(
            plan.encode(np.array([a], dtype=object)),
            plan.encode(np.array([b], dtype=object)),
        )
    )[0]
    want = native.cyclic_schoolbook(a, b, p.q)
    assert [int(v) for v in got] == want


@needs_native
def test_kernel_full_size_vs_native_schoolbook(rng):
    from tpu_ntt.kernels.mxu import MxuPlan

    p = P24_4096
    mp = MxuPlan(p)
    a = [rng.randrange(p.q) for _ in range(p.n)]
    b = [rng.randrange(p.q) for _ in range(p.n)]
    got = np.asarray(
        mp.nwc_poly_mult(
            np.array([a], dtype=np.uint32), np.array([b], dtype=np.uint32),
            interpret=True,
        )
    )[0]
    want = native.nwc_schoolbook(a, b, p.q)
    assert [int(v) for v in got] == want
