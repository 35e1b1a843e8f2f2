"""Implementation dispatch: pick the fastest measured path per workload.

Single user-facing entry point for "just multiply these polynomials as fast
as this chip allows":

    mult = tpu_ntt.dispatch.best_nwc_poly_mult(params)
    out = mult(a, b)        # (B, n) uint arrays in, same out

Selection policy (measured on TPU v5e, see CLAUDE.md performance ledger and
docs/DESIGN.md §2):
  * q < 2^25, 256 <= n <= 16384, n % 128 == 0  ->  fused Pallas MXU kernel
  * otherwise                                   ->  XLA merged-psi + Shoup

Both produce bit-identical results; the returned callable is jitted and
accepts/returns plain numpy/JAX uint arrays ((B, n) uint32 for q < 2^31,
(hi, lo) uint32 pairs — or a (B, n) uint64 array, auto-split — otherwise).
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from . import ntt as _ntt
from .ntt import NttPlan
from .params import NttParams

_KERNEL_OK = lambda p: (
    p.width <= 24 and p.n % 128 == 0 and 256 <= p.n <= 16384
)


def _split_u64(x):
    x = np.asarray(x)
    if x.dtype == np.uint64:
        return ((x >> np.uint64(32)).astype(np.uint32),
                (x & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    return x


@functools.lru_cache(maxsize=None)
def _impl(p: NttParams):
    if _KERNEL_OK(p):
        from .kernels.mxu import MxuPlan

        mp = MxuPlan(p)
        # Pallas compiles only on TPU; on CPU backends fall back to the
        # interpreter so the dispatch layer works everywhere.
        interp = jax.devices()[0].platform != "tpu"
        return (
            jax.jit(lambda a, b: mp.nwc_poly_mult(a, b, interpret=interp)),
            "pallas-mxu",
        )
    plan = NttPlan(p)
    if plan.ring.nlimbs == 1:
        return (
            jax.jit(lambda a, b: _ntt.nwc_poly_mult_merged(plan, a, b)),
            "xla-merged",
        )
    if p.width <= 62 and p.n % 128 == 0 and 256 <= p.n <= 16384:
        # VMEM-resident double-word kernel: unlike the XLA path it stays
        # flat in throughput as batch grows (the XLA path goes HBM-bound)
        from .kernels.mxu64 import MxuPlan64

        mp = MxuPlan64(p)
        interp = jax.devices()[0].platform != "tpu"
        jitted = jax.jit(lambda a, b: mp.nwc_poly_mult(a, b, interpret=interp))
        return (
            lambda a, b: jitted(_split_u64(a), _split_u64(b)),
            "pallas-mxu64",
        )

    def run(a, b):
        return _ntt.nwc_poly_mult_merged(plan, a, b)

    jitted = jax.jit(run)
    return (lambda a, b: jitted(_split_u64(a), _split_u64(b))), "xla-merged-64"


def best_nwc_poly_mult(p: NttParams):
    """Fastest negacyclic poly-mult for this parameter set (jitted)."""
    return _impl(p)[0]


def impl_name(p: NttParams) -> str:
    """Which backend best_nwc_poly_mult selects (for logging/tests)."""
    return _impl(p)[1]
