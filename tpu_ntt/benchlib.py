"""Device-side benchmark timing utilities.

Host-side wall-clock timing of dispatches is unreliable when the device sits
behind a slow transport (e.g. a tunneled remote chip): dispatch latency and
device->host fetches dominate.  ``device_seconds_per_iter`` times the op by
running it inside an on-device ``lax.fori_loop`` (data-dependent chaining so
iterations cannot be elided or overlapped) and fetching only a scalar probe,
then removes constant overhead by differencing two iteration counts.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def _scalar_probe(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return sum(jnp.sum(l[..., :1].astype(jnp.uint32)) for l in leaves)


def _looped(fn: Callable):
    """One compilation: iteration count is a dynamic fori_loop bound."""

    @jax.jit
    def run(iters, x, *rest):
        def body(i, acc):
            # data-dependent chain: each iteration consumes the previous
            return fn(acc, *rest)

        out = jax.lax.fori_loop(0, iters, body, x)
        return _scalar_probe(out)

    return run


def device_seconds_per_iter(
    fn: Callable,
    x,
    *rest,
    iters: tuple[int, int] = (4, 20),
    repeats: int = 3,
    min_delta_s: float = 0.05,
) -> float:
    """Seconds per ``x <- fn(x, *rest)`` iteration, measured on device.

    fn must map x's pytree structure to itself (chainable).  The high
    iteration count is auto-raised until the timing difference exceeds
    ``min_delta_s`` so per-call dispatch jitter (tens of ms over a tunneled
    transport) cannot swamp the slope.
    """
    lo, hi = iters
    run = _looped(fn)
    # Warm via scalar fetch: on tunneled backends block_until_ready can
    # return before the remote compile/run actually happened; only a
    # device->host value transfer reliably forces completion.
    float(run(lo, x, *rest))

    def timed(n):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(run(n, x, *rest))  # scalar fetch forces completion
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = timed(lo)
    for _ in range(12):  # cap: hi <= lo * 2^12 from the starting point
        t_hi = timed(hi)
        if t_hi - t_lo >= min_delta_s:
            break
        hi *= 2
    return max((t_hi - t_lo) / (hi - lo), 1e-12)


def throughput(fn, x, *rest, batch: int, iters=(4, 20)) -> float:
    """Operations per second for a batched chainable op."""
    return batch / device_seconds_per_iter(fn, x, *rest, iters=iters)
