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


def _trace_device_busy(logdir: str) -> float:
    """Device busy seconds in an xprof trace dir, from the "XLA Modules"
    lane (ONE span per executed program) — on-device timestamps, immune to
    host/transport jitter.  The "XLA Ops" lane is NOT summable: it carries
    nested/duplicated spans and overstates busy time ~2x (measured)."""
    import glob
    import gzip
    import json

    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not files:
        raise RuntimeError(f"no trace produced under {logdir}")
    ev = json.load(gzip.open(sorted(files)[-1]))["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tids = {(e["pid"], e["tid"]): e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "thread_name"}
    dev = {pid for pid, nm in pids.items() if "tpu" in nm.lower()}
    return sum(
        e.get("dur", 0) for e in ev
        if e.get("ph") == "X" and e.get("pid") in dev
        and tids.get((e["pid"], e["tid"])) == "XLA Modules"
    ) / 1e6


def device_seconds_per_iter_traced(
    fn, x, *rest, iters: tuple[int, int] = (8, 40), logdir: str | None = None
) -> float:
    """Like :func:`device_seconds_per_iter` but the slope is taken over
    xprof DEVICE-LANE busy time instead of host wall clock.  Host wall
    differencing breaks when the transport adds seconds of jitter per
    dispatch (observed on the tunneled chip); device timestamps do not.
    Costs two profiler captures; requires a platform xprof supports."""
    import os
    import tempfile

    lo, hi = iters
    run = _looped(fn)
    float(run(lo, x, *rest))  # compile + warm
    base = logdir or tempfile.mkdtemp(prefix="benchlib_xprof_")
    busy = {}
    for tag, n in (("lo", lo), ("hi", hi)):
        d = os.path.join(base, tag)
        jax.profiler.start_trace(d)
        try:
            float(run(n, x, *rest))
        finally:
            jax.profiler.stop_trace()
        busy[tag] = _trace_device_busy(d)
    return max((busy["hi"] - busy["lo"]) / (hi - lo), 1e-12)


def device_seconds_per_iter_binary(fn, a, b, traced: bool = False,
                                    **kw) -> float:
    """Seconds per ``fn(a, b)`` with BOTH operands loop-carried.

    ``device_seconds_per_iter(fn, a, b)`` chains only the first operand;
    ``b`` is loop-invariant, and XLA's while-loop invariant code motion can
    hoist every op that depends only on ``b`` (e.g. the second forward
    transform of a COMPOSED multi-dispatch product) out of the timing
    loop.  Monolithic fused-kernel products are single opaque custom calls
    and immune, but XLA-merged and four-step products are not.  Here the
    carried state is the operand PAIR and each iteration advances it as
    ``(a, b) <- (b, fn(a, b))``, so no operand is invariant and every
    iteration performs the full product.  Use this for any binary op whose
    implementation is more than one opaque kernel call.  ``traced=True``
    takes the slope over xprof device-lane time instead of host wall
    clock (see :func:`device_seconds_per_iter_traced`)."""

    def body(pair, _ignored):
        x, y = pair
        return (y, fn(x, y))

    timer = device_seconds_per_iter_traced if traced else device_seconds_per_iter
    return timer(body, (a, b), 0, **kw)
