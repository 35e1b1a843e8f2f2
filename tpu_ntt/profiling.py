"""Profiling & observability.

The reference exposes debug_state/phase flags and manual cycle accounting
(rtl/ntt_poly_mult.sv:36-40, reports/final-report.tex:1659-1691, cocotb
per-stage logs).  The TPU-native equivalents:

* ``trace(logdir)`` — capture an XLA/TPU profiler trace viewable in
  TensorBoard / xprof (the waveform-dump analog).
* ``phase_report(params, batch)`` — per-phase device timing of the pipeline
  (twist, forward x2, pointwise, inverse, untwist) plus derived counters:
  butterflies/sec, modmuls/sec — the cycle-table analog, measured not
  estimated.
* ``op_counts(params)`` — static operation accounting per poly-mult.
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Dict

import jax
import numpy as np

from . import ntt as _ntt
from .benchlib import (device_seconds_per_iter,
                       device_seconds_per_iter_binary)
from .ntt import NttPlan
from .params import NttParams


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (view with tensorboard --logdir)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class OpCounts:
    """Static per-poly-mult arithmetic accounting (the analog of the
    reference's cycle breakdown table, final-report.tex:1659-1691)."""

    n: int
    butterflies_per_transform: int
    transforms: int = 3  # fwd a, fwd b, inverse
    pointwise: int = 0
    scale: int = 0

    @property
    def total_butterflies(self) -> int:
        return self.transforms * self.butterflies_per_transform

    @property
    def total_modmuls(self) -> int:
        # one twiddle multiply per butterfly + pointwise + scale
        return self.total_butterflies + self.pointwise + self.scale


def op_counts(p: NttParams) -> OpCounts:
    return OpCounts(
        n=p.n,
        butterflies_per_transform=(p.n // 2) * p.log_n,
        pointwise=p.n,
        scale=p.n,
    )


def phase_report(p: NttParams, batch: int = 512,
                 iters=(4, 16)) -> Dict[str, float]:
    """Measure each pipeline phase on device; returns seconds per batch.

    Keys: fwd (one merged forward transform), pointwise, inv, total
    (full fused product), plus derived counters butterflies_per_sec and
    modmuls_per_sec for the full product.
    """
    plan = NttPlan(p)
    rng = np.random.default_rng(0)
    v = rng.integers(0, p.q, size=(2, batch, p.n), dtype=np.uint64)

    def enc(x):
        if plan.ring.nlimbs == 1:
            return jax.device_put(x.astype(np.uint32))
        return (
            jax.device_put((x >> 32).astype(np.uint32)),
            jax.device_put((x & 0xFFFFFFFF).astype(np.uint32)),
        )

    a, b = enc(v[0]), enc(v[1])
    out: Dict[str, float] = {}
    out["fwd"] = device_seconds_per_iter(
        lambda x: _ntt.nwc_fwd_merged(plan, x), a, iters=iters
    )
    out["pointwise"] = device_seconds_per_iter(
        lambda x, y: plan.ring.mul(x, y), a, b, iters=iters
    )
    out["inv"] = device_seconds_per_iter(
        lambda x: _ntt.nwc_inv_merged(plan, x), a, iters=iters
    )
    # merged product = COMPOSED XLA ops: time it hoist-proof (both operands
    # loop-carried), else while-loop ICM elides NTT(b) (benchlib docstring)
    out["total"] = device_seconds_per_iter_binary(
        lambda x, y: _ntt.nwc_poly_mult_merged(plan, x, y), a, b, iters=iters
    )
    counts = op_counts(p)
    out["poly_mults_per_sec"] = batch / out["total"]
    out["butterflies_per_sec"] = batch * counts.total_butterflies / out["total"]
    out["modmuls_per_sec"] = batch * counts.total_modmuls / out["total"]
    return out


def kernel_phase_report(p: NttParams, batch: int = 512,
                        iters=(4, 16)) -> Dict[str, float]:
    """Per-phase device timing of the PRODUCTION Pallas kernel pipeline —
    the measured analog of the reference's cycle-accounting table
    (final-report.tex:1659-1691) for the path users actually run.

    The fused kernel has no internal phase boundaries (that is the point
    of fusing), so phases are derived from the cacheable-spectrum entry
    points, all timed on device:

        total   = nwc_poly_mult          ~ 2*fwd + pointwise + inverse
        cached  = nwc_poly_mult_cached   ~   fwd + pointwise + inverse
        fwd     = nwc_spectrum            (the forward half, directly)
        inv     = ntt_inv                 (the inverse half, directly)

    Derived: fwd_derived = total - cached (cross-check of fwd),
    pointwise_derived = cached - fwd - inv.  Counters mirror phase_report.
    """
    from . import dispatch

    rng = np.random.default_rng(0)
    v = rng.integers(0, p.q, size=(2, batch, p.n), dtype=np.uint64)
    pairs = dispatch.takes_pairs(p)

    def enc(x):
        if not pairs:
            return jax.device_put(x.astype(np.uint32))
        return (
            jax.device_put((x >> 32).astype(np.uint32)),
            jax.device_put((x & 0xFFFFFFFF).astype(np.uint32)),
        )

    a, b = enc(v[0]), enc(v[1])
    out: Dict[str, float] = {"impl": dispatch.impl_name(p)}  # type: ignore
    out["fwd"] = device_seconds_per_iter(
        dispatch.best(p, "spectrum"), a, iters=iters
    )
    out["inv"] = device_seconds_per_iter(
        dispatch.best(p, "inv"), a, iters=iters
    )
    out["cached"] = device_seconds_per_iter(
        dispatch.best(p, "cached"), a, b, iters=iters
    )
    # composed backends (fourstep/xla) need the hoist-proof swap chain;
    # single-pallas_call backends are ICM-opaque (see bench.py/benchlib)
    impl = out["impl"]
    total_timer = (device_seconds_per_iter_binary
                   if ("fourstep" in impl or "xla" in impl)
                   else device_seconds_per_iter)
    out["total"] = total_timer(dispatch.best(p, "nwc"), a, b, iters=iters)
    out["fwd_derived"] = out["total"] - out["cached"]
    out["pointwise_derived"] = max(out["cached"] - out["fwd"] - out["inv"], 0.0)
    counts = op_counts(p)
    out["poly_mults_per_sec"] = batch / out["total"]
    out["butterflies_per_sec"] = batch * counts.total_butterflies / out["total"]
    out["modmuls_per_sec"] = batch * counts.total_modmuls / out["total"]
    return out


def main():
    import argparse
    import json

    ap = argparse.ArgumentParser(description="per-phase pipeline profile")
    ap.add_argument("--preset", default="p24_4096")
    ap.add_argument("--n", type=int,
                    help="custom transform size (with --q; overrides "
                         "--preset; reaches the large-N four-step backends)")
    ap.add_argument("--q", type=int, help="custom modulus (with --n)")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--kernel", action="store_true",
                    help="profile the production dispatch path "
                         "(default: the XLA merged path)")
    ap.add_argument("--trace-dir", help="also capture an xprof trace here")
    args = ap.parse_args()
    from .params import PRESETS, make_params

    if (args.n is None) != (args.q is None):
        ap.error("--n and --q must be given together")
    p = make_params(args.n, args.q) if args.n else PRESETS[args.preset]
    report = kernel_phase_report if args.kernel else phase_report
    if args.trace_dir:
        with trace(args.trace_dir):
            rep = report(p, args.batch)
    else:
        rep = report(p, args.batch)
    print(json.dumps(
        {k: (round(v, 6) if isinstance(v, float) and v > 1 else v)
         for k, v in rep.items()}, indent=2))


if __name__ == "__main__":
    main()
