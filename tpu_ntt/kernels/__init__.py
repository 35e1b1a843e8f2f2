"""Fused Pallas TPU kernels.

``mxu`` holds the production path: the whole negacyclic-poly-mult pipeline in
one kernel, with the NTT small transforms executed as exact limb-decomposed
bf16 matmuls on the MXU and all modular arithmetic in Montgomery form on the
VPU.  Everything is validated bit-exact against the XLA path (tests) and the
pure-Python golden models.
"""

from __future__ import annotations

from ..modmath import GOLDILOCKS_Q
from ..params import NttParams
from .gl64 import GoldilocksPlan64  # noqa: F401
from .mxu import MxuPlan  # noqa: F401
from .mxu64 import MxuPlan64  # noqa: F401
from .sol64 import SolinasPlan64  # noqa: F401


def plan_for(p: NttParams):
    """Fastest fused-kernel plan covering this parameter set, or ``None``
    (``None`` = the XLA merged-psi path wins; dispatch falls through).

    The single copy of the kernel-eligibility policy, consumed by the
    dispatch layer and by the four-step kernel-locals path so the two can
    never drift.  Measured on TPU v5e at the ledger batch sizes
    (BENCH_NOTES.md round-2 width-band A/B):

      * width <= 24 at one-tile sizes    -> single-word int8 kernel (mxu):
        1.86M/s vs 921k/s XLA at n=4096 B=2048.
      * Goldilocks prime, n <= 32768     -> 9-digit phi-fold kernel (gl64):
        425k/s vs 137k/s XLA GoldilocksRing.
      * Solinas trinomial q = 2^a - 2^b + 1 (48 <= a <= 62, fold bounds
        verified), n <= 32768            -> shift-add fold kernel
        (sol64): 483k/s nwc and 659k/s cached vs mxu64's 413k/565k on
        the HEADLINE p60_4096 (q = 2^60 - 2^14 + 1 — the reference's
        shipped 60-bit modulus is itself a trinomial).
      * 30 < width <= 62 otherwise, n <= 32768 -> double-word int8 kernel
        (mxu64): 413k/s vs 125k/s XLA Ring64 (n=4096 B=2048).
      * width 25..30 (any n) and width <= 24 above the one-tile cap -> NONE:
        the single-word XLA merged path (Ring32, Shoup) beats the
        double-word kernel ~2.1x wherever it exists (pre-audit 974k vs 469k at
        n=4096 B=2048; 100k vs 48k at n=32768 B=256) — the kernel's
        8-digit machinery is priced for 62-bit operands and cannot be
        narrowed below int8 digits.
      * n = 65536 double-word -> NONE here: the DENSE flat kernel (512
        x 512 left matrices + carry-save diagonals) exceeds the 16 MB
        scoped-VMEM limit on v5e (17.1 MB even at one group per step),
        so plan_for routes the size to the kernel-locals four-step
        (12.3k vs 3.6k nwc/s flat-XLA w60; 11.9k vs 3.3k Goldilocks).
        For q < 2^62 the depth-2 split-radix left transform makes the
        flat NWC kernel compile AND win 1.85x (24.3k nwc/s sol64,
        BENCH_NOTES round 3); dispatch._backend builds that plan
        directly and overrides only the nwc op — it is not exposed
        through plan_for because only nwc_poly_mult has split wiring
        (a four-step local at n1 = 65536 would need the dense
        standalone transforms, which cannot compile).
    """
    cls = covers(p.n, p.q)
    return cls(p) if cls is not None else None


def covers(n: int, q: int):
    """The plan class ``plan_for`` would build for (n, q), or ``None`` —
    a cheap predicate (no table construction) for callers that must test
    coverage before committing to a build (sharded.KernelFourStep, the
    dispatch four-step backend)."""
    width = q.bit_length()
    if n % 128 or n < 256:
        return None
    if width <= 24 and n <= 16384:
        return MxuPlan
    if n <= 32768 and q == GOLDILOCKS_Q:
        return GoldilocksPlan64
    if n <= 32768 and 30 < width <= 62:
        if SolinasPlan64.covers_q(q, n):
            return SolinasPlan64
        return MxuPlan64
    return None
