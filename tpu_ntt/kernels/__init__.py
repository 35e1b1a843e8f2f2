"""Fused Pallas TPU kernels.

``mxu`` holds the production path: the whole negacyclic-poly-mult pipeline in
one kernel, with the NTT small transforms executed as exact limb-decomposed
bf16 matmuls on the MXU and all modular arithmetic in Montgomery form on the
VPU.  Everything is validated bit-exact against the XLA path (tests) and the
pure-Python golden models.
"""

from .gl64 import GoldilocksPlan64  # noqa: F401
from .mxu import MxuPlan  # noqa: F401
from .mxu64 import MxuPlan64  # noqa: F401
