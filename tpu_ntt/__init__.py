"""tpu_ntt — a TPU-native NTT negacyclic polynomial multiplication framework.

A from-scratch JAX / Pallas / pjit re-design of the capabilities of the
tiny-ntt hardware accelerator (forward/inverse constant-geometry radix-2 NTT,
Barrett/Montgomery modular arithmetic, pointwise transform-domain multiply,
psi-twist negacyclic wrapping) for Google TPU:

* exact modular arithmetic built from uint32 lane ops (modmath)
* batched, jittable transforms over arbitrary leading dims (ntt)
* fused whole-pipeline Pallas kernels (kernels/)
* mesh-sharded batch and large-N transforms (sharded)
"""

from .params import (  # noqa: F401
    DILITHIUM_256,
    GOLDILOCKS_4096,
    P24_1024,
    P24_4096,
    P60_4096,
    PRESETS,
    NttParams,
    Reduction,
    find_psi,
    make_params,
)
from .ntt import (  # noqa: F401
    NttPlan,
    cyclic_poly_mult,
    ntt_fwd,
    ntt_inv,
    nwc_fwd_merged,
    nwc_inv_merged,
    nwc_ntt_fwd,
    nwc_poly_mult,
    nwc_poly_mult_merged,
    pointwise_mul,
    twist,
    untwist,
)
from .sharded import (  # noqa: F401
    FourStepPlan,
    KernelFourStep,
    ShardedNtt,
    default_split,
)
from . import dispatch  # noqa: F401
from . import kyber  # noqa: F401  (ML-KEM / FIPS-203 incomplete NTT surface)
from . import mldsa  # noqa: F401  (ML-DSA / FIPS-204 surface)
from . import tables  # noqa: F401  (twiddle tables, hex IO, device_psi_powers)
from . import fhe  # noqa: F401  (BGV leveled homomorphic encryption)
from . import ckks  # noqa: F401  (CKKS approximate homomorphic encryption)
from . import poseidon  # noqa: F401  (Poseidon2-GL sponge + Merkle)
from . import stark  # noqa: F401  (coset LDE + FRI low-degree proofs)

__version__ = "0.1.0"
