"""ML-DSA (Dilithium, FIPS-204) surface.

q = 8380417 IS the reference's shipped 24-bit modulus — every RTL
parameter set except the 60-bit one uses it (rtl/ntt_poly_mult_openroad.sv:
22-24, new_reference/test_cg_ntt.py:7) — but the reference picks an
arbitrary primitive root per configuration, while the deployed FIPS-204
standard fixes zeta = 1753 and a specific in-place network whose output
order is the ML-DSA serialization order.  This module completes the NIST
PQC trio as first-class module surfaces (ML-KEM: kyber.py; Falcon:
falcon_512/falcon_1024 presets; ML-DSA: here), the same way kyber.py
wraps FIPS-203.

Two backends, bit-identical (tests/test_mldsa.py):

* ``kernels.MxuPlan`` on (n=256, q=8380417, psi=1753): the fused int8-MXU
  Pallas kernel family runs every COEFFICIENT-in/out operation —
  poly_mult, cached products, the A_hat @ NTT(y) matvec of Verify/Sign
  (k x l up to 8 x 8 covers ML-DSA-44/65/87's (4,4)/(6,5)/(8,7)), and the
  dot inner products.  Default on TPU.
* The XLA merged-psi path (ntt.py): because zeta = 1753 is a primitive
  512th root, the FIPS-204 NTT is EXACTLY the merged-twiddle negacyclic
  forward on an (n=256, q, psi=zeta) plan — the CT NO->BO network with
  psi powers folded into stage twiddles emits the FIPS serialization
  order directly (verified bit-exact vs the Algorithm-41 golden,
  tests/test_mldsa.py).  The ``ntt``/``intt``/``multiply_ntt`` entry
  points — whose CONTRACT is that serialization order — run here; the
  kernel's internal spectrum is a four-step Montgomery-domain layout and
  is only exposed through the cacheable ``spectrum``/``matvec_spectra``
  forms (dispatch.py:47-53 layout contract).

Data convention: (B, 256) uint32 arrays; coefficients natural order,
spectra in FIPS-204 NTT order, plain residues in [0, q).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import ntt as _ntt
from .params import NttParams
from .reference import MLDSA_N, MLDSA_Q, MLDSA_ZETA

Q = MLDSA_Q
N = MLDSA_N
ZETA = MLDSA_ZETA

#: FIPS-204 parameter set: zeta is a primitive 2n-th root (zeta^256 = -1),
#: so this is a valid full-size negacyclic plan — ML-DSA's transform is
#: COMPLETE, unlike ML-KEM's (kyber.py), and needs no new math surface.
PARAMS = NttParams(n=N, q=Q, psi=ZETA, name="mldsa_256")

#: (k, l) matrix shapes of the three FIPS-204 security levels.
MATRIX_SHAPES = {44: (4, 4), 65: (6, 5), 87: (8, 7)}


# ---------------------------------------------------------------------------
# XLA path (the serialization-order transforms)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _plan() -> _ntt.NttPlan:
    return _ntt.NttPlan(PARAMS)


def ntt_xla(x):
    """FIPS-204 Algorithm 41 on (B, 256) uint32: the merged-psi negacyclic
    forward IS the FIPS network (bit-exact vs the golden)."""
    return _ntt.nwc_fwd_merged(_plan(), x)


def intt_xla(x):
    """FIPS-204 Algorithm 42 on (B, 256) uint32 NTT-order spectra."""
    return _ntt.nwc_inv_merged(_plan(), x)


def multiply_xla(a, b):
    """FIPS-204 MultiplyNTT: coefficient-wise product of NTT-order spectra
    (complete transform — plain pointwise, no base case)."""
    return _plan().ring.mul(a, b)


# ---------------------------------------------------------------------------
# Routed public API (kernel on TPU, interpret-mode kernel elsewhere —
# the same policy as kyber.py / dispatch.py)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _backend():
    from .kernels.mxu import MxuPlan

    # Constant tables must be built eagerly even if the first call happens
    # inside a user jit trace (same latent bug class as kyber.py:129-139).
    with jax.ensure_compile_time_eval():
        kp = MxuPlan(PARAMS)
        plan = _plan()  # warm the XLA-plan cache eagerly too
    del plan
    interp = jax.devices()[0].platform != "tpu"
    ops = {
        # Serialization-order transforms: XLA merged is the production
        # path (the kernel spectrum is an internal four-step layout).
        "ntt": jax.jit(ntt_xla),
        "intt": jax.jit(intt_xla),
        "multiply": jax.jit(multiply_xla),
        # Coefficient-in/out operations: fused int8-MXU kernels.
        "poly_mult": jax.jit(lambda a, b: kp.nwc_poly_mult(a, b, interp)),
        "spectrum": jax.jit(lambda x: kp.nwc_spectrum(x, interp)),
        "poly_mult_cached": jax.jit(
            lambda a, s: kp.nwc_poly_mult_cached(a, s, interp)
        ),
        "dot": jax.jit(lambda a, b: kp.nwc_dot(a, b, interp)),
        "dot_cached": jax.jit(lambda a, s: kp.nwc_dot_cached(a, s, interp)),
        "matvec_spectra": jax.jit(
            lambda A: kp.nwc_matvec_spectra(A, interp)
        ),
        "ntt_domain_blocks": jax.jit(
            lambda A_hat: kp.nwc_matvec_spectra(intt_xla(A_hat), interp)
        ),
        "matvec": jax.jit(lambda s, blk: kp.nwc_matvec_cached(s, blk,
                                                              interp)),
    }
    return "pallas-mxu", ops


def _op(name):
    return _backend()[1][name]


def _u32(x):
    """Accept host lists / object-dtype numpy AND jax arrays or tracers
    (kyber.py:163-172: np round-trips only for host containers, so these
    entry points still compose under a user jit)."""
    if isinstance(x, (list, tuple)) or (
        isinstance(x, np.ndarray) and x.dtype == object
    ):
        x = np.asarray(x, dtype=np.uint64).astype(np.uint32)
    return jnp.asarray(x, dtype=jnp.uint32)


def ntt(x):
    """FIPS-204 NTT: (B, 256) natural coefficients -> NTT-order spectra."""
    return _op("ntt")(_u32(x))


def intt(x):
    """FIPS-204 inverse NTT (consumes NTT-order spectra)."""
    return _op("intt")(_u32(x))


def multiply_ntt(a, b):
    """MultiplyNTT on NTT-order spectra (coefficient-wise, complete NTT)."""
    return _op("multiply")(_u32(a), _u32(b))


def poly_mult(a, b):
    """Negacyclic product in Z_q[x]/(x^256 + 1): coefficients in/out."""
    return _op("poly_mult")(_u32(a), _u32(b))


def spectrum(x):
    """Cacheable operand spectrum (backend-internal domain) for
    poly_mult_cached / dot_cached / matvec."""
    return _op("spectrum")(_u32(x))


def poly_mult_cached(a, spec):
    """Product against a cached ``spectrum`` (one forward instead of two)
    — e.g. the challenge polynomial c against the long-lived s1/s2/t0
    spectra in signing."""
    return _op("poly_mult_cached")(_u32(a), _u32(spec))


def dot(a, b):
    """INTT(sum_k NTT(a_k) o NTT(b_k)) for (K, B, 256) stacks — one
    inverse per output (the w' = A z - c t1*2^d verify combination is a
    matvec plus this shape)."""
    return _op("dot")(_u32(a), _u32(b))


def dot_cached(a, spectra):
    """Dot against cached ``spectrum`` stacks: K forwards + one inverse."""
    return _op("dot_cached")(_u32(a), _u32(spectra))


def matvec_spectra(A):
    """Precompute matvec blocks from a (k, l, 256) COEFFICIENT matrix."""
    return _op("matvec_spectra")(_u32(A))


def ntt_domain_blocks(A_hat):
    """Precompute matvec blocks from a (k, l, 256) FIPS-NTT-order matrix —
    the form ExpandA (FIPS-204 Algorithm 32) samples A_hat in directly, so
    key expansion never round-trips through coefficients on the host."""
    return _op("ntt_domain_blocks")(_u32(A_hat))


def matvec(s, blocks):
    """Fused A o NTT(s) + INTT: s is (l, B, 256) coefficients, blocks from
    matvec_spectra/ntt_domain_blocks; returns (k, B, 256) — the A y of
    Sign and A z of Verify (l + k transforms for k*l products).  All
    three FIPS-204 shapes (MATRIX_SHAPES) fit the kernel's k, l <= 8."""
    return _op("matvec")(_u32(s), blocks)


def impl_name() -> str:
    return _backend()[0]
