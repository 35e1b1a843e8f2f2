"""ML-KEM (Kyber, FIPS-203) incomplete-NTT surface.

q = 3329 has 2-adicity 8 (q - 1 = 2^8 * 13): no 512th root of unity exists,
so the full-size machinery of params.py/ntt.py — which requires 2n | q - 1 —
cannot express the single most-deployed lattice parameter set.  FIPS-203
works in the INCOMPLETE transform domain instead: Z_q[x]/(x^256 + 1) maps
onto 128 quadratic slots Z_q[x]/(x^2 - gamma_i), and products finish with a
2x2 base-case multiply per slot.  The reference repo explored exactly this
workload and abandoned it (test/archive/ntt_inverse_kyber.py:1-3); this
module is the production TPU surface for it.

Two backends, bit-identical (tests/test_kyber.py):

* ``KyberPlan`` (kernels/kyber.py): the fused Pallas path — each transform
  is ONE dense 128x128 int8-MXU matmul (6-bit unsigned limbs, no zero-point
  machinery), full products run fused in a single kernel.  Default on TPU.
* The XLA path here: the even/odd coefficient halves of a Kyber polynomial
  transform EXACTLY like 128-point negacyclic polynomials with psi = zeta
  = 17 (a_hat[2i] = sum_j a[2j] * zeta^j * omega^(br7(i) j): the psi-twist
  + DIT network in bit-reversed output order — which IS the FIPS-203
  serialization order).  So the existing merged-psi transforms (ntt.py)
  run it directly on a (n=128, q=3329, psi=17) plan; only the base-case
  multiply is new.

Data convention: (B, 256) uint32 arrays; coefficients in natural order,
spectra in FIPS-203 NTT serialization order, all values plain residues in
[0, q) — byte-compatible with ML-KEM's ByteEncode_12 stream once packed.
(``spectrum``/``matvec_spectra`` outputs are the backend's internal
cacheable form and only compose with the same backend, mirroring the
dispatch layout contract, dispatch.py:47-53.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import ntt as _ntt
from .modmath import add_mod32, barrett_mul32, shoup_mul32
from .params import NttParams
from .reference import KYBER_N, KYBER_Q, KYBER_ZETA, _br7

Q = KYBER_Q
N = KYBER_N
ZETA = KYBER_ZETA

#: the half-size ring each parity class transforms in: 2*128 = 256 | q-1,
#: zeta = 17 is a primitive 256th root, so this is a VALID full-size
#: negacyclic parameter set at n = 128 — the incomplete structure of the
#: 256-coefficient ring is exactly two of these stacked.
HALF_PARAMS = NttParams(n=128, q=Q, psi=ZETA, name="mlkem_half")


def gamma_table() -> list[int]:
    """gamma_i = zeta^(2*br7(i)+1) for slot i (FIPS-203 Algorithm 12)."""
    return [pow(ZETA, 2 * _br7(i) + 1, Q) for i in range(128)]


# ---------------------------------------------------------------------------
# XLA path
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _half_plan() -> _ntt.NttPlan:
    return _ntt.NttPlan(HALF_PARAMS)


def _split(x):
    """(..., 256) -> even/odd halves (..., 2, 128): [..., 0, :] = a[2j]."""
    r = x.reshape(x.shape[:-1] + (128, 2))
    return jnp.stack([r[..., 0], r[..., 1]], axis=-2)


def _join(h):
    """Inverse of _split: (..., 2, 128) -> (..., 256) interleaved."""
    return jnp.stack([h[..., 0, :], h[..., 1, :]], axis=-1).reshape(
        h.shape[:-2] + (KYBER_N,)
    )


def ntt_xla(x):
    """FIPS-203 Algorithm 9 on (B, 256) uint32: the merged-psi 128-point
    negacyclic forward on each parity class (its bit-reversed output order
    is the FIPS serialization order — verified vs the butterfly golden)."""
    return _join(_ntt.nwc_fwd_merged(_half_plan(), _split(x)))


def intt_xla(x):
    """FIPS-203 Algorithm 10 on (B, 256) uint32 plain spectra."""
    return _join(_ntt.nwc_inv_merged(_half_plan(), _split(x)))


@functools.lru_cache(maxsize=None)
def _gamma_tw():
    plan = _half_plan()
    return plan.ring.encode_tw(gamma_table())


def basemul_xla(a, b):
    """FIPS-203 Algorithms 11-12 on (B, 256) uint32 PLAIN spectra:
    c[2i] = a[2i] b[2i] + a[2i+1] b[2i+1] gamma_i ; c[2i+1] = cross terms.
    Elementwise — no MXU content, so the XLA formulation is the production
    one (the kernels fuse their base case into the product pipelines)."""
    ring = _half_plan().ring
    ah, bh = _split(a), _split(b)
    a0, a1 = ah[..., 0, :], ah[..., 1, :]
    b0, b1 = bh[..., 0, :], bh[..., 1, :]
    tw = jax.tree.map(jnp.asarray, _gamma_tw())
    c0 = ring.add(ring.mul(a0, b0), ring.mul_tw(ring.mul(a1, b1), tw))
    c1 = ring.add(ring.mul(a0, b1), ring.mul(a1, b0))
    return _join(jnp.stack([c0, c1], axis=-2))


def poly_mult_xla(a, b):
    """Full negacyclic product in R_q via the incomplete NTT (XLA path)."""
    return intt_xla(basemul_xla(ntt_xla(a), ntt_xla(b)))


# ---------------------------------------------------------------------------
# Routed public API (kernel on TPU, interpret-mode kernel elsewhere —
# the same policy as dispatch.py for the NWC surface)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _backend():
    from .kernels.kyber import KyberPlan

    # The plan's constant tables are jnp arrays built once and cached.  If
    # the FIRST kyber call happens inside a user jit trace, plain jnp ops
    # would stage those constants as tracers and poison the cache for every
    # later call (UnexpectedTracerError); ensure_compile_time_eval keeps
    # construction eager regardless of the caller's trace context.
    with jax.ensure_compile_time_eval():
        kp = KyberPlan()
    interp = jax.devices()[0].platform != "tpu"
    ops = {
        "ntt": jax.jit(lambda x: kp.ntt(x, interp)),
        "intt": jax.jit(lambda x: kp.intt(x, interp)),
        "poly_mult": jax.jit(lambda a, b: kp.poly_mult(a, b, interp)),
        "spectrum": jax.jit(lambda x: kp.spectrum(x, interp)),
        "poly_mult_cached": jax.jit(
            lambda a, s: kp.poly_mult_cached(a, s, interp)
        ),
        "dot": jax.jit(lambda a, b: kp.dot(a, b, interp)),
        "dot_cached": jax.jit(lambda a, s: kp.dot_cached(a, s, interp)),
        "matvec_spectra": jax.jit(lambda A: kp.matvec_spectra(A, interp)),
        "ntt_domain_blocks": jax.jit(kp.ntt_domain_blocks),
        "matvec": jax.jit(lambda s, blk: kp.matvec(s, blk, interp)),
        "basemul": jax.jit(basemul_xla),  # elementwise: XLA is the path
    }
    return kp.name, ops


def _op(name):
    return _backend()[1][name]


def _u32(x):
    """Accept host lists / object-dtype numpy (python ints) AND jax arrays
    or tracers: the numpy round-trip is only for host containers — calling
    np.asarray on a tracer would break users who wrap these entry points
    in their own jit (e.g. to fuse a pipeline or loop on device)."""
    if isinstance(x, (list, tuple)) or (
        isinstance(x, np.ndarray) and x.dtype == object
    ):
        x = np.asarray(x, dtype=np.uint64).astype(np.uint32)
    return jnp.asarray(x, dtype=jnp.uint32)


def ntt(x):
    """FIPS-203 NTT: (B, 256) natural coefficients -> plain spectra in
    serialization order."""
    return _op("ntt")(_u32(x))


def intt(x):
    """FIPS-203 inverse NTT (consumes plain serialization-order spectra)."""
    return _op("intt")(_u32(x))


def basemul(a, b):
    """MultiplyNTTs on plain spectra (FIPS-203 Algorithm 11)."""
    return _op("basemul")(_u32(a), _u32(b))


def poly_mult(a, b):
    """Negacyclic product in Z_q[x]/(x^256 + 1): coefficients in/out."""
    return _op("poly_mult")(_u32(a), _u32(b))


def spectrum(x):
    """Cacheable operand spectrum (backend-internal domain) for
    poly_mult_cached / dot_cached / matvec."""
    return _op("spectrum")(_u32(x))


def poly_mult_cached(a, spec):
    """Product against a cached ``spectrum`` (one forward instead of two)."""
    return _op("poly_mult_cached")(_u32(a), _u32(spec))


def dot(a, b):
    """INTT(sum_k NTT(a_k) o NTT(b_k)) for (K, B, 256) stacks — the ML-KEM
    decrypt inner product (s_hat^T o u_hat), one inverse per output."""
    return _op("dot")(_u32(a), _u32(b))


def dot_cached(a, spectra):
    """Dot against cached ``spectrum`` stacks: K forwards + one inverse."""
    return _op("dot_cached")(_u32(a), _u32(spectra))


def matvec_spectra(A):
    """Precompute matvec blocks from a (k, l, 256) COEFFICIENT matrix."""
    return _op("matvec_spectra")(_u32(A))


def ntt_domain_blocks(A_hat):
    """Precompute matvec blocks from a (k, l, 256) PLAIN NTT-domain matrix
    — the form FIPS-203 samples A_hat in directly (Algorithm 13 SampleNTT),
    so key expansion never leaves the transform domain."""
    return _op("ntt_domain_blocks")(_u32(A_hat))


def matvec(s, blocks):
    """Fused A_hat o NTT(s) + INTT: s is (l, B, 256) coefficients, blocks
    from matvec_spectra/ntt_domain_blocks; returns (k, B, 256) — the K-PKE
    key-gen/encrypt shape (FIPS-203 Algorithms 13-14), l + k transforms
    for k*l slot products."""
    return _op("matvec")(_u32(s), blocks)


def impl_name() -> str:
    return _backend()[0]
