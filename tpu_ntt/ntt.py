"""Batched NTT / INTT / polynomial multiplication — pure-XLA path.

This is the portable compute path: jnp ops only, batched over arbitrary
leading dimensions, jit/vmap/shard_map-compatible, exact on TPU's 32-bit
integer lanes (see modmath).  The fused Pallas kernels in ``kernels/`` are
drop-in accelerations of the same plan and are tested bit-exact against it.

Algorithm (reference semantics: new_reference/cg_ntt.py:29-92):
  forward : bit-reverse, then log2(n) constant-geometry CT stages
            A[i] = a[2i] + w*a[2i+1], A[i+n/2] = a[2i] - w*a[2i+1].
  inverse : the same network with omega^-1 twiddles, then scale by n^-1.
  negacyclic multiply: psi-twist inputs, cyclic multiply, psi^-1-untwist.

On TPU each stage is one fused elementwise pass: the even/odd deinterleave
``x[..., 0::2] / x[..., 1::2]`` is a static strided slice (the constant-
geometry property — the identical pattern every stage — is what lets XLA
compile the whole transform with no dynamic addressing; the RTL's banked
ping-pong memory system rtl/ntt_coeff_banks.v is replaced by this layout).
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import tables
from .modmath import Ring32, Ring64, make_ring
from .params import NttParams, Reduction

Elem = Any  # uint32 array (Ring32) or (hi, lo) tuple of uint32 arrays (Ring64)


def _tmap(f, *xs):
    return jax.tree.map(f, *xs)


class NttPlan:
    """Precomputed constants for one (params, reduction) configuration.

    Holds every table the transforms need, host-side (numpy), encoded for the
    ring's limb layout and reduction backend.  jnp closes over them as
    constants, so a jitted transform embeds the tables once.
    """

    def __init__(self, p: NttParams, reduction: Reduction | None = None,
                 device_tables: bool = False):
        self.p = p
        self.ring = make_ring(p, reduction)
        n, q = p.n, p.q
        self.n = n
        self.log_n = p.log_n

        self.bitrev = np.array(
            [int(f"{i:0{p.log_n}b}"[::-1], 2) for i in range(n)], dtype=np.int32
        )

        if device_tables:
            # Runtime-(n, q) path: every table generated ON DEVICE from the
            # scalar roots (log-doubling ladders + static slices) — no
            # O(n log n) host big-int work.  Bit-exact vs the host builds
            # below (tests/test_tables.py::test_device_stage_tables_*);
            # single-word rings only (the band dispatch routes to XLA).
            dt = tables.device_stage_tables(p, getattr(self.ring, "reduction",
                                                       None))
            for k, v in dt.items():
                setattr(self, k, v)
            return

        enc_tw = self.ring.encode_tw
        fwd = tables.stage_twiddles(n, p.omega, q)
        inv = tables.stage_twiddles(n, p.omega_inv, q)
        self.stage_tw = [enc_tw(list(fwd[s])) for s in range(self.log_n)]
        self.stage_tw_inv = [enc_tw(list(inv[s])) for s in range(self.log_n)]
        self.psi_pows = enc_tw(tables.psi_powers(p))
        self.psi_inv_pows = enc_tw(tables.psi_inv_powers(p))
        self.n_inv_tw = enc_tw([p.n_inv])

        # scaled untwist: psi^-i * n^-1 folded into one table (used by the
        # fused kernel to merge the INTT scale with the final untwist).
        self.psi_inv_n_inv = enc_tw(
            [v * p.n_inv % q for v in tables.psi_inv_powers(p)]
        )

        # Merged-psi tables (second NWC formulation, reference:
        # test/refs/fast_ntt_negacyclic_convolution.py): psi powers in
        # bit-reversed index order, sliced per stage.  merged_tw[s] has one
        # twiddle per butterfly group of the CT stage with m = 2^s groups.
        psi_pows = tables.psi_powers(p)
        psi_inv_pows = tables.psi_inv_powers(p)
        brv = [psi_pows[int(f"{j:0{p.log_n}b}"[::-1], 2)] for j in range(n)]
        brv_inv = [
            psi_inv_pows[int(f"{j:0{p.log_n}b}"[::-1], 2)] for j in range(n)
        ]
        self.merged_tw = [
            enc_tw(brv[m : 2 * m]) for m in (1 << s for s in range(self.log_n))
        ]
        self.merged_tw_inv = [
            enc_tw(brv_inv[h : 2 * h])
            for h in (1 << s for s in range(self.log_n))
        ]

        # No-gather CYCLIC stage tables (used by ntt_fwd_nogather /
        # ntt_inv_nogather): DIF (Gentleman-Sande) forward twiddles
        # w_{2h}^j = omega^(j*2^s) for the stage with half-size h = n>>(s+1),
        # and DIT (Cooley-Tukey) inverse twiddles omega^(-j*2^s).  Unlike
        # stage_tw these vary WITHIN a butterfly group (broadcast (1, h)),
        # which keeps every stage a contiguous-halves reshape — no
        # bit-reversal gather anywhere (the gather is what made the CG
        # formulation 2.4x slower, docs/DESIGN.md §2.1).
        self.dif_tw = [
            enc_tw([pow(p.omega, j << s, q) for j in range(n >> (s + 1))])
            for s in range(self.log_n)
        ]
        self.dit_tw_inv = [
            enc_tw([pow(p.omega_inv, j << s, q) for j in range(n >> (s + 1))])
            for s in range(self.log_n)
        ]

    # -- host-side conversion ------------------------------------------------
    def encode(self, coeffs: Sequence[int] | np.ndarray):
        """Python ints / numpy -> ring element (host numpy limbs)."""
        arr = np.asarray(coeffs, dtype=object).reshape(-1)
        flat = self.ring.encode([int(v) for v in arr])
        shape = np.asarray(coeffs, dtype=object).shape
        return _tmap(lambda a: a.reshape(shape), flat)

    def decode(self, elem) -> np.ndarray:
        """Ring element -> numpy object array of Python ints."""
        leaves = jax.tree.leaves(elem)
        shape = np.asarray(leaves[0]).shape
        vals = self.ring.decode(elem)
        return np.array(vals, dtype=object).reshape(shape)

    # -- fast vectorized conversion (no Python-int loop; production path) ---
    def encode_u64(self, coeffs: np.ndarray):
        """uint64 numpy array of residues in [0, q) -> ring element."""
        arr = np.ascontiguousarray(coeffs, dtype=np.uint64)
        if self.ring.nlimbs == 1:
            return arr.astype(np.uint32)
        return ((arr >> np.uint64(32)).astype(np.uint32),
                (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32))

    def decode_u64(self, elem) -> np.ndarray:
        """Ring element -> uint64 numpy array (valid for q < 2^64)."""
        if self.ring.nlimbs == 1:
            return np.asarray(elem).astype(np.uint64)
        hi, lo = (np.asarray(x, dtype=np.uint64) for x in elem)
        return (hi << np.uint64(32)) | lo


def _butterfly_stage(ring, x: Elem, tw_np) -> Elem:
    """One CG stage over the last axis: (..., n) -> (..., n)."""
    even = _tmap(lambda a: a[..., 0::2], x)
    odd = _tmap(lambda a: a[..., 1::2], x)
    tw = _tmap(jnp.asarray, tw_np)
    t = ring.mul_tw(odd, tw)
    hi = ring.add(even, t)
    lo = ring.sub(even, t)
    return _tmap(lambda a, b: jnp.concatenate([a, b], axis=-1), hi, lo)


def _transform(plan: NttPlan, x: Elem, inverse: bool) -> Elem:
    ring = plan.ring
    x = _tmap(lambda a: jnp.take(a, jnp.asarray(plan.bitrev), axis=-1), x)
    tw_list = plan.stage_tw_inv if inverse else plan.stage_tw
    for s in range(plan.log_n):
        x = _butterfly_stage(ring, x, tw_list[s])
    if inverse:
        x = ring.mul_tw(x, _tmap(jnp.asarray, plan.n_inv_tw))
    return x


def ntt_fwd(plan: NttPlan, x: Elem) -> Elem:
    """Cyclic forward NTT over the last axis (natural order in and out)."""
    return _transform(plan, x, inverse=False)


def ntt_inv(plan: NttPlan, x: Elem) -> Elem:
    """Cyclic inverse NTT (forward network with omega^-1, then n^-1 scale)."""
    return _transform(plan, x, inverse=True)


def pointwise_mul(plan: NttPlan, a: Elem, b: Elem) -> Elem:
    """Transform-domain coefficientwise product
    (reference: rtl/ntt_pointwise_mult.v / serial POINTWISE FSM phase)."""
    return plan.ring.mul(a, b)


def cyclic_poly_mult(plan: NttPlan, a: Elem, b: Elem) -> Elem:
    """INTT(NTT(a) ⊙ NTT(b)) — the RTL top-level pipeline semantics
    (reference: rtl/ntt_poly_mult.sv FSM, test_ntt_poly_mult.py:38-43)."""
    return ntt_inv(plan, pointwise_mul(plan, ntt_fwd(plan, a), ntt_fwd(plan, b)))


def twist(plan: NttPlan, x: Elem) -> Elem:
    """x_i <- x_i * psi^i (negacyclic pre-twist, cg_ntt.py:82-83)."""
    return plan.ring.mul_tw(x, _tmap(jnp.asarray, plan.psi_pows))


def untwist(plan: NttPlan, x: Elem) -> Elem:
    """x_i <- x_i * psi^-i (negacyclic post-twist, cg_ntt.py:92)."""
    return plan.ring.mul_tw(x, _tmap(jnp.asarray, plan.psi_inv_pows))


def nwc_poly_mult(plan: NttPlan, a: Elem, b: Elem) -> Elem:
    """Negacyclic polynomial product mod (x^n + 1, q)."""
    return untwist(plan, cyclic_poly_mult(plan, twist(plan, a), twist(plan, b)))


def nwc_ntt_fwd(plan: NttPlan, x: Elem) -> Elem:
    """Twist + forward NTT (the benchmarked 'forward NTT' of the reference
    CPU harness, software_benchmark/benchmark_ntt.cpp:207-211)."""
    return ntt_fwd(plan, twist(plan, x))


# ---------------------------------------------------------------------------
# No-gather cyclic transforms (DIF forward NO->BO, DIT inverse BO->NO)
# ---------------------------------------------------------------------------
#
# The CG formulation above needs one bit-reversal gather per transform; the
# Gentleman-Sande decimation-in-frequency network instead emits the spectrum
# in bit-reversed order with every stage a contiguous-halves reshape — the
# fastest measured cyclic formulation on TPU and the one the sharded
# four-step path uses for its local transforms (the mid-twiddle table is
# permuted by the bit-reversed row index instead; sharded.py).  Same
# radix-2 butterfly algebra as the RTL network (rtl/ntt_butterfly.v,
# rtl/ntt_butterfly_inverse.v — the GS form the reference unit-tests but
# never instantiates is exactly this forward's butterfly).


def ntt_fwd_nogather(plan: NttPlan, x: Elem) -> Elem:
    """Cyclic forward NTT over the last axis: natural order in,
    BIT-REVERSED order out (position j holds X[bitrev(j)])."""
    ring = plan.ring
    n = plan.n
    for s in range(plan.log_n):
        h = n >> (s + 1)  # half-size of each butterfly group
        tw = _tmap(lambda t: jnp.asarray(t).reshape(1, h), plan.dif_tw[s])
        g = _tmap(lambda a: _shape_stage(a, 1 << s), x)
        u = _tmap(lambda a: a[..., 0, :], g)
        v = _tmap(lambda a: a[..., 1, :], g)
        hi = ring.add(u, v)
        lo = ring.mul_tw(ring.sub(u, v), tw)
        x = _tmap(
            lambda a, b: jnp.stack([a, b], axis=-2).reshape(
                a.shape[:-2] + (n,)
            ),
            hi,
            lo,
        )
    return x


def ntt_inv_nogather(plan: NttPlan, x: Elem) -> Elem:
    """Cyclic inverse NTT consuming bit-reversed input (the layout
    ntt_fwd_nogather emits), natural order out, n^-1 scale applied."""
    ring = plan.ring
    n = plan.n
    for s in range(plan.log_n - 1, -1, -1):
        h = n >> (s + 1)
        tw = _tmap(lambda t: jnp.asarray(t).reshape(1, h), plan.dit_tw_inv[s])
        g = _tmap(lambda a: _shape_stage(a, 1 << s), x)
        u = _tmap(lambda a: a[..., 0, :], g)
        v = ring.mul_tw(_tmap(lambda a: a[..., 1, :], g), tw)
        hi = ring.add(u, v)
        lo = ring.sub(u, v)
        x = _tmap(
            lambda a, b: jnp.stack([a, b], axis=-2).reshape(
                a.shape[:-2] + (n,)
            ),
            hi,
            lo,
        )
    return ring.mul_tw(x, _tmap(jnp.asarray, plan.n_inv_tw))


# ---------------------------------------------------------------------------
# Merged-psi negacyclic transforms (no twist pass, no bit-reverse gather)
# ---------------------------------------------------------------------------
#
# Second NWC formulation of the reference
# (test/refs/fast_ntt_negacyclic_convolution.py:29-154): the psi powers are
# folded into the stage twiddles of a decimation-in-time forward (natural
# order in, bit-reversed out) and a Gentleman-Sande inverse (bit-reversed in,
# natural out).  Pointwise multiplication happens in the bit-reversed
# transform domain, so a full product needs zero permutations and zero
# twist passes — on TPU every stage is a static reshape into contiguous
# block halves, the friendliest possible layout for the vector unit.


def _shape_stage(a: jnp.ndarray, groups: int) -> jnp.ndarray:
    return a.reshape(a.shape[:-1] + (groups, 2, a.shape[-1] // (2 * groups)))


def nwc_fwd_merged(plan: NttPlan, x: Elem) -> Elem:
    """Negacyclic forward transform: NTT(psi-twisted x) in bit-reversed
    order, computed with merged twiddles (CT butterflies, NO -> BO)."""
    ring = plan.ring
    n = plan.n
    for s in range(plan.log_n):
        m = 1 << s  # butterfly groups this stage
        tw = _tmap(lambda t: jnp.asarray(t).reshape(m, 1), plan.merged_tw[s])
        g = _tmap(lambda a: _shape_stage(a, m), x)
        u = _tmap(lambda a: a[..., 0, :], g)
        v = ring.mul_tw(_tmap(lambda a: a[..., 1, :], g), tw)
        hi = ring.add(u, v)
        lo = ring.sub(u, v)
        x = _tmap(
            lambda a, b: jnp.stack([a, b], axis=-2).reshape(
                a.shape[:-2] + (n,)
            ),
            hi,
            lo,
        )
    return x


def nwc_inv_merged(plan: NttPlan, x: Elem) -> Elem:
    """Inverse of nwc_fwd_merged (GS butterflies, BO -> NO), including the
    n^-1 scale and the psi^-1 untwist (both folded into the twiddles)."""
    ring = plan.ring
    n = plan.n
    for s in range(plan.log_n - 1, -1, -1):
        h = 1 << s
        tw = _tmap(
            lambda t: jnp.asarray(t).reshape(h, 1), plan.merged_tw_inv[s]
        )
        g = _tmap(lambda a: _shape_stage(a, h), x)
        u = _tmap(lambda a: a[..., 0, :], g)
        v = _tmap(lambda a: a[..., 1, :], g)
        hi = ring.add(u, v)
        lo = ring.mul_tw(ring.sub(u, v), tw)
        x = _tmap(
            lambda a, b: jnp.stack([a, b], axis=-2).reshape(
                a.shape[:-2] + (n,)
            ),
            hi,
            lo,
        )
    return ring.mul_tw(x, _tmap(jnp.asarray, plan.n_inv_tw))


def nwc_poly_mult_merged(plan: NttPlan, a: Elem, b: Elem) -> Elem:
    """Negacyclic product via the merged-twiddle path — same result as
    nwc_poly_mult, bit-exact, with no permutation or twist passes."""
    fa = nwc_fwd_merged(plan, a)
    fb = nwc_fwd_merged(plan, b)
    return nwc_inv_merged(plan, plan.ring.mul(fa, fb))


# ---------------------------------------------------------------------------
# Ring inversion / division (NTRU-style keygen workload)
# ---------------------------------------------------------------------------
#
# f is a unit of Z_q[x]/(x^n + 1) (q prime, 2n | q-1) iff every slot of its
# negacyclic spectrum is nonzero, and then NTT(f^-1) is the slotwise field
# inverse s^(q-2) (Fermat).  The exponentiation is a fixed square-and-
# multiply chain of ring products — ~bitlen(q) squarings, fully batched and
# jit-friendly (static chain, no data-dependent control flow).  This is the
# f^-1 mod (x^n+1, q) step of NTRU/Falcon key generation — a workload the
# reference's fixed FSM pipeline has no entry point for (its rtl computes
# products only), but which falls out of the spectrum representation.


def _spectrum_pow(ring, s: Elem, e: int) -> Elem:
    """Slotwise s^e via MSB-first binary square-and-multiply (e >= 1)."""
    bits = bin(e)[2:]
    acc = s
    for b in bits[1:]:
        acc = ring.mul(acc, acc)
        if b == "1":
            acc = ring.mul(acc, s)
    return acc


def _slot_nonzero(x: Elem):
    if isinstance(x, tuple):  # (hi, lo) pair layout
        return (x[0] | x[1]) != 0
    return jnp.asarray(x) != 0


def nwc_poly_inverse(plan: NttPlan, x: Elem, return_ok: bool = False):
    """Multiplicative inverse of x in Z_q[x]/(x^n + 1).

    Returns g with x ⊛ g = 1 when x is invertible.  With
    ``return_ok=True`` also returns a (batch-shaped) bool array that is
    True exactly where x is a unit (all spectrum slots nonzero); where it
    is False the returned coefficients are meaningless (a zero slot
    powers to zero — no error can be raised under jit).  Cost: one
    forward + one inverse transform + ~2·bitlen(q) pointwise products."""
    s = nwc_fwd_merged(plan, x)
    inv = _spectrum_pow(plan.ring, s, plan.p.q - 2)
    g = nwc_inv_merged(plan, inv)
    if not return_ok:
        return g
    ok = jnp.all(_slot_nonzero(s), axis=-1)
    return g, ok


def nwc_poly_div(plan: NttPlan, a: Elem, b: Elem) -> Elem:
    """a ⊛ b^-1 in Z_q[x]/(x^n + 1) (b must be a unit; see
    nwc_poly_inverse).  One transform each + the inversion chain."""
    fa = nwc_fwd_merged(plan, a)
    fb = nwc_fwd_merged(plan, b)
    return nwc_inv_merged(
        plan, plan.ring.mul(fa, _spectrum_pow(plan.ring, fb, plan.p.q - 2))
    )


_JIT_CACHE: dict = {}


def jit_fn(plan: NttPlan, fn):
    """Cache a jitted closure of fn over this plan (plans are not hashable)."""
    key = (id(plan), fn.__name__)
    if key not in _JIT_CACHE:
        _JIT_CACHE[key] = jax.jit(functools.partial(fn, plan))
    return _JIT_CACHE[key]
