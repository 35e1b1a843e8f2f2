"""Channel-parallel (residue-parallel) RNS rings over a device mesh.

Scale-out axis for wide-modulus / FHE workloads: the RNS channels of
:class:`tpu_ntt.rns.RnsRing` are INDEPENDENT for every ring operation
except the CRT exit and base conversion, so the natural multi-chip
layout shards the CHANNEL axis across the mesh — the residue-level
parallelism that production RNS-FHE systems scale by.  The reference
accelerator has no multi-device story at all (single-FPGA pipeline,
rtl/ntt_poly_mult.sv); SURVEY.md §2.8 mandates mesh sharding as the TPU
analog, and this module is its wide-modulus instance.

Design (TPU-first, not a translation):

* One q-GENERIC compiled program serves every channel.  The per-channel
  fused kernels (kernels/mxu.py) bake q into the trace, which is ideal
  single-chip but cannot be a single SPMD program over channels with
  different moduli.  Here the modulus enters as DATA: a
  :class:`_TracedRing32` carries q / Barrett-mu as traced uint32 scalars
  (every modmath primitive is already polymorphic in q — they only cast
  and compare), the per-stage twiddle tables come from
  ``tables.device_stage_tables`` (the runtime-(n,q) builder), and the
  UNCHANGED merged-psi transforms of ntt.py run under ``jax.vmap`` over
  the stacked channel axis.  ``jit`` + ``NamedSharding(mesh, P(axis))``
  then partitions the vmapped program so each device runs only its
  channels — zero collectives in products, additions, automorphisms and
  rescales (asserted by tests/test_rns_sharded.py on the compiled HLO).
* The exact CRT exit is ONE collective.  ``reconstruct_words`` needs
  ``sum_j y_j * E_j`` across all channels; multiword ripple-carry sums
  do not commute with an elementwise all-reduce (carries), so each
  channel instead accumulates its contribution in RADIX-2^16 digit
  lanes held in uint32 (per-position magnitude < 2^17 per channel,
  < 2^23 for <= 64 channels — no wrap), the digit array is summed over
  the channel axis (``jnp.sum`` on a sharded axis: XLA inserts the
  all-reduce), and the replicated finish carry-propagates the digits
  and applies the same exact k-estimate correction as
  ``RnsRing.reconstruct_words`` (rns.py:148-155).  Bit-exact vs the
  host big-int decode.

Single-chip honesty: per chip this path is SLOWER than
``RnsRing.nwc_mult`` (whose 24-bit channels ride the int8-MXU fused
kernel); its value is the scale-out — per-channel work is
embarrassingly parallel, so throughput scales with the mesh while the
fused-kernel ring is pinned to one device per program.  Measured rates:
BENCH_NOTES.md round 4.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import ntt, tables
from .modmath import (add_mod32, barrett_mul32, mul32, shoup_mul32,
                      sub_mod32)
from .params import Reduction
from .rns import RnsRing, automorphism_tables


class _TracedRing32:
    """Ring32's algebra with q and mu as TRACED uint32 scalars.

    modmath's single-word primitives only ever cast q (``U32(q)``) and
    compare against it, so they accept tracers unchanged; Barrett's
    shift amount k = bitlen(q) stays static (same-width basis).  Shoup
    twiddles arrive as (w, w_shoup) pairs from the device table builder.
    """

    nlimbs = 1
    reduction = Reduction.SHOUP

    def __init__(self, q, k: int, mu):
        self.q = q
        self.k = k
        self.mu = mu

    def add(self, a, b):
        return add_mod32(a, b, self.q)

    def sub(self, a, b):
        return sub_mod32(a, b, self.q)

    def mul(self, a, b):
        return barrett_mul32(a, b, self.q, self.k, self.mu)

    def mul_tw(self, a, tw):
        return shoup_mul32(a, tw[0], tw[1], self.q)

    def select(self, pred, t, f):
        return jnp.where(pred, t, f)

    def full_like(self, ref, v):
        return jnp.full_like(ref, v)


class _GenericPlan:
    """Duck-typed NttPlan view over one channel's traced tables: exactly
    the attributes the merged-psi transforms consume (ntt.py:299-353)."""

    def __init__(self, n: int, ring: _TracedRing32, tabs: dict):
        self.n = n
        self.log_n = n.bit_length() - 1
        self.ring = ring
        self.merged_tw = tabs["merged_tw"]
        self.merged_tw_inv = tabs["merged_tw_inv"]
        self.n_inv_tw = tabs["n_inv_tw"]


_TABLE_KEYS = ("merged_tw", "merged_tw_inv", "n_inv_tw")


def _channel_op(op, n, k, tabs, scal, *xs):
    plan = _GenericPlan(n, _TracedRing32(scal["q"], k, scal["mu"]), tabs)
    return op(plan, *xs)


class ShardedRnsRing:
    """An :class:`RnsRing` whose channels live sharded across a mesh.

    Residues are ONE stacked uint32 array of shape (k, ..., n) with the
    channel axis sharded ``P(axis)``; every ring op below is a single
    jitted SPMD program over that layout.  Requires a same-width basis
    (shared Barrett k) of single-word primes (q < 2^30 — the
    device-table band); the channel count need not divide the mesh
    (GSPMD pads uneven shards).
    """

    def __init__(self, ring: RnsRing, mesh: Mesh, axis: str = "ch",
                 batch_axis: str | None = None):
        self.ring = ring
        self.mesh = mesh
        self.axis = axis
        self.batch_axis = batch_axis
        self.n = ring.n
        ks = {p.barrett_k for p in ring.params}
        if len(ks) != 1:
            raise ValueError(
                "channel-parallel sharding needs a same-width basis "
                f"(one shared Barrett k, got {sorted(ks)})"
            )
        if ring.params[0].width > 30:
            raise ValueError(
                "channel-parallel RNS covers single-word primes "
                "(q < 2^30, the device-table band)"
            )
        self.k_bits = ring.params[0].barrett_k
        self.nch = len(ring.moduli)

        # Stacked per-channel tables (channel axis 0 on every leaf) and
        # q-dependent scalars; the per-channel builds share one compiled
        # table program (tables._stage_table_builder cache).
        per_ch = [
            {key: t[key] for key in _TABLE_KEYS}
            for t in (tables.device_stage_tables(p) for p in ring.params)
        ]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *per_ch)
        scal = {
            "q": jnp.asarray([p.q for p in ring.params], dtype=jnp.uint32),
            "mu": jnp.asarray([p.barrett_mu for p in ring.params],
                              dtype=jnp.uint32),
        }
        # jax requires the sharded axis to divide the mesh at placement /
        # jit boundaries; an uneven channel count (e.g. a drop_last view)
        # falls back to replicated layout — correct, just not scaled.
        even = self.nch % mesh.shape[axis] == 0
        ch = axis if even else None
        self.spec = NamedSharding(mesh, P(ch))
        # residue DATA may additionally shard the batch axis (channel x
        # data parallelism on a 2-D mesh): (k, B, n) -> P(ch, batch);
        # every channel-local op stays collective-free over both axes
        self.data_spec = (NamedSharding(mesh, P(ch, batch_axis))
                          if batch_axis else self.spec)
        self.tabs = jax.device_put(stacked, self.spec)
        self.scal = jax.device_put(scal, self.spec)

    # -- residue IO -----------------------------------------------------------
    def put(self, residues: Sequence) -> jnp.ndarray:
        """Per-channel residue list (RnsRing.encode layout) -> stacked
        (k, ..., n) device array, channel axis sharded."""
        x = jnp.stack([jnp.asarray(r, dtype=jnp.uint32) for r in residues])
        return jax.device_put(x, self.data_spec)

    def get(self, x) -> list:
        """Stacked residues -> host per-channel list (RnsRing layout)."""
        return [np.asarray(c) for c in np.asarray(x)]

    # -- jitted SPMD ops ------------------------------------------------------
    @functools.cached_property
    def _mult(self):
        f = functools.partial(_channel_op, ntt.nwc_poly_mult_merged,
                              self.n, self.k_bits)
        return jax.jit(jax.vmap(f))

    @functools.cached_property
    def _fwd(self):
        f = functools.partial(_channel_op, ntt.nwc_fwd_merged,
                              self.n, self.k_bits)
        return jax.jit(jax.vmap(f))

    @functools.cached_property
    def _inv(self):
        f = functools.partial(_channel_op, ntt.nwc_inv_merged,
                              self.n, self.k_bits)
        return jax.jit(jax.vmap(f))

    def nwc_mult(self, a, b):
        """Negacyclic product per channel — one SPMD program, zero
        collectives (each device transforms only its channels)."""
        return self._mult(self.tabs, self.scal, a, b)

    def nwc_fwd(self, x):
        """Merged-psi forward spectra (bit-reversed order) per channel —
        the cached-operand half of a spectrum-resident product."""
        return self._fwd(self.tabs, self.scal, x)

    def spectrum_mult(self, fa, fb):
        """Pointwise product of two spectra + inverse transform (use with
        nwc_fwd-cached fixed operands)."""
        def f(tabs, scal, sa, sb):
            ring = _TracedRing32(scal["q"], self.k_bits, scal["mu"])
            plan = _GenericPlan(self.n, ring, tabs)
            return ntt.nwc_inv_merged(plan, ring.mul(sa, sb))

        return jax.jit(jax.vmap(f))(self.tabs, self.scal, fa, fb)

    @functools.cached_property
    def _add(self):
        def f(q, a, b):
            return add_mod32(a, b, q)

        return jax.jit(jax.vmap(f))

    @functools.cached_property
    def _sub(self):
        def f(q, a, b):
            return sub_mod32(a, b, q)

        return jax.jit(jax.vmap(f))

    def add(self, a, b):
        return self._add(self.scal["q"], a, b)

    def sub(self, a, b):
        return self._sub(self.scal["q"], a, b)

    def automorphism(self, x, g: int):
        """Galois map x -> x^g (rns.automorphism_tables semantics),
        channel-local: one gather + sign flip per channel.  The jitted
        program is cached per g on the instance (rotation hot path:
        ShardedBgv.apply_galois / ShardedCkks.rotate call this twice per
        rotation — a fresh closure per call would retrace every time)."""
        cache = getattr(self, "_autom_j", None)
        if cache is None:
            cache = self._autom_j = {}
        if g not in cache:
            src, neg = automorphism_tables(self.n, g)
            src_j, neg_j = jnp.asarray(src), jnp.asarray(neg)

            @jax.jit
            @jax.vmap
            def f(q, r):
                v = jnp.take(r, src_j, axis=-1)
                return jnp.where(neg_j & (v != 0), q - v, v)

            cache[g] = f
        return cache[g](self.scal["q"], x)

    @functools.cached_property
    def _neg(self):
        @jax.jit
        @jax.vmap
        def f(q, r):
            return jnp.where(r == 0, r, q - r)

        return f

    def neg(self, x):
        """Channel-local negation (degree padding in ciphertext sub)."""
        return self._neg(self.scal["q"], x)

    def rescale(self, x):
        """Exact floor-divide by the LAST channel's prime
        (RnsRing.rescale semantics, rns.py:384-409): returns (k-1, ...)
        stacked residues of floor(c / p_k) mod q/p_k.  The dropped
        channel's residues are the only cross-channel traffic (one
        broadcast of a (..., n) slice)."""
        cached = getattr(self, "_rescale_j", None)
        if cached is not None:
            return cached(self.scal, x)
        pk = self.ring.moduli[-1]
        invs = jnp.asarray(
            [pow(pk % p.q, -1, p.q) for p in self.ring.params[:-1]],
            dtype=jnp.uint32,
        )

        @jax.jit
        def f(scal, x):
            ck = x[-1]

            def per(q, mu, inv, r):
                ck_i = jnp.where(ck >= q, ck - q, ck)
                d = sub_mod32(r, ck_i, q)
                return barrett_mul32(d, jnp.full_like(d, inv), q,
                                     self.k_bits, mu)

            out = jax.vmap(per)(scal["q"][:-1], scal["mu"][:-1], invs,
                                x[:-1])
            # keep the result channel-sharded when it still divides the
            # mesh; jax requires divisibility at the jit boundary, so an
            # uneven (k-1) falls back to the compiler's choice (a chain
            # that rescales repeatedly should size its basis so the
            # level counts it visits divide the mesh)
            if (self.nch - 1) % self.mesh.shape[self.axis] == 0:
                out = jax.lax.with_sharding_constraint(out, self.spec)
            return out

        self._rescale_j = f  # cache: one retrace per ring, not per call
        return f(self.scal, x)

    def rescale_mod_t(self, x, t: int):
        """BGV modulus switching on the sharded ring: the t-preserving
        exact division of :meth:`rns.RnsRing.rescale_mod_t` (the unique
        eps ≡ c mod p_k, eps ≡ 0 mod t correction) as the same one-
        broadcast SPMD program as :meth:`rescale` — the small w = b + m
        - t*bm split is computed once from the dropped channel and the
        per-channel corrections stay channel-local.  Bounds match the
        plain ring (2 <= t <= 65537, t < every prime, coprime to p_k)."""
        cache = getattr(self, "_rescale_mod_t_j", None)
        if cache is None:
            cache = self._rescale_mod_t_j = {}
        if t in cache:  # one retrace per (ring, t), not per call
            return cache[t](self.scal, x)
        pk = self.ring.moduli[-1]
        if not 2 <= t <= 65537:
            raise ValueError(f"plaintext modulus t must be in [2, 65537], got {t}")
        if t >= min(self.ring.moduli):
            raise ValueError("t must be smaller than every RNS prime")
        if pk % t == 0:
            raise ValueError("t must be coprime to the dropped prime")
        invs = jnp.asarray(
            [pow(pk % p.q, -1, p.q) for p in self.ring.params[:-1]],
            dtype=jnp.uint32,
        )
        pk_mods = jnp.asarray([pk % p.q for p in self.ring.params[:-1]],
                              dtype=jnp.uint32)
        inv_pk_t = pow(pk, -1, t)

        @jax.jit
        def f(scal, x):
            ck = x[-1]
            b = (ck > jnp.uint32(pk // 2)).astype(jnp.uint32)
            d_t = ck % jnp.uint32(t)
            d_t = (d_t + jnp.uint32(t)
                   - (jnp.uint32(pk % t) * b) % jnp.uint32(t)) \
                % jnp.uint32(t)
            hi, lo = mul32(d_t, jnp.full_like(d_t, inv_pk_t))
            m = (hi * jnp.uint32((1 << 32) % t) + lo % jnp.uint32(t)) \
                % jnp.uint32(t)
            bm = (m > jnp.uint32(t // 2)).astype(jnp.uint32)
            w_pos = jnp.where(bm == 0, b + m, jnp.uint32(0))
            w_neg = jnp.where(bm == 1, jnp.uint32(t) - m - b,
                              jnp.uint32(0))

            def per(q, mu, inv, pkm, r):
                ck_i = jnp.where(ck >= q, ck - q, ck)
                t_pos = barrett_mul32(jnp.full_like(ck, pkm), w_pos, q,
                                      self.k_bits, mu)
                t_neg = barrett_mul32(jnp.full_like(ck, pkm), w_neg, q,
                                      self.k_bits, mu)
                eps = add_mod32(sub_mod32(ck_i, t_pos, q), t_neg, q)
                d = sub_mod32(r, eps, q)
                return barrett_mul32(d, jnp.full_like(d, inv), q,
                                     self.k_bits, mu)

            out = jax.vmap(per)(scal["q"][:-1], scal["mu"][:-1], invs,
                                pk_mods, x[:-1])
            if (self.nch - 1) % self.mesh.shape[self.axis] == 0:
                out = jax.lax.with_sharding_constraint(out, self.spec)
            return out

        cache[t] = f
        return f(self.scal, x)

    def drop_last(self) -> "ShardedRnsRing":
        """The sharded view of the rescale target ring."""
        if getattr(self, "_drop_last", None) is None:
            self._drop_last = ShardedRnsRing(self.ring.drop_last(),
                                             self.mesh, self.axis,
                                             self.batch_axis)
        return self._drop_last

    # -- exact CRT exit (the one collective) ----------------------------------
    @functools.cached_property
    def _reconstruct(self):
        rec = _recon_program(self.ring, self.k_bits)
        return jax.jit(lambda scal, x: rec(scal["q"], scal["mu"], x))

    def reconstruct_words(self, x):
        """Exact on-device CRT exit of the stacked sharded residues:
        (k, ..., n) -> (..., n, nwords) uint32 little-endian words of the
        canonical value in [0, q).  One all-reduce over the channel axis
        (the radix-2^16 digit sum); bit-exact vs RnsRing.decode."""
        return self._reconstruct(self.scal, x)

    def decode(self, x) -> np.ndarray:
        """Host object-int exit (tests / IO)."""
        return self.ring.decode_words(self.reconstruct_words(x))

    # -- base extension / hybrid key switching on the mesh --------------------
    #
    # Key switching is the dominant cost of every RNS-FHE workload, and its
    # ModUp phase is the one inherently CROSS-CHANNEL ring operation: each
    # dnum-group digit (the canonical value mod its group product) must be
    # re-expressed in EVERY channel of the extended basis.  The sharded
    # form reuses the proven CRT-exit collective design: a group's digit
    # reconstructs via the radix-2^16 digit-lane sum (ONE all-reduce over
    # the channel axis per group), and the word->target-channel fold plus
    # the dnum-digit spectrum dot are channel-local SPMD (zero
    # collectives — asserted on the compiled HLO in
    # tests/test_rns_sharded.py).  ModDown is the channel-local rescale
    # iteration with its one dropped-channel broadcast per step.
    # Contract parity: bit-exact vs RnsRing.hybrid_key_switch
    # (rns.py:694-728) on the same inputs.

    def extended(self, special: Sequence[int]) -> "ShardedRnsRing":
        """Sharded view of the Q u P ring (special primes appended last,
        so ModDown = rescale once per special prime)."""
        key = tuple(int(m) for m in special)
        cache = getattr(self, "_extended_shard", None)
        if cache is None:
            cache = self._extended_shard = {}
        if key not in cache:
            cache[key] = ShardedRnsRing(self.ring.extended(special),
                                        self.mesh, self.axis,
                                        self.batch_axis)
        return cache[key]

    def _extend_prog(self, src_ring: RnsRing, target: "ShardedRnsRing"):
        """One jitted SPMD program: stacked residues over ``src_ring``'s
        channels -> stacked residues of the SAME canonical value over
        ``target``'s channels.  Exactly one collective (the digit-lane
        all-reduce inside the reconstruction); the per-target-channel
        word fold is vmapped q-generic local work."""
        cache = getattr(self, "_extend_progs", None)
        if cache is None:
            cache = self._extend_progs = {}
        key = (tuple(src_ring.moduli), tuple(target.ring.moduli))
        if key in cache:
            return cache[key]
        rec = _recon_program(src_ring, self.k_bits)
        W = src_ring.nwords
        kb = self.k_bits
        # 2^(32i) mod p per target channel (host, once)
        cs = jnp.asarray(
            [[pow(2, 32 * i, p.q) for i in range(W)]
             for p in target.ring.params], dtype=jnp.uint32)
        spec = target.spec

        def fold_ch(q, mu, c, words):
            acc = jnp.zeros(words.shape[:-1], dtype=jnp.uint32)
            for i in range(W):
                wm = words[..., i] % q
                term = barrett_mul32(wm, jnp.broadcast_to(c[i], wm.shape),
                                     q, kb, mu)
                acc = add_mod32(acc, term, q)
            return acc

        @jax.jit
        def f(sq, smu, tq, tmu, x):
            words = rec(sq, smu, x)
            out = jax.vmap(fold_ch, in_axes=(0, 0, 0, None))(tq, tmu, cs,
                                                             words)
            return jax.lax.with_sharding_constraint(out, spec)

        cache[key] = f
        return f

    def base_extend(self, x, target: "ShardedRnsRing"):
        """EXACT base extension of the stacked residues to ``target``'s
        basis (RnsRing.base_extend semantics, rns.py:527-558: rides the
        exact reconstruction — no BEHZ +kq term)."""
        f = self._extend_prog(self.ring, target)
        return f(self.scal["q"], self.scal["mu"], target.scal["q"],
                 target.scal["mu"], x)

    def digit_groups(self, dnum: int) -> list:
        return self.ring.digit_groups(dnum)

    def mod_up(self, x, groups, qp: "ShardedRnsRing") -> list:
        """ModUp: per digit group (contiguous channel slice of the
        stacked array), the canonical digit value exactly extended to
        every channel of ``qp``.  The group's digit-lane sum reduces
        over only the devices its channel slice spans — a group resident
        on one device reduces locally with NO collective (measured on
        the compiled HLO, tests/test_rns_sharded.py): dnum grouping
        shrinks both the transform count AND the communication."""
        out = []
        for idxs in groups:
            if list(idxs) != list(range(idxs[0], idxs[-1] + 1)):
                raise ValueError("digit groups must be contiguous")
            sub = self.ring._group_ring(idxs)
            f = self._extend_prog(sub, qp)
            sl = slice(idxs[0], idxs[-1] + 1)
            out.append(f(self.scal["q"][sl], self.scal["mu"][sl],
                         qp.scal["q"], qp.scal["mu"], x[sl]))
        return out

    def mod_down(self, qp: "ShardedRnsRing", x, num_special: int):
        """Exact floor division by the product of the last
        ``num_special`` channels (rescale iterated; channel-local with
        one dropped-channel broadcast per step)."""
        r, res = qp, x
        for _ in range(num_special):
            res = r.rescale(res)
            r = r.drop_last()
        return res

    def mod_down_mod_t(self, qp: "ShardedRnsRing", x, num_special: int,
                       t: int):
        """BGV ModDown: the t-preserving rescale_mod_t iteration
        (RnsRing.mod_down_mod_t semantics, rns.py:495-507)."""
        r, res = qp, x
        for _ in range(num_special):
            res = r.rescale_mod_t(res, t)
            r = r.drop_last()
        return res

    def _hks_dot(self, dnum: int):
        """Per-qp-channel fused spectrum dot: dnum digit forwards + one
        pointwise-accumulated inverse, vmapped over the channel axis —
        zero collectives (each device switches only its channels).
        Cached per dnum on the instance (an lru_cache here would pin
        self for the process lifetime)."""
        cache = getattr(self, "_hks_dot_cache", None)
        if cache is None:
            cache = self._hks_dot_cache = {}
        if dnum in cache:
            return cache[dnum]
        n, kb = self.n, self.k_bits

        def per_ch(tabs, scal, d, ks):
            ring = _TracedRing32(scal["q"], kb, scal["mu"])
            plan = _GenericPlan(n, ring, tabs)
            acc = None
            for j in range(dnum):
                fj = ntt.nwc_fwd_merged(plan, d[j])
                term = ring.mul(fj, ks[j])
                acc = term if acc is None else ring.add(acc, term)
            return ntt.nwc_inv_merged(plan, acc)

        cache[dnum] = jax.jit(jax.vmap(per_ch, in_axes=(0, 0, 1, 1)))
        return cache[dnum]

    def _hks_matvec(self, dnum: int):
        """Two-row variant of :meth:`_hks_dot` for ciphertext key
        switching (the (2, dnum) key matrix of fhe.KeySwitchKey): the
        dnum digit forwards are computed ONCE and dotted against both
        key rows — dnum forwards + two inverses per channel, the same
        fused-matvec shape as dispatch.best_nwc_matvec single-chip."""
        cache = getattr(self, "_hks_matvec_cache", None)
        if cache is None:
            cache = self._hks_matvec_cache = {}
        if dnum in cache:
            return cache[dnum]
        n, kb = self.n, self.k_bits

        def per_ch(tabs, scal, d, k0, k1):
            ring = _TracedRing32(scal["q"], kb, scal["mu"])
            plan = _GenericPlan(n, ring, tabs)
            u0 = u1 = None
            for j in range(dnum):
                fj = ntt.nwc_fwd_merged(plan, d[j])
                t0 = ring.mul(fj, k0[j])
                t1 = ring.mul(fj, k1[j])
                u0 = t0 if u0 is None else ring.add(u0, t0)
                u1 = t1 if u1 is None else ring.add(u1, t1)
            return (ntt.nwc_inv_merged(plan, u0),
                    ntt.nwc_inv_merged(plan, u1))

        cache[dnum] = jax.jit(jax.vmap(per_ch, in_axes=(0, 0, 1, 1, 1)))
        return cache[dnum]

    def hybrid_ksk_spectra(self, ksk, special: Sequence[int],
                           dnum: int | None = None):
        """Cached merged spectra of a fixed hybrid key over the extended
        basis: ksk is a list over groups of qp-residue lists
        (RnsRing.hybrid_ksk_spectra input layout) -> one stacked
        (dnum, k_qp, ..., n) device array, channel axis sharded."""
        qp = self.extended(special)
        groups = self.digit_groups(dnum or self.nch)
        if len(ksk) != len(groups):
            raise ValueError(
                f"ksk has {len(ksk)} digits, expected {len(groups)}")
        return jnp.stack([qp.nwc_fwd(qp.put(k)) for k in ksk])

    def hybrid_key_switch_cached(self, x, ksk_specs,
                                 special: Sequence[int],
                                 dnum: int | None = None):
        """Hybrid key switch on the mesh (the RnsRing.hybrid_key_switch
        floor contract, rns.py:694-728): ModUp (one all-reduce per
        digit group) -> fused dnum-digit spectrum dot per extended
        channel (collective-free) -> exact ModDown.  Bit-exact vs the
        single-chip ring on the same inputs (tests/test_rns_sharded.py).
        """
        qp = self.extended(special)
        groups = self.digit_groups(dnum or self.nch)
        ext = jnp.stack(self.mod_up(x, groups, qp))
        out = self._hks_dot(len(groups))(qp.tabs, qp.scal, ext, ksk_specs)
        return self.mod_down(qp, out, len(special))

    def hybrid_key_switch(self, x, ksk, special: Sequence[int],
                          dnum: int | None = None):
        """Uncached form: transforms the key each call (same transform
        count as RnsRing.hybrid_key_switch; prefer the cached form for
        fixed keys)."""
        specs = self.hybrid_ksk_spectra(ksk, special, dnum)
        return self.hybrid_key_switch_cached(x, specs, special, dnum)


def _recon_program(ring: RnsRing, k_bits: int):
    """Jittable (q, mu, x) -> words program over a host :class:`RnsRing`'s
    CRT constants: x stacked (g, ..., n) residues of ring's g channels ->
    (..., n, ring.nwords) uint32 little-endian words of the canonical
    value in [0, ring.q).  The channel-axis ``jnp.sum`` of the radix-2^16
    digit lanes is the ONE collective when x is sharded P(ch) (module
    docstring); shared by the full-basis CRT exit and the per-digit-group
    ModUp reconstructions."""
    W = ring._acc_words
    D = 2 * W  # radix-2^16 digit positions
    q_words = [int(v) for v in ring._q_words]
    E_words = jnp.asarray(ring._E_words)
    invs = jnp.asarray(ring._inv, dtype=jnp.uint32)
    p_inv_f = jnp.asarray([1.0 / p.q for p in ring.params],
                          dtype=jnp.float32)
    nch = len(ring.moduli)
    nwords = ring.nwords
    U32 = jnp.uint32
    M16 = jnp.uint32(0xFFFF)

    def rec(q_arr, mu_arr, x):
        # per-channel digit contributions, then ONE cross-channel sum
        def per_ch(q, mu, inv, ew, pinv, r):
            y = barrett_mul32(r, jnp.full_like(r, inv), q, k_bits, mu)
            digits = [jnp.zeros_like(r) for _ in range(D)]
            for w in range(W):
                hi, lo = mul32(y, jnp.broadcast_to(ew[w], y.shape))
                digits[2 * w] = digits[2 * w] + (lo & M16)
                digits[2 * w + 1] = digits[2 * w + 1] + (lo >> 16)
                if 2 * w + 2 < D:
                    digits[2 * w + 2] = digits[2 * w + 2] + (hi & M16)
                if 2 * w + 3 < D:
                    digits[2 * w + 3] = digits[2 * w + 3] + (hi >> 16)
            return jnp.stack(digits), y.astype(jnp.float32) * pinv

        digits, s = jax.vmap(per_ch)(q_arr, mu_arr, invs, E_words,
                                     p_inv_f, x)
        # channel axis is sharded: these sums are the all-reduce
        dsum = jnp.sum(digits, axis=0)  # (D, ..., n) < 2^23 per lane
        k_est = jnp.clip(jnp.floor(jnp.sum(s, axis=0)), 0,
                         nch).astype(U32)

        # replicated finish: carry-propagate radix-2^16 digits into
        # 32-bit words (each digit sum < 2^23, carries < 2^7)
        words = []
        carry = jnp.zeros_like(k_est)
        halves = []
        for t in range(D):
            v = dsum[t] + carry
            halves.append(v & M16)
            carry = v >> 16
        for w in range(W):
            words.append(halves[2 * w] | (halves[2 * w + 1] << 16))

        # T = words + q - k_est*q, then two conditional subtracts —
        # the same exact correction as RnsRing.reconstruct_words
        def add_at(acc, val, w0):
            c = val
            for i in range(w0, W):
                t = acc[i] + c
                c = (t < acc[i]).astype(U32)
                acc[i] = t

        acc = [jnp.broadcast_to(U32(qw), k_est.shape).astype(U32)
               for qw in q_words]
        for w in range(W):
            add_at(acc, words[w], w)
        m = [jnp.zeros_like(k_est) for _ in range(W)]
        for w in range(W):
            if q_words[w] == 0:
                continue
            hi, lo = mul32(k_est, jnp.full_like(k_est, q_words[w]))
            add_at(m, lo, w)
            if w + 1 < W:
                add_at(m, hi, w + 1)
        borrow = jnp.zeros_like(k_est)
        for w in range(W):
            sub = m[w] + borrow
            bw = (sub < borrow).astype(U32)
            t = acc[w] - sub
            borrow = bw + (acc[w] < sub).astype(U32)
            acc[w] = t
        for _ in range(2):
            gt = jnp.zeros_like(k_est, dtype=jnp.bool_)
            eq = jnp.ones_like(k_est, dtype=jnp.bool_)
            for w in range(W - 1, -1, -1):
                qw = U32(q_words[w])
                gt = gt | (eq & (acc[w] > qw))
                eq = eq & (acc[w] == qw)
            ge = gt | eq
            borrow = jnp.zeros_like(k_est)
            new = []
            for w in range(W):
                qw = jnp.full_like(k_est, q_words[w])
                sub = qw + borrow
                bw = (sub < borrow).astype(U32)
                t = acc[w] - sub
                borrow = bw + (acc[w] < sub).astype(U32)
                new.append(jnp.where(ge, t, acc[w]))
            acc = new
        return jnp.stack(acc[:nwords], axis=-1)

    return rec
