"""Fused 60-bit negacyclic poly-mult Pallas kernel (MXU, double-word).

Extends the 24-bit design of mxu.py to moduli q < 2^62 — the reference's
WIDTH=60 configuration (rtl/ntt_poly_mult.sv:18-24), whose C++ baseline needs
unsigned __int128 (software_benchmark/benchmark_ntt_60bit.cpp:20-24).  On the
TPU there is no wide integer at all, so:

* Ring elements are (hi, lo) uint32 pairs (modmath.Ring64 layout).
* The four-step matmuls decompose both operands into EIGHT 8-bit limbs
  lifted to bf16 — 64 MXU products per matmul step, every f32 partial sum
  < 128 * 255^2 < 2^24 (exact).  The 15 limb-diagonal sums assemble into a
  5-word (160-bit capacity) accumulator holding S < 128 * q^2 < 2^129.
* Reduction: four chained 32-bit Montgomery steps (REDC by 2^32 each),
  computing S * 2^-128 mod q.  The transform matrices are therefore stored
  as w * 2^128 mod q ("Montgomery-128"), making each matmul step
  domain-neutral.
* Elementwise steps (psi-twist, mid twiddle, pointwise, untwist) use the
  double-word Montgomery multiply of modmath (R = 2^64).  Domain plan: the
  forward right-matmul uses w * 2^192 so spectra live in the Montgomery-64
  domain (making the pointwise product mont_mul64-closed); the final
  untwist table is plain, which exits the domain for free.

Everything is bit-exact vs the golden models (tests/test_kernels_mxu64.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..modmath import mont_mul64, mul32
from ..params import NttParams

U32 = jnp.uint32
LANES = 128
NLIMBS = 8  # 8-bit limbs covering q < 2^62 operands
NWORDS = 5  # 32-bit accumulator words covering S < 2^129


def _pow_table(base: int, q: int, count: int) -> list[int]:
    out, cur = [], 1
    for _ in range(count):
        out.append(cur)
        cur = cur * base % q
    return out


class MxuPlan64:
    """Host-side constants for the double-word MXU kernels.

    Requires 2^24 <= q < 2^62 (below that use MxuPlan) and n in [256, 16384]
    with 128 | n.
    """

    def __init__(self, p: NttParams):
        if p.width > 62:
            raise ValueError("q must be < 2^62")
        if p.n % LANES or not (2 * LANES <= p.n <= LANES * LANES):
            raise ValueError(f"n={p.n} must be in [256, 16384] and divide 128")
        self.p = p
        q = p.q
        self.q = q
        self.q_lo = q & 0xFFFFFFFF
        self.q_hi = q >> 32
        # -q^-1 mod 2^32 (low word of the R=2^64 constant works: an inverse
        # mod 2^64 is an inverse mod 2^32)
        self.q_prime32 = p.mont_q_prime & 0xFFFFFFFF
        self.q_prime64 = p.mont_q_prime if p.mont_bits == 64 else (
            (-pow(q, -1, 1 << 64)) % (1 << 64)
        )
        self.n1 = p.n // LANES
        self.n2 = LANES
        self.t = LANES // self.n1
        r64 = pow(2, 64, q)
        r128 = pow(2, 128, q)
        r192 = pow(2, 192, q)

        n1, n2, t = self.n1, self.n2, self.t
        w1 = pow(p.omega, n2, q)
        w2 = pow(p.omega, n1, q)
        w1i = pow(w1, q - 2, q)
        w2i = pow(w2, q - 2, q)

        def dft_matrix(size: int, root: int, scale: int) -> np.ndarray:
            pows = _pow_table(root, q, size)
            m = np.empty((size, size), dtype=object)
            for i in range(size):
                for j in range(size):
                    m[i, j] = pows[(i * j) % size] * scale % q
            return m

        def block_diag(m: np.ndarray) -> np.ndarray:
            out = np.zeros((LANES, LANES), dtype=object)
            for b in range(t):
                out[b * n1 : (b + 1) * n1, b * n1 : (b + 1) * n1] = m
            return out

        def limbs_bf16(m: np.ndarray) -> jnp.ndarray:
            stack = [
                np.vectorize(lambda v: (int(v) >> (8 * i)) & 0xFF)(m).astype(
                    np.float32
                )
                for i in range(NLIMBS)
            ]
            return jnp.asarray(np.stack(stack), dtype=jnp.bfloat16)

        # Forward: left matmul domain-neutral (*2^128); right matmul enters
        # Montgomery-64 (*2^192).  Inverse: both domain-preserving (*2^128).
        self.w1_limbs = limbs_bf16(block_diag(dft_matrix(n1, w1, r128)))
        self.w2_limbs = limbs_bf16(dft_matrix(n2, w2, r192))
        self.w1i_limbs = limbs_bf16(block_diag(dft_matrix(n1, w1i, r128)))
        self.w2i_limbs = limbs_bf16(dft_matrix(n2, w2i, r128))

        def tiled_pair(fn):
            """(hi, lo) uint32 pair tables, tiled over the t polynomials."""
            blk = np.empty((n1, n2), dtype=object)
            for i1 in range(n1):
                for i2 in range(n2):
                    blk[i1, i2] = fn(i1, i2)
            full = np.tile(blk, (t, 1))
            hi = (full >> 32).astype(np.uint32)
            lo = (full & 0xFFFFFFFF).astype(np.uint32)
            return jnp.asarray(hi), jnp.asarray(lo)

        omega, omega_inv = p.omega, p.omega_inv
        psi, psi_inv = p.psi, p.psi_inv
        # Montgomery-64-encoded twiddles: mont_mul64(x, t*2^64) = x*t.
        self.mid = tiled_pair(lambda k1, m2: pow(omega, k1 * m2, q) * r64 % q)
        self.mid_inv = tiled_pair(
            lambda k1, m2: pow(omega_inv, k1 * m2, q) * r64 % q
        )
        # twist: x (plain) -> x * psi^i (plain); the forward right-matmul
        # then enters the Montgomery-64 domain.
        self.twist = tiled_pair(
            lambda i1, i2: pow(psi, i1 * n2 + i2, q) * r64 % q
        )
        # untwist consumes Montgomery-64 spectra and exits: plain table.
        self.untwist = tiled_pair(
            lambda i1, i2: pow(psi_inv, i1 * n2 + i2, q) * p.n_inv % q
        )

    # ------------------------------------------------------------------
    # In-kernel primitives ((hi, lo) pairs of (128, 128) uint32)
    # ------------------------------------------------------------------

    def _to_limbs(self, hi, lo):
        out = []
        for i in range(NLIMBS):
            word = lo if i < 4 else hi
            sh = 8 * (i % 4)
            out.append(
                ((word >> sh) & 0xFF).astype(jnp.int32).astype(jnp.float32)
                .astype(jnp.bfloat16)
            )
        return out

    def _redc128(self, words):
        """S * 2^-128 mod q for S held in NWORDS uint32 words (LSW first).

        Four chained Montgomery-32 steps; each clears the low word and
        shifts down by 32 bits.  After step k the value is
        (S + sum m_j q 2^(32j)) / 2^(32(k+1)) — always < 2^(129-32k) + 2q,
        so the word count shrinks by one per step.
        """
        q_lo = U32(self.q_lo)
        q_hi = U32(self.q_hi)
        qp = U32(self.q_prime32)
        w = list(words)
        for step in range(4):
            m = w[0] * qp  # mod 2^32
            mq0_hi, mq0_lo = mul32(m, jnp.broadcast_to(q_lo, m.shape).astype(U32))
            mq1_hi, mq1_lo = mul32(m, jnp.broadcast_to(q_hi, m.shape).astype(U32))
            # add m*q = (mq1_hi:mq1_lo:0) << 32 ... layout:
            #   word0 += mq0_lo      (result is 0 mod 2^32 by construction)
            #   word1 += mq0_hi + mq1_lo (+carry0)
            #   word2 += mq1_hi (+carry1) ...
            s0 = w[0] + mq0_lo
            c0 = (s0 < w[0]).astype(U32)  # s0 == 0 unless both were 0
            s1 = w[1] + mq0_hi
            c1a = (s1 < w[1]).astype(U32)
            s1b = s1 + mq1_lo
            c1b = (s1b < s1).astype(U32)
            s1c = s1b + c0
            c1c = (s1c < s1b).astype(U32)
            carry1 = c1a + c1b + c1c
            s2 = w[2] + mq1_hi
            c2a = (s2 < w[2]).astype(U32)
            s2b = s2 + carry1
            c2b = (s2b < s2).astype(U32)
            carry2 = c2a + c2b
            s3 = w[3] + carry2
            c3 = (s3 < w[3]).astype(U32)
            s4 = w[4] + c3
            # shift down one word (s0 is zero)
            w = [s1c, s2b, s3, s4, jnp.zeros_like(s4)]
        # now value = w[1]:w[0] (< 2q after the chain), w[2..] == 0
        t_hi, t_lo = w[1], w[0]
        # conditional subtract q (at most twice for safety margin)
        for _ in range(2):
            ge = (t_hi > q_hi) | ((t_hi == q_hi) & (t_lo >= q_lo))
            new_lo = t_lo - q_lo
            borrow = (t_lo < q_lo).astype(U32)
            new_hi = t_hi - q_hi - borrow
            t_hi = jnp.where(ge, new_hi, t_hi)
            t_lo = jnp.where(ge, new_lo, t_lo)
        return t_hi, t_lo

    def _matmul_mont(self, x, w_limbs, left: bool):
        """REDC128( W @ x ) or REDC128( x @ W ): x is an (hi, lo) pair."""
        hi, lo = x
        xl = self._to_limbs(hi, lo)
        diags: list = [None] * (2 * NLIMBS - 1)
        for i in range(NLIMBS):
            for j in range(NLIMBS):
                if left:
                    prod = jnp.dot(
                        w_limbs[j], xl[i], preferred_element_type=jnp.float32
                    )
                else:
                    prod = jnp.dot(
                        xl[i], w_limbs[j], preferred_element_type=jnp.float32
                    )
                prod = prod.astype(jnp.int32).astype(U32)  # < 2^24 exact
                k = i + j
                diags[k] = prod if diags[k] is None else diags[k] + prod
        # Assemble S = sum diags[k] << 8k into NWORDS words.  First merge
        # each word-aligned group of four diagonals into an exact 64-bit
        # pair (diag < 2^27, shifted terms < 2^51, sum of four < 2^53), then
        # ripple-add the pairs into the word accumulator with full carry
        # propagation.
        zero = jnp.zeros_like(hi)
        pairs = []
        for j in range(4):
            group = diags[4 * j : 4 * j + 4]
            p_lo, p_hi = group[0] if group else zero, zero
            for idx, s in enumerate(group[1:], start=1):
                sh = 8 * idx
                add_lo = s << sh
                new_lo = p_lo + add_lo
                carry = (new_lo < p_lo).astype(U32)
                p_lo = new_lo
                p_hi = p_hi + (s >> (32 - sh)) + carry  # p_hi < 2^21: exact
            pairs.append((p_hi, p_lo))
        words = [zero] * NWORDS
        for j, (p_hi, p_lo) in enumerate(pairs):
            new = words[j] + p_lo
            carry = (new < words[j]).astype(U32)
            words[j] = new
            add = p_hi
            for w_idx in range(j + 1, NWORDS):
                new = words[w_idx] + add
                c1 = (new < words[w_idx]).astype(U32)
                new2 = new + carry
                c2 = (new2 < new).astype(U32)
                words[w_idx] = new2
                add = zero
                carry = c1 + c2  # <= 1: if c1 fired, new < add < 2^32-1
                # (cheap early exit is impossible under tracing; the extra
                # adds on zero fold away in the compiler)
        return self._redc128(words)

    def _emul(self, x, table):
        return mont_mul64(x, table, self.q, self.q_prime64)

    # ------------------------------------------------------------------
    # Kernel body & wrapper
    # ------------------------------------------------------------------

    def _unpack_w(self, ref):
        return [ref[i] for i in range(NLIMBS)]

    def _nwc_kernel(
        self, a_hi, a_lo, b_hi, b_lo, w1, w2, w1i, w2i,
        tw_hi, tw_lo, mid_hi, mid_lo, midi_hi, midi_lo, un_hi, un_lo,
        out_hi, out_lo,
    ):
        w1_l, w2_l = self._unpack_w(w1), self._unpack_w(w2)
        w1i_l, w2i_l = self._unpack_w(w1i), self._unpack_w(w2i)
        tw = (tw_hi[...], tw_lo[...])
        mid = (mid_hi[...], mid_lo[...])
        midi = (midi_hi[...], midi_lo[...])
        un = (un_hi[...], un_lo[...])

        def fwd(x):
            x = self._matmul_mont(x, w1_l, left=True)
            x = self._emul(x, mid)
            return self._matmul_mont(x, w2_l, left=False)

        at = self._emul((a_hi[0], a_lo[0]), tw)
        bt = self._emul((b_hi[0], b_lo[0]), tw)
        fa = fwd(at)
        fb = fwd(bt)
        c = self._emul(fa, fb)
        c = self._matmul_mont(c, w2i_l, left=False)
        c = self._emul(c, midi)
        c = self._matmul_mont(c, w1i_l, left=True)
        r_hi, r_lo = self._emul(c, un)
        out_hi[0] = r_hi
        out_lo[0] = r_lo

    def _group_batch(self, hi, lo):
        b = hi.shape[0]
        pad = (-b) % self.t
        if pad:
            z = jnp.zeros((pad, hi.shape[1]), U32)
            hi = jnp.concatenate([hi, z], axis=0)
            lo = jnp.concatenate([lo, z], axis=0)
        g = (b + pad) // self.t
        return hi.reshape(g, LANES, LANES), lo.reshape(g, LANES, LANES), b

    def nwc_poly_mult(self, a, b, interpret: bool = False):
        """Fused negacyclic product: a, b are (hi, lo) uint32 pairs of shape
        (B, n), natural order, coefficients in [0, q)."""
        ga_hi, ga_lo, bsz = self._group_batch(*a)
        gb_hi, gb_lo, _ = self._group_batch(*b)
        g = ga_hi.shape[0]
        data_spec = pl.BlockSpec(
            (1, LANES, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        w_spec = pl.BlockSpec(
            (NLIMBS, LANES, LANES), lambda i: (0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        tbl_spec = pl.BlockSpec(
            (LANES, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        tables = (
            self.w1_limbs, self.w2_limbs, self.w1i_limbs, self.w2i_limbs,
            *self.twist, *self.mid, *self.mid_inv, *self.untwist,
        )
        in_specs = [data_spec] * 4 + [
            w_spec if t.dtype == jnp.bfloat16 else tbl_spec for t in tables
        ]
        out_hi, out_lo = pl.pallas_call(
            self._nwc_kernel,
            grid=(g,),
            out_shape=(
                jax.ShapeDtypeStruct((g, LANES, LANES), U32),
                jax.ShapeDtypeStruct((g, LANES, LANES), U32),
            ),
            in_specs=in_specs,
            out_specs=(data_spec, data_spec),
            interpret=interpret,
        )(ga_hi, ga_lo, gb_hi, gb_lo, *tables)
        return (
            out_hi.reshape(-1, self.p.n)[:bsz],
            out_lo.reshape(-1, self.p.n)[:bsz],
        )
