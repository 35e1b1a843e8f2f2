"""Fused NTT / negacyclic-poly-mult Pallas kernels built on the MXU.

TPU-native replacement for the reference's entire RTL datapath
(rtl/ntt_forward.sv, rtl/ntt_inverse.sv, rtl/ntt_poly_mult.sv FSM,
rtl/ntt_butterfly.v, rtl/mod_mult.v): where the hardware streams butterflies
through banked BRAMs over ~38k cycles, here one kernel invocation keeps a
group of polynomials resident in VMEM and the transforms run as dense
matrix multiplications on the 128x128 systolic array.

Design (chosen from measured Mosaic capabilities — no strided slices, no
lane gathers, but exact small-integer matmuls):

* An n-point NTT is the four-step factorization n = n1 * 128: length-n1
  DFTs along sublanes = a left matmul by a block-diagonal (128,128) matrix
  (T = 128/n1 polynomials share one MXU tile), an elementwise "mid" twiddle,
  and a length-128 DFT along lanes = a right matmul by the dense 128x128
  DFT-mod-q matrix.  The dense-matrix transform needs no bit reversal and
  no butterfly network at all: natural order in, four-step order
  (entry [k1, k2] = X[k2*n1 + k1]) out, and the inverse kernel consumes
  that same order, so a full poly-mult performs no permutation anywhere.
* Exactness on the MXU (default int8 path): operands are decomposed into
  8-bit limbs offset by -128 into int8; the int8 systolic pipeline (2x the
  bf16 rate) accumulates exactly in int32, and the unsigned total is
  recovered with the value-level zero-point identity (line sums + a
  precomputed mod-2^64 BASE accumulator — derivation in mxu64.py).  The
  bf16 fallback (int8_path=False) lifts unsigned limbs to bfloat16, where
  every f32 partial sum < 128 * 255^2 < 2^24 is exact.  Either way the
  64-bit total reduces with one Montgomery REDC.
* All kernel-resident values live in the Montgomery domain (x*R mod q,
  R = 2^32).  Domain entry is folded into the psi-twist table (psi^i * R^2)
  and exit into the untwist table (psi^-i * n^-1, plain), so conversion is
  free in the fused pipeline.  Validity needs 128 * q^2 < q * 2^32, i.e.
  q < 2^25; the plan enforces width <= 24 (q < 2^24) so operands stay
  3-limb — covers the shipped 24-bit sets; wider moduli use the XLA path
  (ntt.py) or the double-word kernel (mxu64.py).

Reference arithmetic being replaced: Montgomery REDC is the
REDUCTION_TYPE=2 algorithm of rtl/montgomery_reduction.v:22-26 with
word-aligned R; the psi-twist convention is new_reference/cg_ntt.py:78-92.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..modmath import mont_mul32, mul32, shoup_mul32
from ..params import NttParams
from .mxu64 import _balanced_digits

U32 = jnp.uint32
LANES = 128


def _pow_table(base: int, q: int, count: int) -> list[int]:
    out, cur = [], 1
    for _ in range(count):
        out.append(cur)
        cur = cur * base % q
    return out


def _limb_split_bf16(mat: np.ndarray, nlimbs: int) -> np.ndarray:
    """(..., r, c) uint32 -> (nlimbs, ..., r, c) bf16 of 8-bit limbs."""
    limbs = [((mat >> (8 * i)) & 0xFF).astype(np.float32) for i in range(nlimbs)]
    return jnp.asarray(np.stack(limbs), dtype=jnp.bfloat16)


class MxuPlan:
    """Host-side constants for the MXU kernels of one parameter set.

    Requires width <= 24, i.e. q < 2^24 (REDC needs q < 2^25; the plan
    additionally keeps operands 3-limb — see module docstring) and
    256 <= n <= 16384 with n % 128 == 0.

    ``int8_path=True`` runs the limb matmuls on the int8 MXU pipeline
    (2x the bf16 rate) using the zero-point trick: both operands' 8-bit
    limbs are offset by -128 into int8 range and the exact unsigned product
    is recovered as  P = P' + 128*colsum(X') + [128*rowsum(W') + 128^2*K]
    with the bracketed part precomputed host-side.  This also removes every
    int<->float conversion from the inner loop (int8 matmuls accumulate
    straight to int32).
    """

    #: dispatch name and data layout (single uint32 arrays, not pairs)
    name = "pallas-mxu"
    pairs = False

    #: ``True`` decomposes operands into FOUR balanced signed 8-bit digits
    #: (exact for v < 2^30) instead of three offset-by-128 limbs, deleting
    #: the zero-point machinery (line sums, KS multiply, BASE tables) the
    #: way the double-word kernel did for +9% (mxu64.py).  MEASURED DEAD
    #: END here: the 24-bit operand needs a 4th digit (top byte can be
    #: >= 128), so the matmul work grows 3 -> 4 limbs (5 -> 7 diagonals)
    #: — unlike the 60-bit kernel, whose limb count was 8 either way.  On
    #: hardware the extra MXU+scan work loses ~19-27%: nwc 1.60M vs 1.97M
    #: op/s, dilithium 26.8M vs 36.6M (BENCH_NOTES.md round 2).  The
    #: zero-point scheme stays the default; the toggle is the ablation
    #: record, bit-identical by tests/test_kernels_mxu.py.
    balanced = False

    def __init__(self, p: NttParams, int8_path: bool = True):
        if p.width > 24:
            raise ValueError(
                f"MxuPlan requires width <= 24, q < 2^24 (got {p.width}-bit q); use the "
                "XLA path or RNS for wider moduli"
            )
        if p.n % LANES or not (2 * LANES <= p.n <= LANES * LANES):
            raise ValueError(f"n={p.n} must be in [256, 16384] and divide 128")
        self.p = p
        q = p.q
        self.q = q
        self.q_prime = p.mont_q_prime  # -q^-1 mod 2^32
        self.n1 = p.n // LANES
        self.n2 = LANES
        self.t = LANES // self.n1  # polynomials per 128x128 MXU group
        self.nlimbs = (p.width + 7) // 8
        r = (1 << 32) % q
        r2 = p.mont_r2_mod_q

        n1, n2, t = self.n1, self.n2, self.t
        w1 = pow(p.omega, n2, q)  # primitive n1-th root
        w2 = pow(p.omega, n1, q)  # primitive n2-th root
        w1i = pow(w1, q - 2, q)
        w2i = pow(w2, q - 2, q)

        def dft_matrix(size: int, root: int) -> np.ndarray:
            pows = _pow_table(root, q, size)
            m = np.empty((size, size), dtype=np.uint32)
            for i in range(size):
                for j in range(size):
                    m[i, j] = pows[(i * j) % size]
            return m

        def block_diag(m: np.ndarray) -> np.ndarray:
            out = np.zeros((LANES, LANES), dtype=np.uint32)
            for b in range(t):
                out[b * n1 : (b + 1) * n1, b * n1 : (b + 1) * n1] = m
            return out

        to_mont = lambda m: (m.astype(object) * r % q).astype(np.uint32)
        self.int8_path = int8_path
        L = self.nlimbs
        self._s8 = sum(1 << (8 * j) for j in range(L))
        self._ks = 128 * self._s8  # < 2^24 for L=3: fits one word
        self._diag_off = 1 << 24  # |raw diag| <= 4*128*128^2 < 2^23.1
        # balanced path: 4 digits, 7 diagonals; constant accumulator init
        # that cancels the per-diagonal offsets (mod 2^64, wrap-exact
        # because the true S < 128*q^2 < 2^55)
        _bal_off = sum(self._diag_off << (8 * k) for k in range(7))
        self._bal_const = tuple(
            np.uint32(((-_bal_off) % (1 << 64)) >> (32 * i) & 0xFFFFFFFF)
            for i in range(2)
        )

        def make_w(m: np.ndarray, left: bool):
            """balanced int8 path: (stacked signed-digit matrix,); legacy
            int8 path: (int8 limbs, 2-word BASE accumulator); bf16 path:
            (bf16 limbs,).  BASE carries the zero-point corrections that
            depend only on W (line sums, constants, diagonal offsets),
            stored mod 2^64 (see mxu64.py for the derivation)."""
            if not int8_path:
                return (_limb_split_bf16(m, L),)
            if self.balanced:
                # descending-order digit stack along the contraction axis
                # (mxu64.make_w layout: diagonal k of the product is ONE
                # dot against a contiguous slice of the ascending x stack)
                digit_arrays = [np.empty(m.shape, dtype=np.int8)
                                for _ in range(4)]
                for idx, v in np.ndenumerate(m):
                    for i, dd in enumerate(_balanced_digits(int(v), 4)):
                        digit_arrays[i][idx] = dd
                stack = np.concatenate(
                    digit_arrays[::-1], axis=1 if left else 0
                )
                return (jnp.asarray(stack),)
            limbs = np.stack(
                [
                    (((m >> (8 * i)) & 0xFF).astype(np.int32) - 128).astype(
                        np.int8
                    )
                    for i in range(L)
                ]
            )
            sums = m.astype(object).sum(axis=1 if left else 0)
            ndiags = 2 * L - 1
            off_total = sum(self._diag_off << (8 * k) for k in range(ndiags))
            const = -(128 * 128 * LANES * self._s8 * self._s8) - off_total
            words = np.zeros((2, LANES, LANES), dtype=np.uint32)
            for idx, s in enumerate(sums):
                v = (self._ks * int(s) + const) % (1 << 64)
                for wi in range(2):
                    wv = (v >> (32 * wi)) & 0xFFFFFFFF
                    if left:
                        words[wi, idx, :] = wv
                    else:
                        words[wi, :, idx] = wv
            return (jnp.asarray(limbs), jnp.asarray(words))

        self.w2 = make_w(to_mont(dft_matrix(n2, w2)), left=False)
        self.w2i = make_w(to_mont(dft_matrix(n2, w2i)), left=False)

        # NWC-specialized matrices with the psi-twist folded in (same
        # factorization as mxu64.py: psi^(128*n1) scales W1's columns /
        # inverse W1's rows, psi^(+-n2) folds into the mid tables).  Scales:
        # forward W1 carries R^2 (matmul REDC then *enters* the Montgomery
        # domain from plain input); inverse W1 carries no R (REDC *exits*).
        def scaled(m, fn, axis):
            out = m.astype(object).copy()
            for i in range(LANES):
                if axis == 1:
                    out[:, i] = out[:, i] * fn(i) % q
                else:
                    out[i, :] = out[i, :] * fn(i) % q
            return out.astype(np.uint32)

        psi128 = pow(p.psi, n2, q)
        psi128_inv = pow(psi128, q - 2, q)
        r2_full = r2  # R^2 mod q
        # unscaled right matrix: REDC(w * xbar) exits the Montgomery
        # domain, so the folded forward outputs a plain NWC spectrum
        self.w2_exit = make_w(dft_matrix(n2, w2), left=False)
        self.w1_nwc = make_w(
            scaled(block_diag(dft_matrix(n1, w1)),
                   lambda c: pow(psi128, c % n1, q) * r2_full % q, axis=1),
            left=True,
        )
        w1i_nwc_mat = scaled(block_diag(dft_matrix(n1, w1i)),
                             lambda rr: pow(psi128_inv, rr % n1, q), axis=0)
        self.w1i_nwc = make_w(w1i_nwc_mat, left=True)
        # Montgomery-scaled variant for the STANDALONE NWC inverse: inside
        # the fused pipeline the plain w1i_nwc's REDC exits the Montgomery
        # domain, but nwc_ntt_inv consumes nwc_ntt_fwd's PLAIN spectrum, so
        # its exit matmul must be domain-neutral (REDC of x * (w*R) = x*w).
        self.w1i_nwc_enter = make_w(to_mont(w1i_nwc_mat), left=True)

        # Elementwise tables, all (128, 128), tiled over the t polynomials
        # of a group.  mid[k1, m2] = omega^(+-k1*m2) in Montgomery form.
        def tiled(fn) -> np.ndarray:
            blk = np.empty((n1, n2), dtype=np.uint32)
            for i1 in range(n1):
                for i2 in range(n2):
                    blk[i1, i2] = fn(i1, i2)
            return jnp.asarray(np.tile(blk, (t, 1)))

        omega, omega_inv = p.omega, p.omega_inv
        psi, psi_inv = p.psi, p.psi_inv
        # Shoup-encoded mid tables (plain twiddle + floor(t*2^32/q)): one
        # widening multiply per elementwise pass, domain-preserving —
        # every kernel's only surviving elementwise twiddle pass.  The
        # standalone/cyclic entries fold domain entry into R^2-scaled
        # left matrices and exit into plain ones (one REDC enters, one
        # exits, both riding matmuls that happen anyway — the same
        # round-2 rework that removed the 60-bit kernels' enter/exit
        # passes, mxu64.py), so the old enter/exit/twist/untwist
        # elementwise tables no longer exist at all.
        def shoup_tiled(fn):
            return (tiled(fn), tiled(lambda i1, i2: (fn(i1, i2) << 32) // q))

        self.mid_shoup = shoup_tiled(lambda k1, m2: pow(omega, k1 * m2, q))
        # n^-1 folds into the inverse mid (the reference SCALE phase,
        # rtl/ntt_inverse.v:174-196, at zero extra passes)
        self.mid_inv_fold = shoup_tiled(
            lambda k1, m2: pow(omega_inv, k1 * m2, q) * p.n_inv % q
        )
        self.mid_nwc = shoup_tiled(
            lambda k1, m2: pow(omega, k1 * m2, q) * pow(psi, m2, q) % q
        )
        self.mid_inv_nwc = shoup_tiled(
            lambda k1, m2: pow(omega_inv, k1 * m2, q)
            * pow(psi_inv, m2, q) % q * p.n_inv % q
        )
        # entry-scaled left matrices (REDC of x_plain * w*R^2 lands in the
        # Montgomery domain) and plain exit matrices (REDC of xbar * w
        # exits) for the standalone/cyclic kernels
        scale2 = lambda m: (m.astype(object) * r2 % q).astype(np.uint32)
        self.w1_enter = make_w(scale2(block_diag(dft_matrix(n1, w1))),
                               left=True)
        self.w2i_enter = make_w(scale2(dft_matrix(n2, w2i)), left=False)
        self.w1i_exit = make_w(block_diag(dft_matrix(n1, w1i)), left=True)

    # ------------------------------------------------------------------
    # In-kernel primitives (pure jnp on (128, 128) uint32 values)
    # ------------------------------------------------------------------

    def _to_limbs(self, x):
        L = self.nlimbs
        return [
            ((x >> (8 * i)) & 0xFF).astype(jnp.int32).astype(jnp.float32)
            .astype(jnp.bfloat16)
            for i in range(L)
        ]

    def _to_limbs_bal(self, x):
        """Four balanced signed 8-bit digits of x < 2^25 (any operand or
        lazy representative here; top digit < 64 so the borrow is always
        absorbed).  Serial borrow ripple, bit-twiddled booleans only
        (`jnp.where`-based digit selects hang Mosaic — CLAUDE.md)."""
        b = [(x >> (8 * j)) & 0xFF for j in range(4)]
        cs = [None]
        c = None
        for j in range(3):
            t = b[j] if c is None else b[j] + c
            c = (t + 128) >> 8
            cs.append(c)
        out = []
        for j in range(4):
            t = b[j] if cs[j] is None else b[j] + cs[j]
            biased = t + 128
            out.append(((biased & 0xFF).astype(jnp.int32) - 128)
                       .astype(jnp.int8))
        return out

    def _matmul_balanced(self, x, w_set, left: bool):
        """REDC( W @ x ) / REDC( x @ W ) on balanced signed digits: the 7
        digit diagonals come out of the int8 MXU as TRUE signed partial
        sums (one dot per diagonal against a contiguous slice of the
        ascending x-digit stack), so the only bookkeeping left is the
        constant per-diagonal offset cancelled by the precomputed
        accumulator init — no line sums, no KS multiply, no BASE tables."""
        (w_desc,) = w_set
        xl = self._to_limbs_bal(x)
        xstack = jnp.concatenate(xl, axis=0 if left else 1)
        unit = x.shape[-2] if left else x.shape[-1]
        i32 = jnp.int32
        diags = []
        for k in range(7):
            i0, i1 = max(0, k - 3), min(3, k)
            p0 = 3 - (k - i0)
            kk = (i1 - i0 + 1) * unit
            if left:
                prod = jnp.dot(
                    w_desc[:, p0 * unit : p0 * unit + kk],
                    xstack[i0 * unit : i0 * unit + kk, :],
                    preferred_element_type=i32,
                )
            else:
                prod = jnp.dot(
                    xstack[:, i0 * unit : i0 * unit + kk],
                    w_desc[p0 * unit : p0 * unit + kk, :],
                    preferred_element_type=i32,
                )
            diags.append((prod + i32(self._diag_off)).astype(U32))

        lo = jnp.full_like(x, self._bal_const[0])
        hi = jnp.full_like(x, self._bal_const[1])
        for k, s in enumerate(diags):
            sh = 8 * k
            if sh >= 32:
                hi = hi + (s << (sh - 32))
                continue
            add_lo = s << sh
            new_lo = lo + add_lo
            carry = (new_lo < lo).astype(U32)
            lo = new_lo
            hi = hi + carry
            if sh:
                hi = hi + (s >> (32 - sh))
        return self._redc_pair(hi, lo)

    def _redc_pair(self, hi, lo):
        """(hi*2^32 + lo) * R^-1 mod q, valid for hi*2^32+lo < q*2^32."""
        m = lo * U32(self.q_prime)
        mq_hi, _ = mul32(m, jnp.full_like(lo, self.q))
        t = hi + mq_hi + (lo != 0).astype(U32)
        return jnp.where(t >= self.q, t - U32(self.q), t)

    def _matmul_mont(self, x, w_set, left: bool):
        """REDC( W @ x ) or REDC( x @ W ) with 8-bit-limb MXU matmuls.

        W is stored in Montgomery form, so Montgomery-domain x stays in
        domain.  int8 path: zero-point scheme with precomputed BASE words
        (exact; see class docstring).  bf16 path: unsigned limbs, every f32
        partial sum < 2^24 (exact)."""
        L = self.nlimbs
        if self.int8_path:
            if self.balanced:
                return self._matmul_balanced(x, w_set, left)
            return self._matmul_int8(x, w_set, left)
        (w_limbs,) = w_set
        xl = self._to_limbs(x)
        diags: list = [None] * (2 * L - 1)
        for i in range(L):
            for j in range(L):
                if left:
                    prod = jnp.dot(
                        w_limbs[j], xl[i], preferred_element_type=jnp.float32
                    )
                else:
                    prod = jnp.dot(
                        xl[i], w_limbs[j], preferred_element_type=jnp.float32
                    )
                prod = prod.astype(jnp.int32).astype(U32)  # exact, < 2^24
                k = i + j
                diags[k] = prod if diags[k] is None else diags[k] + prod

        # Assemble S = sum_k diags[k] << 8k into a 64-bit (hi, lo) pair.
        hi = jnp.zeros_like(x)
        lo = jnp.zeros_like(x)
        for k, s in enumerate(diags):
            sh = 8 * k
            if sh >= 32:
                hi = hi + (s << (sh - 32))
                continue
            add_lo = s << sh
            new_lo = lo + add_lo
            carry = (new_lo < lo).astype(U32)
            lo = new_lo
            hi = hi + carry
            if sh:
                hi = hi + (s >> (32 - sh))
        return self._redc_pair(hi, lo)

    def _matmul_int8(self, x, w_set, left: bool):
        """int8-MXU matmul-mod: S = D'' + KS*linesum(x) + BASE, one REDC.

        All quantities mod 2^64; true S = sum_k W*x < 128*q^2 < 2^53 so the
        wrapping 2-word arithmetic is exact."""
        L = self.nlimbs
        i32 = jnp.int32
        w_limbs, base = w_set
        xl = [
            ((((x >> (8 * i)) & 0xFF).astype(i32)) - 128).astype(jnp.int8)
            for i in range(L)
        ]
        diags: list = [None] * (2 * L - 1)
        for i in range(L):
            for j in range(L):
                if left:
                    prod = jnp.dot(w_limbs[j], xl[i], preferred_element_type=i32)
                else:
                    prod = jnp.dot(xl[i], w_limbs[j], preferred_element_type=i32)
                k = i + j
                diags[k] = prod if diags[k] is None else diags[k] + prod
        diags = [(d + i32(self._diag_off)).astype(U32) for d in diags]

        # accumulator = BASE + KS * (line sum of x); x values < q < 2^24 so
        # the int32 line sum (< 2^31) is exact, and KS*sum < 2^55 fits the pair.
        lsum = jnp.sum(x.astype(i32), axis=0 if left else 1, keepdims=True)
        ch, cl = mul32(lsum.astype(U32), jnp.full_like(lsum, self._ks).astype(U32))
        lo = base[0] + cl
        c = (lo < cl).astype(U32)
        hi = base[1] + ch + c

        # add the diagonals: sum_k diags[k] << 8k (diag < 2^25)
        for k, s in enumerate(diags):
            sh = 8 * k
            if sh >= 32:
                hi = hi + (s << (sh - 32))
                continue
            add_lo = s << sh
            new_lo = lo + add_lo
            carry = (new_lo < lo).astype(U32)
            lo = new_lo
            hi = hi + carry
            if sh:
                hi = hi + (s >> (32 - sh))
        return self._redc_pair(hi, lo)

    def _emul(self, x, table):
        """Elementwise Montgomery product with a precomputed table."""
        return mont_mul32(x, table, self.q, self.q_prime)

    # ------------------------------------------------------------------
    # Kernel bodies (variadic: each W set is 1 ref (bf16) or 2 (int8+BASE))
    # ------------------------------------------------------------------

    def _take_w(self, refs):
        """Pop one W set from the flat ref list -> ((limbs..., [base]), rest)."""
        if self.int8_path and self.balanced:
            return (refs[0],), refs[1:]  # one stacked digit matrix
        if self.int8_path:
            limbs_ref, base_ref = refs[0], refs[1]
            return ([limbs_ref[i] for i in range(self.nlimbs)], base_ref), refs[2:]
        return ([refs[0][i] for i in range(self.nlimbs)],), refs[1:]

    def _nwc_kernel(self, a_ref, b_ref, *refs):
        """Twist-folded: plain in -> [W1*psi^(128n1)*R^2] -> *mid*psi^(n2)
        -> [W2*R] (Montgomery NWC spectrum); pointwise; [W2i*R] ->
        *mid_inv*psi^(-n2)*n^-1 -> [W1i*psi^(-128n1), no R] -> plain out.
        Zero elementwise twist/untwist/entry/exit passes."""
        w1, refs = self._take_w(refs)
        w2, refs = self._take_w(refs)
        w1i, refs = self._take_w(refs)
        w2i, refs = self._take_w(refs)
        m_w, m_s, mi_w, mi_s = (r[...] for r in refs[:4])
        out_ref = refs[4]
        for g in range(a_ref.shape[0]):

            def fwd(x):
                x = self._matmul_mont(x, w1, left=True)
                x = shoup_mul32(x, m_w, m_s, self.q)
                return self._matmul_mont(x, w2, left=False)

            fa = fwd(a_ref[g])
            fb = fwd(b_ref[g])
            c = self._emul(fa, fb)  # pointwise (variable), Montgomery
            c = self._matmul_mont(c, w2i, left=False)
            c = shoup_mul32(c, mi_w, mi_s, self.q)
            out_ref[g] = self._matmul_mont(c, w1i, left=True)


    def _make_dot_kernel(self, cached: bool):
        """Fused spectrum dot INTT(Σ_k NTT(a_k)·NTT(b_k)) — one inverse
        per output, spectra accumulated in VMEM (data blocks are
        (gps, K, 128, 128), the K pairs unrolled at trace time).  With
        ``cached`` the b-side blocks are precomputed nwc_spectrum stacks
        (Montgomery domain) and skip the forward entirely — the
        key-switching / fixed-A shape: K forwards + 1 inverse."""

        def kernel(a_ref, b_ref, *refs):
            w1, refs = self._take_w(refs)
            w2, refs = self._take_w(refs)
            w1i, refs = self._take_w(refs)
            w2i, refs = self._take_w(refs)
            m_w, m_s, mi_w, mi_s = (r[...] for r in refs[:4])
            out_ref = refs[4]
            q = U32(self.q)
            for g in range(a_ref.shape[0]):

                def fwd(x):
                    x = self._matmul_mont(x, w1, left=True)
                    x = shoup_mul32(x, m_w, m_s, self.q)
                    return self._matmul_mont(x, w2, left=False)

                acc = None
                for k in range(a_ref.shape[1]):
                    fb = b_ref[g, k] if cached else fwd(b_ref[g, k])
                    c = self._emul(fwd(a_ref[g, k]), fb)
                    if acc is not None:
                        s = acc + c  # both < q < 2^24: no u32 overflow
                        acc = jnp.where(s >= q, s - q, s)
                    else:
                        acc = c
                c = self._matmul_mont(acc, w2i, left=False)
                c = shoup_mul32(c, mi_w, mi_s, self.q)
                out_ref[g] = self._matmul_mont(c, w1i, left=True)

        return kernel

    def _make_matvec_kernel(self, k: int, l: int):
        """Fused matrix-vector product over the polynomial ring: the s
        vector is transformed ONCE (l forwards), each output row
        accumulates against cached A-spectrum blocks in VMEM, and one
        inverse runs per output — l + k transforms total for k·l products
        (the Dilithium A@s signing/verify shape, where A is the fixed
        public matrix; chipyard/ntt-test.c would drive k·l full FSM
        pipelines for the same work)."""

        def kernel(s_ref, a_ref, *refs):
            w1, refs = self._take_w(refs)
            w2, refs = self._take_w(refs)
            w1i, refs = self._take_w(refs)
            w2i, refs = self._take_w(refs)
            m_w, m_s, mi_w, mi_s = (r[...] for r in refs[:4])
            out_ref = refs[4]
            q = U32(self.q)
            for g in range(s_ref.shape[0]):

                def fwd(x):
                    x = self._matmul_mont(x, w1, left=True)
                    x = shoup_mul32(x, m_w, m_s, self.q)
                    return self._matmul_mont(x, w2, left=False)

                fs = [fwd(s_ref[g, j]) for j in range(l)]
                for i in range(k):
                    acc = None
                    for j in range(l):
                        c = self._emul(fs[j], a_ref[i, j])
                        if acc is not None:
                            t = acc + c  # both < q < 2^24: no u32 overflow
                            acc = jnp.where(t >= q, t - q, t)
                        else:
                            acc = c
                    c = self._matmul_mont(acc, w2i, left=False)
                    c = shoup_mul32(c, mi_w, mi_s, self.q)
                    out_ref[g, i] = self._matmul_mont(c, w1i, left=True)

        return kernel

    def _nwc_spec_kernel(self, x_ref, *refs):
        """Forward half of the fused NWC pipeline, output left in the
        internal Montgomery domain — the cacheable operand spectrum."""
        w1, refs = self._take_w(refs)
        w2, refs = self._take_w(refs)
        m_w, m_s = (r[...] for r in refs[:2])
        out_ref = refs[2]
        for g in range(x_ref.shape[0]):
            x = self._matmul_mont(x_ref[g], w1, left=True)
            x = shoup_mul32(x, m_w, m_s, self.q)
            out_ref[g] = self._matmul_mont(x, w2, left=False)

    def _nwc_cached_kernel(self, a_ref, spec_ref, *refs):
        """Product against a precomputed spectrum: one forward transform
        instead of two (the repeated-operand workload: NTT(b) cached once,
        many a*b products)."""
        w1, refs = self._take_w(refs)
        w2, refs = self._take_w(refs)
        w1i, refs = self._take_w(refs)
        w2i, refs = self._take_w(refs)
        m_w, m_s, mi_w, mi_s = (r[...] for r in refs[:4])
        out_ref = refs[4]
        for g in range(a_ref.shape[0]):
            x = self._matmul_mont(a_ref[g], w1, left=True)
            x = shoup_mul32(x, m_w, m_s, self.q)
            fa = self._matmul_mont(x, w2, left=False)
            c = self._emul(fa, spec_ref[g])
            c = self._matmul_mont(c, w2i, left=False)
            c = shoup_mul32(c, mi_w, mi_s, self.q)
            out_ref[g] = self._matmul_mont(c, w1i, left=True)

    def _nwc_fwd_kernel(self, x_ref, *refs):
        """Twist-folded forward (psi-twist + NTT): 2 matmul steps + 1
        Shoup pass; plain in, plain NWC spectrum out (four-step layout)."""
        w1, refs = self._take_w(refs)
        w2x, refs = self._take_w(refs)
        m_w, m_s = (r[...] for r in refs[:2])
        out_ref = refs[2]
        for g in range(x_ref.shape[0]):
            x = self._matmul_mont(x_ref[g], w1, left=True)
            x = shoup_mul32(x, m_w, m_s, self.q)
            out_ref[g] = self._matmul_mont(x, w2x, left=False)

    def _nwc_inv_kernel(self, x_ref, *refs):
        """Untwist-folded inverse (the mirror of _nwc_fwd_kernel): plain NWC
        spectrum in (four-step layout, as nwc_ntt_fwd emits), plain
        natural-order coefficients out; psi^(-i)-untwist and n^-1 fold into
        the tables — zero elementwise exit passes."""
        w2i, refs = self._take_w(refs)
        w1ip, refs = self._take_w(refs)
        mi_w, mi_s = (r[...] for r in refs[:2])
        out_ref = refs[2]
        for g in range(x_ref.shape[0]):
            c = self._matmul_mont(x_ref[g], w2i, left=False)
            c = shoup_mul32(c, mi_w, mi_s, self.q)
            out_ref[g] = self._matmul_mont(c, w1ip, left=True)

    # ------------------------------------------------------------------
    # pallas_call wrappers
    # ------------------------------------------------------------------

    #: max groups of 128x128 processed per grid step (amortizes per-step
    #: pipeline overhead; each group is t polynomials).  Clamped to the
    #: actual group count so small batches pay no padding.
    groups_per_step = 8

    def _eff_gps(self, batch_rows: int) -> int:
        groups = -(-batch_rows // self.t)
        return max(1, min(self.groups_per_step, groups))

    def _group_batch(self, x):
        """(B, n) uint32 -> (G, 128, 128) groups of t polys, plus pad info.

        G is padded to a multiple of the effective groups-per-step."""
        b = x.shape[0]
        step = self.t * self._eff_gps(b)
        pad = (-b) % step
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), U32)], axis=0)
        g = (b + pad) // self.t
        return x.reshape(g, LANES, LANES), b

    def _call(self, kernel, data_args, table_args, interpret=False):
        gps = self._eff_gps(data_args[0].shape[0] * self.t)
        g = data_args[0].shape[0]
        data_spec = pl.BlockSpec(
            (gps, LANES, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        w_spec = pl.BlockSpec(
            (self.nlimbs, LANES, LANES), lambda i: (0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        tbl_spec = pl.BlockSpec(
            (LANES, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        base_spec = pl.BlockSpec(
            (2, LANES, LANES), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        )

        def spec_for(a):
            if a.dtype == jnp.int8 and a.ndim == 2:
                # balanced stacked digit matrix: full-array constant block
                return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                    memory_space=pltpu.VMEM)
            if a.dtype in (jnp.bfloat16, jnp.int8):
                return w_spec
            if a.ndim == 3:
                return base_spec
            return tbl_spec

        in_specs = [data_spec] * len(data_args) + [
            spec_for(a) for a in table_args
        ]
        return pl.pallas_call(
            kernel,
            grid=(g // gps,),
            out_shape=jax.ShapeDtypeStruct((g, LANES, LANES), U32),
            in_specs=in_specs,
            out_specs=data_spec,
            interpret=interpret,
        )(*data_args, *table_args)

    def nwc_poly_mult(self, a, b, interpret: bool = False):
        """Fused negacyclic product of batched polynomials.

        a, b: (B, n) uint32, coefficients in [0, q), natural order.
        Returns (B, n) uint32, natural order — one kernel, zero HBM round
        trips between pipeline phases (the reference spends >50% of its
        38,275 cycles on exactly those round trips,
        reports/final-report.tex:1693).
        """
        ga, bsz = self._group_batch(a)
        gb, _ = self._group_batch(b)
        out = self._call(
            self._nwc_kernel,
            (ga, gb),
            (
                *self.w1_nwc, *self.w2, *self.w1i_nwc, *self.w2i,
                *self.mid_nwc, *self.mid_inv_nwc,
            ),
            interpret=interpret,
        )
        return out.reshape(-1, self.p.n)[:bsz]

    def cyclic_poly_mult(self, a, b, interpret: bool = False):
        """Fused cyclic product INTT(NTT(a) . NTT(b)) — the RTL top-level
        semantics (rtl/ntt_poly_mult.sv pipeline).  Same kernel body as
        the NWC product with unscaled-twiddle tables: domain entry rides
        the R^2-scaled first matmul, n^-1 the Shoup inverse mid, and the
        exit the plain last matmul — zero elementwise enter/exit passes
        (the rework that bought the 60-bit kernels +23%, mxu64.py)."""
        ga, bsz = self._group_batch(a)
        gb, _ = self._group_batch(b)
        out = self._call(
            self._nwc_kernel,
            (ga, gb),
            (
                *self.w1_enter, *self.w2, *self.w1i_exit, *self.w2i,
                *self.mid_shoup, *self.mid_inv_fold,
            ),
            interpret=interpret,
        )
        return out.reshape(-1, self.p.n)[:bsz]

    def nwc_spectrum(self, x, interpret: bool = False):
        """Cacheable operand spectrum (internal Montgomery domain,
        four-step layout) for nwc_poly_mult_cached."""
        gx, bsz = self._group_batch(x)
        out = self._call(
            self._nwc_spec_kernel,
            (gx,),
            (*self.w1_nwc, *self.w2, *self.mid_nwc),
            interpret=interpret,
        )
        return out.reshape(-1, self.p.n)[:bsz]

    def nwc_dot(self, a, b, interpret: bool = False):
        """Fused INTT(Σ_k NTT(a_k)·NTT(b_k)): a, b are (K, B, n) uint32
        (natural order, [0, q)); returns (B, n) = Σ_k a_k ⊛ b_k
        (negacyclic) — the lattice A@s / Dilithium verify inner product,
        one inverse transform per output, spectra never leave VMEM."""
        return self._dot_call(a, b, cached=False, interpret=interpret)

    def nwc_dot_cached(self, a, spectra, interpret: bool = False):
        """Fused dot against precomputed spectra: spectra is the (K, B, n)
        stack of ``nwc_spectrum(b_k)`` (Montgomery domain).  K forwards +
        ONE inverse instead of 2K+1 transforms — the key-switching /
        fixed-operand inner product, where the b-side (keys, public A
        rows) is transformed once and reused across many dots."""
        return self._dot_call(a, spectra, cached=True, interpret=interpret)

    def _dot_call(self, a, b, cached: bool, interpret: bool):
        K = a.shape[0]
        if not 1 <= K <= 8:
            raise ValueError(f"nwc_dot supports 1 <= K <= 8 pairs, got {K}")

        def stack(x):
            gs, bsz = [], None
            for k in range(K):
                gk, bsz = self._group_batch(x[k])
                gs.append(gk)
            return jnp.stack(gs, axis=1), bsz

        ga, bsz = stack(a)
        gb, _ = stack(b)
        g = ga.shape[0]
        gps = self._eff_gps(g * self.t)
        data_spec = pl.BlockSpec(
            (gps, K, LANES, LANES), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_spec = pl.BlockSpec(
            (gps, LANES, LANES), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )
        tables = (
            *self.w1_nwc, *self.w2, *self.w1i_nwc, *self.w2i,
            *self.mid_nwc, *self.mid_inv_nwc,
        )
        w_spec = pl.BlockSpec(
            (self.nlimbs, LANES, LANES), lambda i: (0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        base_spec = pl.BlockSpec(
            (2, LANES, LANES), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        )
        tbl_spec = pl.BlockSpec(
            (LANES, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
        )

        def spec_for(t):
            if t.dtype == jnp.int8 and t.ndim == 2:
                return pl.BlockSpec(t.shape, lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
            if t.dtype in (jnp.bfloat16, jnp.int8):
                return w_spec
            if t.ndim == 3:
                return base_spec
            return tbl_spec

        out = pl.pallas_call(
            self._make_dot_kernel(cached),
            grid=(g // gps,),
            out_shape=jax.ShapeDtypeStruct((g, LANES, LANES), U32),
            in_specs=[data_spec] * 2 + [spec_for(t) for t in tables],
            out_specs=out_spec,
            interpret=interpret,
        )(ga, gb, *tables)
        return out.reshape(-1, self.p.n)[:bsz]

    def nwc_matvec_spectra(self, A, interpret: bool = False):
        """Precompute block-layout spectra for ``nwc_matvec_cached``: A is
        (k, l, n) uint32 (the fixed polynomial matrix, e.g. a Dilithium
        public key); returns (k, l, rows, 128) Montgomery-domain spectrum
        blocks, each tiled across the t poly slots of one MXU group so
        the kernel can multiply them against any batch block directly."""
        k, l = A.shape[0], A.shape[1]
        rows = []
        for i in range(k):
            row = []
            for j in range(l):
                tiled = jnp.tile(A[i, j][None], (self.t, 1))
                spec = self.nwc_spectrum(tiled, interpret=interpret)
                gb, _ = self._group_batch(spec)
                row.append(gb[0])
            rows.append(jnp.stack(row))
        return jnp.stack(rows)

    def nwc_matvec_cached(self, s, A_blocks, interpret: bool = False):
        """Fused A @ s over Z_q[x]/(x^n + 1): s is (l, B, n) uint32,
        A_blocks the (k, l, rows, 128) output of ``nwc_matvec_spectra``;
        returns (k, B, n) with out[i] = Σ_j A[i,j] ⊛ s[j].  The s vector
        is transformed once and every spectrum stays in VMEM: l + k
        transforms for k·l products (vs k·l + l staged, or 3·k·l naive)."""
        k, l = A_blocks.shape[0], A_blocks.shape[1]
        if s.shape[0] != l:
            raise ValueError(f"s has {s.shape[0]} rows, A has l={l} columns")
        if not (1 <= l <= 8 and 1 <= k <= 8):
            raise ValueError(f"nwc_matvec supports 1 <= k, l <= 8, got "
                             f"k={k}, l={l}")

        gs_list, bsz = [], None
        for j in range(l):
            gj, bsz = self._group_batch(s[j])
            gs_list.append(gj)
        gs = jnp.stack(gs_list, axis=1)  # (G, l, rows, LANES)
        g = gs.shape[0]
        gps = self._eff_gps(g * self.t)
        data_spec = pl.BlockSpec(
            (gps, l, LANES, LANES), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        a_spec = pl.BlockSpec(
            (k, l, LANES, LANES), lambda i: (0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_spec = pl.BlockSpec(
            (gps, k, LANES, LANES), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        tables = (
            *self.w1_nwc, *self.w2, *self.w1i_nwc, *self.w2i,
            *self.mid_nwc, *self.mid_inv_nwc,
        )
        w_spec = pl.BlockSpec(
            (self.nlimbs, LANES, LANES), lambda i: (0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        base_spec = pl.BlockSpec(
            (2, LANES, LANES), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        )
        tbl_spec = pl.BlockSpec(
            (LANES, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
        )

        def spec_for(t):
            if t.dtype == jnp.int8 and t.ndim == 2:
                return pl.BlockSpec(t.shape, lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
            if t.dtype in (jnp.bfloat16, jnp.int8):
                return w_spec
            if t.ndim == 3:
                return base_spec
            return tbl_spec

        compiler_params = None
        if gps * (k + l) > 96 and not interpret:
            # The matvec kernel's per-step temporaries scale with
            # gps * (k + l) rows; at (k, l) = (8, 7), gps = 8 they reach
            # 17.21 MB and exceed Mosaic's default 16 MB scoped-VMEM
            # budget (measured OOM at the ML-DSA-87 shape, B = 16384).
            # Lift the cap for those large shapes only — every measured
            # config at or below gps*(k+l) = 96 keeps the default limit
            # and its recorded performance (same policy as mxu64._call).
            compiler_params = pltpu.CompilerParams(
                vmem_limit_bytes=32 * 1024 * 1024
            )
        out = pl.pallas_call(
            self._make_matvec_kernel(k, l),
            grid=(g // gps,),
            out_shape=jax.ShapeDtypeStruct((g, k, LANES, LANES), U32),
            in_specs=[data_spec, a_spec] + [spec_for(t) for t in tables],
            out_specs=out_spec,
            interpret=interpret,
            compiler_params=compiler_params,
        )(gs, A_blocks, *tables)
        out = out.transpose(1, 0, 2, 3).reshape(k, -1, self.p.n)
        return out[:, :bsz]

    def nwc_poly_mult_cached(self, a, spectrum, interpret: bool = False):
        """Negacyclic product of a against a cached nwc_spectrum — one
        forward transform instead of two (~33% less work when one operand
        repeats across many products)."""
        ga, bsz = self._group_batch(a)
        gs, _ = self._group_batch(spectrum)
        out = self._call(
            self._nwc_cached_kernel,
            (ga, gs),
            (
                *self.w1_nwc, *self.w2, *self.w1i_nwc, *self.w2i,
                *self.mid_nwc, *self.mid_inv_nwc,
            ),
            interpret=interpret,
        )
        return out.reshape(-1, self.p.n)[:bsz]

    def nwc_ntt_fwd(self, x, interpret: bool = False):
        """Batched negacyclic forward transform (twist folded), four-step
        output layout."""
        gx, bsz = self._group_batch(x)
        out = self._call(
            self._nwc_fwd_kernel,
            (gx,),
            (*self.w1_nwc, *self.w2_exit, *self.mid_nwc),
            interpret=interpret,
        )
        return out.reshape(-1, self.p.n)[:bsz]

    def nwc_ntt_inv(self, x, interpret: bool = False):
        """Batched negacyclic inverse transform (untwist + n^-1 folded),
        consuming nwc_ntt_fwd's plain-domain four-step-layout spectrum;
        natural-order coefficients out.  Completes the staged-spectrum API:
        users who keep NWC spectra (pointwise-multiply via modmath, e.g.
        accumulating many products) return to coefficients with one kernel
        (the reference's inverse+SCALE phases, rtl/ntt_inverse.v)."""
        gx, bsz = self._group_batch(x)
        out = self._call(
            self._nwc_inv_kernel,
            (gx,),
            (*self.w2i, *self.w1i_nwc_enter, *self.mid_inv_nwc),
            interpret=interpret,
        )
        return out.reshape(-1, self.p.n)[:bsz]

    def ntt_fwd(self, x, interpret: bool = False):
        """Batched cyclic forward NTT, four-step output layout.

        Output position k1*128 + k2 (within each poly) holds X[k2*n1 + k1];
        use ``fourstep_to_natural`` for reference order.
        """
        gx, bsz = self._group_batch(x)
        out = self._call(
            self._nwc_fwd_kernel,
            (gx,),
            (*self.w1_enter, *self.w2_exit, *self.mid_shoup),
            interpret=interpret,
        )
        return out.reshape(-1, self.p.n)[:bsz]

    def ntt_inv(self, x, interpret: bool = False):
        """Batched cyclic inverse NTT consuming the four-step layout;
        n^-1 rides the Shoup mid (the reference SCALE phase), the domain
        round-trip rides the two matmuls."""
        gx, bsz = self._group_batch(x)
        out = self._call(
            self._nwc_inv_kernel,
            (gx,),
            (*self.w2i_enter, *self.w1i_exit, *self.mid_inv_fold),
            interpret=interpret,
        )
        return out.reshape(-1, self.p.n)[:bsz]

    # ------------------------------------------------------------------
    # Layout helpers
    # ------------------------------------------------------------------

    def fourstep_to_natural_perm(self) -> np.ndarray:
        """perm such that natural_spectrum = fourstep_flat[perm]."""
        n1 = self.n1
        return np.arange(self.p.n).reshape(n1, LANES).T.reshape(-1)

    def fourstep_to_natural(self, x):
        perm = jnp.asarray(self.fourstep_to_natural_perm())
        return jnp.take(x, perm, axis=-1)

    def natural_to_fourstep(self, x):
        perm = jnp.asarray(
            np.argsort(self.fourstep_to_natural_perm()).astype(np.int32)
        )
        return jnp.take(x, perm, axis=-1)
