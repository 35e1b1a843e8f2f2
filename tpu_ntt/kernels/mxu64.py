"""Fused 60-bit negacyclic poly-mult Pallas kernel (int8 MXU, double-word).

Extends the design of mxu.py to moduli q < 2^62 — the reference's WIDTH=60
configuration (rtl/ntt_poly_mult.sv:18-24), whose C++ baseline needs
unsigned __int128 (software_benchmark/benchmark_ntt_60bit.cpp:20-24).  On the
TPU there is no wide integer at all, so:

* Ring elements are (hi, lo) uint32 pairs (modmath.Ring64 layout).
* The four-step matmuls decompose both operands into EIGHT **balanced
  signed** 8-bit digits: v = sum_j l_j * 2^(8j) with l_j in [-128, 127],
  computed by a borrow-propagating digit scan.  For q < 2^62 the top byte
  of every operand is < 64, so the scan never overflows the top digit and
  the decomposition is EXACT — the int8 MXU pipeline (2x the bf16 rate,
  int32 accumulation, zero float casts) then produces the TRUE limb
  products directly, with **no zero-point correction at all**: no line
  sums, no data-dependent accumulator, no per-row BASE tables.  (Round 1
  used an offset-by-128 scheme whose value-level correction cost ~100 VPU
  ops/element/step plus 1.25 MB of per-matrix BASE words in VMEM; the
  balanced form deletes all of it.  The 24-bit kernel cannot use this
  trick: a 24-bit operand can have top byte >= 128, which the 3-digit
  balanced form cannot represent — mxu.py keeps the zero-point scheme.)
  The only residual bookkeeping is the per-diagonal +2^25 offset that
  keeps each assembled word unsigned, whose total is a data-INdependent
  constant folded into the accumulator's initial words (mod 2^160,
  two's complement, so wrapping uint32 arithmetic reproduces S exactly).
* S < 128*q^2 < 2^131 reduces by three chained 32-bit Montgomery steps
  (REDC by 2^32 each), i.e. S * 2^-96 mod q (< 2^35 + q < 2q); transform
  matrices carry the matching w * 2^96 scale, making each matmul step
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

from ..modmath import (add64, add_mod64, mont_mul64, mul32, shoup_mul64,
                       shoup_mul64_lazy, sub_mod64)
from ..params import NttParams

U32 = jnp.uint32
I32 = jnp.int32
LANES = 128
NLIMBS = 8  # 8-bit balanced digits covering q < 2^62 operands
NWORDS = 5  # 32-bit accumulator words covering S < 2^160
NDIAGS = 2 * NLIMBS - 1


def _pow_table(base: int, q: int, count: int) -> list[int]:
    out, cur = [], 1
    for _ in range(count):
        out.append(cur)
        cur = cur * base % q
    return out


def _words160(v: int) -> list[int]:
    """Integer -> NWORDS uint32 words, two's complement mod 2^160."""
    v %= 1 << (32 * NWORDS)
    return [(v >> (32 * i)) & 0xFFFFFFFF for i in range(NWORDS)]


def _balanced_digits(v: int, nlimbs: int = NLIMBS) -> list[int]:
    """v -> ``nlimbs`` signed digits in [-128, 127], exact for any v whose
    borrow scan terminates within ``nlimbs`` digits (all v < 2^62 for 8
    digits; all v < 2^64 for 9, where the 9th digit is the final borrow).

    Borrow scan from the LSB; the final carry must be absorbed
    (asserted)."""
    out, c = [], 0
    for j in range(nlimbs):
        t = ((v >> (8 * j)) & 0xFF) + c
        if t >= 128:
            out.append(t - 256)
            c = 1
        else:
            out.append(t)
            c = 0
    assert c == 0, f"value {v} too wide for {nlimbs} balanced digits"
    return out


class MxuPlan64:
    """Host-side constants for the double-word int8-MXU kernels.

    Requires q < 2^62 and n in [256, 65536] with 128 | n.  (For q < 2^24
    the single-word MxuPlan is faster.)  For n > 16384 the length-n1
    column transform spans multiple 128-row MXU tiles (n1 = n/128 > 128):
    the left DFT matrix is dense (n1, n1) and each kernel group holds ONE
    polynomial as an (n1, 128) block — the reference scales N purely by
    parameterization (SURVEY.md §5), and so does this kernel.
    """

    #: dispatch name and data layout ((hi, lo) uint32 pairs)
    name = "pallas-mxu64"
    pairs = True
    #: balanced 8-bit digits per operand; subclasses widen (9 covers any
    #: v < 2^64, the Goldilocks operand range)
    nlimbs = NLIMBS
    #: signed 16-bit carry-save accumulator lanes (>= max diagonal byte
    #: offset / 2 + headroom; the reducer may read more, zero-padded)
    cs_lanes = 2 * NWORDS

    def _check_width(self, p: NttParams) -> None:
        if p.width > 62:
            raise ValueError("q must be < 2^62")

    def _domain_scales(self, q: int) -> tuple[int, int, int, int]:
        """(r32, r64, r96, r160): the Montgomery powers carried by the
        transform matrices so each REDC96-reduced matmul is domain-neutral.
        Subclasses whose reducer divides by nothing (the Goldilocks
        phi-fold) return all ones, making every table plain."""
        return (pow(2, 32, q), pow(2, 64, q), pow(2, 96, q),
                pow(2, 160, q))

    def _lazy_window(self, q: int) -> bool:
        """Whether intermediates may stay unnormalized (see ``lazy``)."""
        return q < (1 << 61) - (1 << 40)

    #: table attributes whose construction is deferred at split-only
    #: sizes (n1 >= 2048): the dense kernels cannot compile there, so
    #: production (nwc via the split kernels) never pays their ~2 min of
    #: host big-int builds; the interpret-mode ablation tests build them
    #: on first touch.
    _DENSE_LAZY = frozenset({
        "w1", "w1i", "w1_nwc", "w1i_nwc", "w1i_nwc_plain", "w1i_exit",
        "mid_nwc", "mid_inv_nwc", "mid_shoup", "mid_inv_fold",
    })

    def __getattr__(self, name):
        if name in self._DENSE_LAZY and "_dense_build" in self.__dict__:
            self.__dict__.pop("_dense_build")()  # builds once, sets attrs
            return getattr(self, name)
        raise AttributeError(
            f"{type(self).__name__!s} object has no attribute {name!r}")

    def __init__(self, p: NttParams):
        self._check_width(p)
        n_cap = (32 if p.q < (1 << 62) else 4) * LANES * LANES
        if p.n % LANES or not (2 * LANES <= p.n <= n_cap):
            # n >= 131072 needs the depth-3/4/5 split left transforms,
            # which need the constant Shoup multiply (q < 2^62); the
            # dense left matrices at n1 >= 512 blow scoped VMEM on
            # hardware.
            raise ValueError(
                f"n={p.n} must be in [256, {n_cap}] and divide 128")
        self.p = p
        q = p.q
        self.q = q
        self.ndiags = 2 * self.nlimbs - 1
        self.q_lo = q & 0xFFFFFFFF
        self.q_hi = q >> 32
        # -q^-1 mod 2^32 (low word of the R=2^64 constant works: an inverse
        # mod 2^64 is an inverse mod 2^32)
        self.q_prime64 = p.mont_q_prime if p.mont_bits == 64 else (
            (-pow(q, -1, 1 << 64)) % (1 << 64)
        )
        self.q_prime32 = self.q_prime64 & 0xFFFFFFFF
        self.n1 = p.n // LANES
        self.n2 = LANES
        #: rows per kernel group; one group = t polynomials (n1 <= 128) or
        #: exactly one polynomial as an (n1, 128) block (n1 > 128).
        self.rows = max(self.n1, LANES)
        self.t = LANES // self.n1 if self.n1 <= LANES else 1
        # Per-diagonal offset making every assembled diagonal unsigned:
        # |diag| <= NLIMBS * rows * 128^2 (balanced digits in [-128, 127],
        # contraction up to NLIMBS*rows terms for the left matmul).  The
        # power of two >= that bound; its diag-weighted total is folded
        # (negated, two's complement mod 2^160) into the accumulator's
        # constant initial words — the only correction the balanced-digit
        # matmul needs, and it is data-independent.
        bound = self.nlimbs * self.rows * 128 * 128
        self.diag_off = 1 << (bound - 1).bit_length()
        off_total = sum(self.diag_off << (8 * k) for k in range(self.ndiags))
        self._const_words = _words160(-off_total)
        #: Lazy-reduction window: intermediate values may stay in [0, 2q)
        #: (the balanced-digit matmul only needs operands < 2^62 for digit
        #: exactness, and every reducer here tolerates < 2q inputs:
        #: REDC96 -> < S/2^96 + q < 2q, Shoup -> < 2q for any a < 2^64,
        #: mont_mul64 -> < q for a, b < 2q when q < 2^61).  Only the final
        #: reducer of each kernel fully normalizes to [0, q).  The margin
        #: keeps 2q + S/2^96 clear of 2^62.
        self.lazy = self._lazy_window(q)
        r32, r64, r96, r160 = self._domain_scales(q)

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
            if n1 >= LANES:  # dense multi-tile left matrix, one poly/group
                return m
            out = np.zeros((LANES, LANES), dtype=object)
            for b in range(t):
                out[b * n1 : (b + 1) * n1, b * n1 : (b + 1) * n1] = m
            return out

        def make_w(m: np.ndarray, left: bool):
            """Stacked balanced-signed int8 digit matrix for one W.

            Digits are laid out in DESCENDING order along the contraction
            axis (left: columns of a (128, 1024) matrix; right: rows of a
            (1024, 128) one) so that every digit diagonal k of the product
            is ONE matmul against a contiguous slice of the ascending
            x-digit stack: as i runs up through the diagonal, j = k - i
            runs down, matching block position 7 - j running up."""
            digit_arrays = [np.empty(m.shape, dtype=np.int8)
                            for _ in range(self.nlimbs)]
            for idx, v in np.ndenumerate(m):
                for i, d in enumerate(_balanced_digits(int(v),
                                                       self.nlimbs)):
                    digit_arrays[i][idx] = d
            limbs = np.concatenate(
                digit_arrays[::-1], axis=1 if left else 0
            )
            return jnp.asarray(limbs)

        self.w2 = make_w(dft_matrix(n2, w2, r160), left=False)
        self.w2i = make_w(dft_matrix(n2, w2i, r96), left=False)
        # plain-domain right matrix for the standalone forward transform
        # (REDC96 of w*2^96 times a plain value stays plain)
        self.w2_plain = make_w(dft_matrix(n2, w2, r96), left=False)

        # NWC-specialized matrices with the psi-twist folded in.  The twist
        # factor splits as psi^(128*n1) * psi^(n2): the n1 part scales W1's
        # columns (it rides the contracted index), the n2 part commutes with
        # the row contraction and folds into the mid table.  Symmetrically
        # the untwist psi^(-128*n1) scales the inverse W1's rows, and its
        # final scale 2^64 (instead of 2^128) makes that last matmul exit
        # the Montgomery-64 domain for free.  Net effect: the fused NWC
        # kernel performs ZERO twist/untwist elementwise passes.
        def col_scaled(m, col_fn):
            out = m.copy()
            for c in range(m.shape[1]):
                out[:, c] = out[:, c] * col_fn(c) % q
            return out

        def row_scaled(m, row_fn):
            out = m.copy()
            for rr in range(m.shape[0]):
                out[rr, :] = out[rr, :] * row_fn(rr) % q
            return out

        psi128 = pow(p.psi, n2, q)  # psi^128
        psi128_inv = pow(psi128, q - 2, q)

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
        # NWC-folded mid tables (psi^(n2) split of the twist; see w1_nwc).
        # Shoup-encoded: (w, floor(w*2^64/q)) with PLAIN twiddles — the
        # Shoup product x*t mod q preserves whatever domain x is in and
        # needs only one widening multiply (vs three for Montgomery).
        def shoup_pair(fn):
            w = tiled_pair(fn)
            ws = tiled_pair(lambda i1, i2: (fn(i1, i2) << 64) // q)
            return (*w, *ws)

        def build_dense():
            """Dense left matrices + dense mid tables — everything the
            NON-split code paths need.  Eager at every size the dense
            kernels can actually compile (n1 <= 1024); DEFERRED at the
            split-only production sizes (n1 >= 2048, where the dense left
            is 16x+ over the hardware VMEM budget and only the interpret
            -mode ablation tests ever touch these ~2 min of host big-int
            table builds)."""
            self.w1 = make_w(block_diag(dft_matrix(n1, w1, r96)),
                             left=True)
            self.w1i = make_w(block_diag(dft_matrix(n1, w1i, r96)),
                              left=True)
            self.w1_nwc = make_w(
                block_diag(col_scaled(dft_matrix(n1, w1, r96),
                                      lambda c: pow(psi128, c, q))),
                left=True,
            )
            self.w1i_nwc = make_w(
                block_diag(row_scaled(dft_matrix(n1, w1i, r32),
                                      lambda rr: pow(psi128_inv, rr, q))),
                left=True,
            )
            # Domain-neutral (r96) variant of the untwist-folded inverse
            # left matrix: the STANDALONE NWC inverse consumes
            # nwc_ntt_fwd's PLAIN spectrum, so its exit matmul must not
            # strip a Montgomery factor (w1i_nwc's r32 scale exists to
            # exit the fused pipeline's Montgomery-64 domain).
            self.w1i_nwc_plain = make_w(
                block_diag(row_scaled(dft_matrix(n1, w1i, r96),
                                      lambda rr: pow(psi128_inv, rr, q))),
                left=True,
            )
            self.mid_nwc = shoup_pair(
                lambda k1, m2: pow(omega, k1 * m2, q) * pow(psi, m2, q)
                % q
            )
            self.mid_inv_nwc = shoup_pair(
                lambda k1, m2: pow(omega_inv, k1 * m2, q)
                * pow(psi_inv, m2, q) % q * p.n_inv % q
            )
            # Cyclic / standalone mids, Shoup-encoded (a Shoup product is
            # a PLAIN constant multiply, so it preserves the value's
            # domain and needs one widening multiply vs Montgomery's
            # three).  n^-1 folds into the inverse mid (the reference's
            # SCALE phase, rtl/ntt_inverse.v semantics, costs zero extra
            # passes here), so the standalone-inverse and cyclic exits
            # drop their whole elementwise exit multiply.
            self.mid_shoup = shoup_pair(
                lambda k1, m2: pow(omega, k1 * m2, q))
            self.mid_inv_fold = shoup_pair(
                lambda k1, m2: pow(omega_inv, k1 * m2, q) * p.n_inv % q
            )
            # cyclic exit: the inverse left matrix at 2^32 scale strips
            # the Montgomery-64 factor in its REDC96 (2^32/2^96 = 2^-64)
            # — the domain exit rides the matmul for free.
            self.w1i_exit = make_w(block_diag(dft_matrix(n1, w1i, r32)),
                                   left=True)

        if n1 >= 16 * LANES:
            self._dense_build = build_dense  # lazy: see __getattr__
        else:
            build_dense()

        # --- Split-radix left transform (n1 = 256 only; DESIGN.md §2.5c) -
        # At n = 32768 the dense (256, 256) left DFT is 2/3 of the fused
        # product's MXU work (bench/roofline.py).  DFT_256 factorizes as
        # DIF: X1[2m]   = DFT_128[w1^2]( x_top + P·x_bot )[m]
        #      X1[2m+1] = DFT_128[w1^2]( w1^j2 ∘ (x_top - P·x_bot) )[m]
        # with P = psi128^128 riding the psi fold, the per-row w1^j2 (and
        # the psi column scales) folded into the two 128-DFT matrices'
        # columns, so the split costs ONE constant Shoup pass + one mod
        # add/sub per transform and HALVES the left matmul's MACs (two
        # 128-contraction tiles instead of one 256-contraction).  The
        # inverse mirrors it (matrices row-scaled, butterfly after).  The
        # interleaved output row order pi(r) = 2r / 2(r-128)+1 is absorbed
        # by permuting the host-built mid tables and feeding the
        # equally-split inverse — no data movement anywhere.  Toggle:
        # ``split_left`` (measured A/B; requires q < 2^62 for the
        # constant Shoup multiply, so the Goldilocks subclass is out).
        if n1 == 2 * LANES and (q < (1 << 62) or self.const_mul_special):
            w1sq = pow(w1, 2, q)    # primitive 128th root
            w1isq = pow(w1i, 2, q)

            def scaled_dft128(root, colbase, rowbase, scale):
                pows = _pow_table(root, q, LANES)
                m = np.empty((LANES, LANES), dtype=object)
                for i in range(LANES):
                    rs = pow(rowbase, i, q)
                    for j in range(LANES):
                        m[i, j] = (pows[(i * j) % LANES] * pow(colbase, j, q)
                                   % q * rs % q * scale % q)
                return m

            self.w1s_e_nwc = make_w(
                scaled_dft128(w1sq, psi128, 1, r96), left=True)
            self.w1s_o_nwc = make_w(
                scaled_dft128(w1sq, w1 * psi128 % q, 1, r96), left=True)
            self.w1is_a_nwc = make_w(
                scaled_dft128(w1isq, 1, psi128_inv, r32), left=True)
            self.w1is_b_nwc = make_w(
                scaled_dft128(w1isq, 1, psi128_inv * w1i % q, r32),
                left=True)
            P = pow(psi128, LANES, q)
            Pi = pow(psi128_inv, LANES, q)
            self._split_P = (P, (P << 64) // q)
            self._split_Pi = (Pi, (Pi << 64) // q)
            pi_perm = lambda r: 2 * r if r < LANES else 2 * (r - LANES) + 1
            self.mid_nwc_split = shoup_pair(
                lambda k1, m2: pow(omega, pi_perm(k1) * m2, q)
                * pow(psi, m2, q) % q
            )
            self.mid_inv_nwc_split = shoup_pair(
                lambda k1, m2: pow(omega_inv, pi_perm(k1) * m2, q)
                * pow(psi_inv, m2, q) % q * p.n_inv % q
            )

        # --- Depth-2 split radix (n1 = 512; n = 65536) -------------------
        # The same DIF recursion applied twice.  Key invariant that makes
        # it fold flat: each branch's column scale stays GEOMETRIC
        # (sigma_j = c^j), so every level's butterfly constant
        # P = sigma_{j+h}/sigma_j = c^h is a single compile-time Shoup
        # scalar, and the per-row root factors (W^e)^j commute out of the
        # butterflies into the four leaf 128-DFT matrices' columns:
        #   level 1 (h=256): u = top + P1*bot, v = top - P1*bot,
        #     branches (W^2, c) and (W^2, W*c), c = psi128, W = w1;
        #   level 2 (h=128): constants c^128 resp. (W*c)^128; leaves
        #     root W^4 (primitive 128th), colbases c, W^2*c, W*c, W^3*c.
        # Leaf row r holds X1[pi2(r)], pi2(r) = 4*(r%128) + 2*((r>>7)&1)
        # + (r>>8); the mids are pi2-permuted, the inverse mirrors with
        # row-scaled leaves and butterflies AFTER (merge constants
        # ci^128, (ci*w1i)^128, ci^256, ci = psi128_inv).  This is what
        # makes the FLAT kernel exist at n = 65536 at all: the dense
        # (512, 512) left matrices blow the 16 MB scoped-VMEM budget
        # (kernels/__init__.py note), while four 128x128 leaves per
        # direction fit — and cut left-DFT MACs/coef from 512 to 128.
        if n1 == 4 * LANES and q < (1 << 62):
            w1_4 = pow(w1, 4, q)     # primitive 128th root
            w1i_4 = pow(w1i, 4, q)

            def scaled_dft128_2(root, colbase, rowbase, scale):
                pows = _pow_table(root, q, LANES)
                m = np.empty((LANES, LANES), dtype=object)
                for i in range(LANES):
                    rs = pow(rowbase, i, q)
                    for j in range(LANES):
                        m[i, j] = (pows[(i * j) % LANES] * pow(colbase, j, q)
                                   % q * rs % q * scale % q)
                return m

            # forward leaves, output order [EE, EO, OE, OO]
            self.w1s2_nwc = tuple(
                make_w(scaled_dft128_2(w1_4, pow(w1, e, q) * psi128 % q,
                                       1, r96), left=True)
                for e in (0, 2, 1, 3)
            )
            # inverse leaves, consuming the pi2-ordered spectrum
            self.w1is2_nwc = tuple(
                make_w(scaled_dft128_2(w1i_4, 1,
                                       psi128_inv * pow(w1i, e, q) % q,
                                       r32), left=True)
                for e in (0, 2, 1, 3)
            )
            enc_c = lambda v: (v, (v << 64) // q)
            self._split2_P1 = enc_c(pow(psi128, 2 * LANES, q))
            self._split2_P2e = enc_c(pow(psi128, LANES, q))
            self._split2_P2o = enc_c(pow(w1 * psi128 % q, LANES, q))
            self._split2_Pi1 = enc_c(pow(psi128_inv, 2 * LANES, q))
            self._split2_Pi2e = enc_c(pow(psi128_inv, LANES, q))
            self._split2_Pi2o = enc_c(pow(psi128_inv * w1i % q, LANES, q))
            pi2 = lambda r: (4 * (r % LANES) + 2 * ((r >> 7) & 1)
                             + ((r >> 8) & 1))
            self.mid_nwc_split2 = shoup_pair(
                lambda k1, m2: pow(omega, pi2(k1) * m2, q)
                * pow(psi, m2, q) % q
            )
            self.mid_inv_nwc_split2 = shoup_pair(
                lambda k1, m2: pow(omega_inv, pi2(k1) * m2, q)
                * pow(psi_inv, m2, q) % q * p.n_inv % q
            )

        # --- Depth-3 split radix (n1 = 1024; n = 131072) -----------------
        # Third application of the same recursion; branch order is
        # [E*, O*] at every level, so leaf block br (bits e1 e2 e3,
        # level-major) holds outputs X1[8m + 4*e3 + 2*e2 + e1] and its
        # leaf colbase is w1^(e1 + 2*e2 + 4*e3) * psi128.  Existence, not
        # optimization: this is the first FLAT fused kernel at n = 2^17
        # (dense left is 4x over the VMEM budget; the four-step
        # composition pays every matmul/VPU pass twice per coefficient).
        if n1 == 8 * LANES and q < (1 << 62):
            w1_8 = pow(w1, 8, q)     # primitive 128th root
            w1i_8 = pow(w1i, 8, q)

            def scaled_dft128_3(root, colbase, rowbase, scale):
                pows = _pow_table(root, q, LANES)
                m = np.empty((LANES, LANES), dtype=object)
                for i in range(LANES):
                    rs = pow(rowbase, i, q)
                    for j in range(LANES):
                        m[i, j] = (pows[(i * j) % LANES] * pow(colbase, j, q)
                                   % q * rs % q * scale % q)
                return m

            _LEAF_EXP = (0, 4, 2, 6, 1, 5, 3, 7)  # e1 + 2*e2 + 4*e3 by br
            self.w1s3_nwc = tuple(
                make_w(scaled_dft128_3(w1_8, pow(w1, e, q) * psi128 % q,
                                       1, r96), left=True)
                for e in _LEAF_EXP
            )
            self.w1is3_nwc = tuple(
                make_w(scaled_dft128_3(w1i_8, 1,
                                       psi128_inv * pow(w1i, e, q) % q,
                                       r32), left=True)
                for e in _LEAF_EXP
            )
            enc_c3 = lambda v: (v, (v << 64) // q)
            self._split3_P1 = enc_c3(pow(psi128, 4 * LANES, q))
            self._split3_P2e = enc_c3(pow(psi128, 2 * LANES, q))
            self._split3_P2o = enc_c3(pow(w1 * psi128 % q, 2 * LANES, q))
            # level-3 constants by branch (e1, e2): (w1^(e1+2e2)*psi128)^128
            self._split3_P3 = tuple(
                enc_c3(pow(pow(w1, e, q) * psi128 % q, LANES, q))
                for e in (0, 2, 1, 3)
            )
            self._split3_Pi1 = enc_c3(pow(psi128_inv, 4 * LANES, q))
            self._split3_Pi2 = tuple(
                enc_c3(pow(psi128_inv * pow(w1i, e, q) % q, 2 * LANES, q))
                for e in (0, 1)
            )
            self._split3_Pi3 = tuple(
                enc_c3(pow(psi128_inv * pow(w1i, e, q) % q, LANES, q))
                for e in (0, 2, 1, 3)
            )
            pi3 = lambda r: (8 * (r % LANES) + 4 * ((r >> 7) & 1)
                             + 2 * ((r >> 8) & 1) + ((r >> 9) & 1))
            self.mid_nwc_split3 = shoup_pair(
                lambda k1, m2: pow(omega, pi3(k1) * m2, q)
                * pow(psi, m2, q) % q
            )
            self.mid_inv_nwc_split3 = shoup_pair(
                lambda k1, m2: pow(omega_inv, pi3(k1) * m2, q)
                * pow(psi_inv, m2, q) % q * p.n_inv % q
            )

        # --- Depth-4 split radix (n1 = 2048; n = 262144) -----------------
        # Fourth application of the recursion (same invariants as depth
        # 2/3: geometric column scales make every butterfly constant a
        # compile-time Shoup scalar, per-row root factors commute into the
        # leaf columns).  Leaf block br (bits e1 e2 e3 e4, level-major)
        # holds outputs X1[16m + 8*e4 + 4*e3 + 2*e2 + e1] and its colbase
        # is w1^bitrev4(br) * psi128.  Existence at n = 2^18: the dense
        # left is 16x over the VMEM budget, and the four-step composition
        # pays every matmul/VPU pass twice per coefficient — while the
        # split-radix left keeps leaf contractions at 128 MACs/coef, the
        # same as depth 2/3 (per-coefficient MXU cost is FLAT in n).
        if n1 == 16 * LANES and q < (1 << 62):
            w1_16 = pow(w1, 16, q)     # primitive 128th root
            w1i_16 = pow(w1i, 16, q)

            def scaled_dft128_4(root, colbase, rowbase, scale):
                pows = _pow_table(root, q, LANES)
                m = np.empty((LANES, LANES), dtype=object)
                for i in range(LANES):
                    rs = pow(rowbase, i, q)
                    for j in range(LANES):
                        m[i, j] = (pows[(i * j) % LANES] * pow(colbase, j, q)
                                   % q * rs % q * scale % q)
                return m

            #: e1 + 2*e2 + 4*e3 + 8*e4 by level-major branch index = the
            #: 4-bit bit-reversal of br (depth-3's _LEAF_EXP is bitrev3)
            _LEAF_EXP4 = tuple(
                int(f"{br:04b}"[::-1], 2) for br in range(16)
            )
            self.w1s4_nwc = tuple(
                make_w(scaled_dft128_4(w1_16, pow(w1, e, q) * psi128 % q,
                                       1, r96), left=True)
                for e in _LEAF_EXP4
            )
            self.w1is4_nwc = tuple(
                make_w(scaled_dft128_4(w1i_16, 1,
                                       psi128_inv * pow(w1i, e, q) % q,
                                       r32), left=True)
                for e in _LEAF_EXP4
            )
            enc_c4 = lambda v: (v, (v << 64) // q)
            self._split4_P1 = enc_c4(pow(psi128, 8 * LANES, q))
            self._split4_P2e = enc_c4(pow(psi128, 4 * LANES, q))
            self._split4_P2o = enc_c4(pow(w1 * psi128 % q, 4 * LANES, q))
            # level-3 constants by branch (e1, e2), visit order e1-major
            self._split4_P3 = tuple(
                enc_c4(pow(pow(w1, e, q) * psi128 % q, 2 * LANES, q))
                for e in (0, 2, 1, 3)
            )
            # level-4 constants by branch (e1, e2, e3): exps = bitrev3
            self._split4_P4 = tuple(
                enc_c4(pow(pow(w1, e, q) * psi128 % q, LANES, q))
                for e in (0, 4, 2, 6, 1, 5, 3, 7)
            )
            self._split4_Pi1 = enc_c4(pow(psi128_inv, 8 * LANES, q))
            self._split4_Pi2 = tuple(
                enc_c4(pow(psi128_inv * pow(w1i, e, q) % q, 4 * LANES, q))
                for e in (0, 1)
            )
            self._split4_Pi3 = tuple(
                enc_c4(pow(psi128_inv * pow(w1i, e, q) % q, 2 * LANES, q))
                for e in (0, 2, 1, 3)
            )
            self._split4_Pi4 = tuple(
                enc_c4(pow(psi128_inv * pow(w1i, e, q) % q, LANES, q))
                for e in (0, 4, 2, 6, 1, 5, 3, 7)
            )
            pi4 = lambda r: (16 * (r % LANES) + 8 * ((r >> 7) & 1)
                             + 4 * ((r >> 8) & 1) + 2 * ((r >> 9) & 1)
                             + ((r >> 10) & 1))
            self.mid_nwc_split4 = shoup_pair(
                lambda k1, m2: pow(omega, pi4(k1) * m2, q)
                * pow(psi, m2, q) % q
            )
            self.mid_inv_nwc_split4 = shoup_pair(
                lambda k1, m2: pow(omega_inv, pi4(k1) * m2, q)
                * pow(psi_inv, m2, q) % q * p.n_inv % q
            )

        # --- Depth-5 split radix (n1 = 4096; n = 2^19) -------------------
        # Fifth application; same invariants.  Thirty-two leaves, branch
        # constants by level exactly as depth 4 with one more halving.
        if n1 == 32 * LANES and q < (1 << 62):
            w1_32 = pow(w1, 32, q)     # primitive 128th root
            w1i_32 = pow(w1i, 32, q)

            def scaled_dft128_5(root, colbase, rowbase, scale):
                pows = _pow_table(root, q, LANES)
                m = np.empty((LANES, LANES), dtype=object)
                for i in range(LANES):
                    rs = pow(rowbase, i, q)
                    for j in range(LANES):
                        m[i, j] = (pows[(i * j) % LANES] * pow(colbase, j, q)
                                   % q * rs % q * scale % q)
                return m

            def _brev(v, bits):
                return int(f"{v:0{bits}b}"[::-1], 2)

            _LEAF_EXP5 = tuple(_brev(br, 5) for br in range(32))
            self.w1s5_nwc = tuple(
                make_w(scaled_dft128_5(w1_32, pow(w1, e, q) * psi128 % q,
                                       1, r96), left=True)
                for e in _LEAF_EXP5
            )
            self.w1is5_nwc = tuple(
                make_w(scaled_dft128_5(w1i_32, 1,
                                       psi128_inv * pow(w1i, e, q) % q,
                                       r32), left=True)
                for e in _LEAF_EXP5
            )
            enc_c5 = lambda v: (v, (v << 64) // q)
            self._split5_P1 = enc_c5(pow(psi128, 16 * LANES, q))
            self._split5_P2e = enc_c5(pow(psi128, 8 * LANES, q))
            self._split5_P2o = enc_c5(pow(w1 * psi128 % q, 8 * LANES, q))
            self._split5_P3 = tuple(
                enc_c5(pow(pow(w1, e, q) * psi128 % q, 4 * LANES, q))
                for e in (0, 2, 1, 3)
            )
            self._split5_P4 = tuple(
                enc_c5(pow(pow(w1, e, q) * psi128 % q, 2 * LANES, q))
                for e in (_brev(b, 3) for b in range(8))
            )
            self._split5_P5 = tuple(
                enc_c5(pow(pow(w1, e, q) * psi128 % q, LANES, q))
                for e in (_brev(b, 4) for b in range(16))
            )
            self._split5_Pi1 = enc_c5(pow(psi128_inv, 16 * LANES, q))
            self._split5_Pi2 = tuple(
                enc_c5(pow(psi128_inv * pow(w1i, e, q) % q, 8 * LANES, q))
                for e in (0, 1)
            )
            self._split5_Pi3 = tuple(
                enc_c5(pow(psi128_inv * pow(w1i, e, q) % q, 4 * LANES, q))
                for e in (0, 2, 1, 3)
            )
            self._split5_Pi4 = tuple(
                enc_c5(pow(psi128_inv * pow(w1i, e, q) % q, 2 * LANES, q))
                for e in (_brev(b, 3) for b in range(8))
            )
            self._split5_Pi5 = tuple(
                enc_c5(pow(psi128_inv * pow(w1i, e, q) % q, LANES, q))
                for e in (_brev(b, 4) for b in range(16))
            )
            pi5 = lambda r: (32 * (r % LANES) + 16 * ((r >> 7) & 1)
                             + 8 * ((r >> 8) & 1) + 4 * ((r >> 9) & 1)
                             + 2 * ((r >> 10) & 1) + ((r >> 11) & 1))
            self.mid_nwc_split5 = shoup_pair(
                lambda k1, m2: pow(omega, pi5(k1) * m2, q)
                * pow(psi, m2, q) % q
            )
            self.mid_inv_nwc_split5 = shoup_pair(
                lambda k1, m2: pow(omega_inv, pi5(k1) * m2, q)
                * pow(psi_inv, m2, q) % q * p.n_inv % q
            )

    # ------------------------------------------------------------------
    # In-kernel primitives ((hi, lo) pairs of (128, 128) uint32)
    # ------------------------------------------------------------------

    def _to_limbs_i8(self, hi, lo):
        """Balanced-signed digit scan of the (hi, lo) pair: 8 int8 digits
        in [-128, 127] whose weighted sum is EXACTLY the operand (top byte
        < 64 for operands < 2^62, so the final borrow is always absorbed).

        The borrow recurrence c[j+1] = (b[j] + c[j] >= 128) is an adder
        carry chain: with ``prefix_scan`` it is evaluated as a Sklansky
        parallel prefix (generate g = (b >= 128), propagate p = (b >= 127),
        depth 4 instead of 8) — more ops, shallower chain; otherwise the
        serial borrow ripple.  Both are bit-identical; the default is the
        hardware-measured winner (DESIGN.md §2.5).  Bit-twiddled booleans
        only: `jnp.where`-based digit selects hang Mosaic (CLAUDE.md)."""
        b = [((lo if j < 4 else hi) >> (8 * (j % 4))) & 0xFF if j < 8
             else jnp.zeros_like(lo)
             for j in range(self.nlimbs)]
        if self.prefix_scan and self.nlimbs == 8:
            g = [x >> 7 for x in b]        # b[j] >= 128
            p = [(x + 1) >> 7 for x in b]  # b[j] >= 127 (gen|prop)
            c2 = g[1] | (p[1] & g[0])
            g23 = g[3] | (p[3] & g[2])
            p23 = p[3] & p[2]
            g45 = g[5] | (p[5] & g[4])
            p45 = p[5] & p[4]
            c4 = g23 | (p23 & c2)
            c6 = g45 | (p45 & c4)
            c = [
                None, g[0], c2, g[2] | (p[2] & c2),
                c4, g[4] | (p[4] & c4), c6, g[6] | (p[6] & c6),
            ]
        else:
            c = [None]
            cc = None
            for j in range(self.nlimbs - 1):
                t = b[j] if cc is None else b[j] + cc
                cc = (t + 128) >> 8  # borrow out of the biased digit
                c.append(cc)
        out = []
        for j in range(self.nlimbs):
            t = b[j] if c[j] is None else b[j] + c[j]  # in [0, 256]
            biased = t + 128
            out.append(((biased & 0xFF).astype(I32) - 128).astype(jnp.int8))
        return out

    def _redc96(self, words, final: bool = True):
        """S * 2^-96 mod q for S held in NWORDS uint32 words (LSW first).

        Three chained Montgomery-32 steps; each clears the low word and
        shifts down by 32 bits.  S < 2^132 gives a result < S/2^96 + q
        < 2q, so 2^96 (not 2^128) is the cheapest sufficient divisor —
        the transform matrices carry the matching 2^96/2^160 scale
        factors.  With ``final=False`` under the lazy window the two
        conditional subtracts are skipped and the < 2q representative is
        returned directly (see ``self.lazy``).
        """
        q_lo = U32(self.q_lo)
        q_hi = U32(self.q_hi)
        qp = U32(self.q_prime32)
        w = list(words)
        for _ in range(3):
            m = w[0] * qp  # mod 2^32
            mq0_hi, mq0_lo = mul32(m, jnp.broadcast_to(q_lo, m.shape).astype(U32))
            mq1_hi, mq1_lo = mul32(m, jnp.broadcast_to(q_hi, m.shape).astype(U32))
            s0 = w[0] + mq0_lo  # == 0 mod 2^32 by construction
            c0 = (s0 < w[0]).astype(U32)
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
            w = [s1c, s2b, s3, s4, jnp.zeros_like(s4)]
        t_hi, t_lo = w[1], w[0]
        if not final and self.lazy:
            return t_hi, t_lo  # < 2q: fed back into the digit scan as-is
        for _ in range(2):  # conditional subtract q (margin: t < 3q)
            ge = (t_hi > q_hi) | ((t_hi == q_hi) & (t_lo >= q_lo))
            new_lo = t_lo - q_lo
            borrow = (t_lo < q_lo).astype(U32)
            new_hi = t_hi - q_hi - borrow
            t_hi = jnp.where(ge, new_hi, t_hi)
            t_lo = jnp.where(ge, new_lo, t_lo)
        return t_hi, t_lo

    #: Accumulate/reduce strategy: ``True`` keeps the 160-bit value in ten
    #: SIGNED 16-bit digits held in i32 lanes (carry-save: no compare-based
    #: carry ripples anywhere until one final propagation), ``False`` uses
    #: the u32-words accumulator with explicit carry tracking.  Both are
    #: bit-identical; carry-save trades ~equal op count for far shallower
    #: dependency chains (the measured limit, DESIGN.md §2.5).
    carry_save = True
    #: Digit-scan borrow chain: Sklansky parallel prefix (True) vs serial
    #: ripple (False).  Bit-identical; measured on hardware (B=2048 nwc):
    #: serial 412-417k/s, Sklansky 384-394k/s — the prefix network's extra
    #: ~19 VPU ops/element cost more than the depth-8 -> depth-4 chain
    #: saves, so the serial ripple is the default (DESIGN.md §2.5).
    prefix_scan = False
    #: Skip the Shoup final conditional subtract under the lazy window.
    shoup_lazy = True
    #: Mosaic grid-dimension hint: ``"parallel"`` tells the compiler the
    #: grid steps (disjoint polynomial groups) are order-independent,
    #: ``"arbitrary"`` forces sequential semantics, ``None`` is Mosaic's
    #: default.  Kept as a measured toggle (DESIGN.md §2.5).
    dimension_semantics: str | None = None

    def _cond_sub2(self, t_hi, t_lo):
        """Two conditional subtracts: [0, 3q) -> [0, q)."""
        q_lo = U32(self.q_lo)
        q_hi = U32(self.q_hi)
        for _ in range(2):
            ge = (t_hi > q_hi) | ((t_hi == q_hi) & (t_lo >= q_lo))
            new_lo = t_lo - q_lo
            borrow = (t_lo < q_lo).astype(U32)
            new_hi = t_hi - q_hi - borrow
            t_hi = jnp.where(ge, new_hi, t_hi)
            t_lo = jnp.where(ge, new_lo, t_lo)
        return t_hi, t_lo

    def _redc96_cs(self, d, final: bool):
        """Digit-domain REDC96: S = Σ d[j]·2^16j (signed i32 digits) ->
        S·2^-96 mod q, carry-save throughout.

        Each Montgomery-32 step needs only S mod 2^32 exactly — a wrapping
        u32 combine of the two low digits — then adds m·q as eight
        independent 16-bit product halves (u32 products < 2^32 are
        wrap-exact; their halves are nonnegative 16-bit values, safe in the
        signed digit lanes), extracts the one exact carry into digit 2
        (the low 32 bits are ≡ 0 mod 2^32 by construction, so the carry is
        floor((d0>>16)+d1, 2^16)), and shifts down two digits.  No
        compare-based carries at all; one 6-digit propagation at the end.
        """
        qp = U32(self.q_prime32)
        qd = [U32((self.q >> (16 * j)) & 0xFFFF) for j in range(4)]
        zero = jnp.zeros_like(d[0])
        for _ in range(3):
            w0 = d[0].astype(U32) + (d[1].astype(U32) << 16)
            m = w0 * qp  # mod 2^32
            for i, mi in enumerate(((m & 0xFFFF), (m >> 16))):
                for j in range(4):
                    prod = mi * qd[j]  # < 2^32: u32 wrap-exact
                    d[i + j] = d[i + j] + (prod & 0xFFFF).astype(I32)
                    d[i + j + 1] = d[i + j + 1] + (prod >> 16).astype(I32)
            c = (d[0] >> 16) + d[1]
            d[2] = d[2] + (c >> 16)
            d = d[2:] + [zero, zero]
        carry = zero
        out = []
        for j in range(6):  # result < 2q < 2^62: digits 4, 5 end zero
            t = d[j] + carry
            out.append((t & 0xFFFF).astype(U32))
            carry = t >> 16
        t_lo = out[0] | (out[1] << 16)
        t_hi = out[2] | (out[3] << 16)
        if not final and self.lazy:
            return t_hi, t_lo
        return self._cond_sub2(t_hi, t_lo)

    #: carry-save reducer hook used by _matmul_mont: REDC96 here; the
    #: Goldilocks subclass swaps in the phi-fold (gl64.py).
    _reduce_cs = _redc96_cs

    def _matmul_mont(self, x, w_desc, left: bool, final: bool = True):
        """REDC96( W @ x ) or REDC96( x @ W ) on the int8 MXU path.

        One matmul per digit diagonal: the ascending x-digit stack is
        sliced against the descending W-digit stack (see make_w), so the
        diagonal sums come out of the MXU directly with zero vector adds.
        Balanced digits make the diagonals the TRUE signed partial sums —
        under ``carry_save`` they drop straight into signed 16-bit digit
        lanes (split at odd byte offsets); otherwise the accumulator
        starts from the constant -(total diagonal offset) and adds the
        offset diagonals into u32 words.
        """
        hi, lo = x
        xl = self._to_limbs_i8(hi, lo)
        xstack = jnp.concatenate(xl, axis=0 if left else 1)
        # contraction unit: the summed length per digit block — the row
        # count for a left (W @ x) product, 128 lanes for a right one.
        unit = hi.shape[-2] if left else hi.shape[-1]
        nl = self.nlimbs
        diags: list = []
        for k in range(self.ndiags):
            i0, i1 = max(0, k - (nl - 1)), min(nl - 1, k)
            p0 = (nl - 1) - (k - i0)
            kk = (i1 - i0 + 1) * unit
            if left:
                prod = jnp.dot(
                    w_desc[:, p0 * unit : p0 * unit + kk],
                    xstack[i0 * unit : i0 * unit + kk, :],
                    preferred_element_type=I32,
                )
            else:
                prod = jnp.dot(
                    xstack[:, i0 * unit : i0 * unit + kk],
                    w_desc[p0 * unit : p0 * unit + kk, :],
                    preferred_element_type=I32,
                )
            diags.append(prod)

        if self.carry_save:
            # signed 16-bit digit lanes; diag k sits at byte offset k:
            # even k lands on digit k/2 whole, odd k splits 8/…-8
            d = [jnp.zeros_like(diags[0]) for _ in range(self.cs_lanes)]
            for k, diag in enumerate(diags):
                if k % 2 == 0:
                    d[k // 2] = d[k // 2] + diag
                else:
                    d[(k - 1) // 2] = d[(k - 1) // 2] + ((diag & 0xFF) << 8)
                    d[(k + 1) // 2] = d[(k + 1) // 2] + (diag >> 8)
            return self._reduce_cs(d, final)

        # offset diagonals into unsigned range (see diag_off derivation)
        diags = [(d + I32(self.diag_off)).astype(U32) for d in diags]

        # start from the constant words that cancel the offsets (mod 2^160)
        words = [
            jnp.full_like(lo, np.uint32(w)) for w in self._const_words
        ]

        # add the assembled diagonals: group word-aligned fours into exact
        # 64-bit pairs, then ripple into the accumulator
        zero = jnp.zeros_like(lo)
        for g in range(4):
            group = diags[4 * g : 4 * g + 4]
            if not group:
                break
            p_lo, p_hi = group[0], zero
            for idx, s in enumerate(group[1:], start=1):
                sh = 8 * idx
                add_lo = s << sh
                nl = p_lo + add_lo
                c = (nl < p_lo).astype(U32)
                p_lo = nl
                p_hi = p_hi + (s >> (32 - sh)) + c  # p_hi < 2^22: exact
            carry = jnp.zeros_like(lo)
            add = [p_lo, p_hi]
            for wi in range(g, NWORDS):
                a = add[wi - g] if wi - g < 2 else zero
                s = words[wi] + a
                c1 = (s < a).astype(U32)
                s2 = s + carry
                c2 = (s2 < s).astype(U32)
                words[wi] = s2
                carry = c1 + c2
        return self._redc96(words, final=final)

    def _shoup(self, x, w, ws):
        """Shoup constant-multiply feeding a balanced-digit matmul scan:
        under the lazy window the [0, 2q) representative is passed through
        directly (the scan only needs < 2^62), skipping the final
        compare+select of the strict form."""
        if self.lazy and self.shoup_lazy:
            return shoup_mul64_lazy(x, w, ws, self.q)
        return shoup_mul64(x, w, ws, self.q)

    def _emul(self, x, table):
        return mont_mul64(x, table, self.q, self.q_prime64)

    # ------------------------------------------------------------------
    # Split-radix left transform (n1 = 256; see __init__ derivation)
    # ------------------------------------------------------------------

    #: replace the dense (256, 256) left DFT with a DIF split — two
    #: 128-contraction matmuls + a constant Shoup + one mod add/sub pair
    #: per transform (halves the left matmul's MXU work, which is 2/3 of
    #: the n = 32768 product's total MXU ops — bench/roofline.py).
    #: Hardware A/B at n = 32768 B=256 (DESIGN.md §2.5c): sol64 44.9k ->
    #: 49.8k op/s (+11%), mxu64 34.6k -> 46.8k (+35%), bit-identical.
    #: At n1 = 512 (n = 65536) the DEPTH-2 split is not an optimization
    #: but an existence proof: the dense (512, 512) left matrices blow
    #: the 16 MB scoped-VMEM budget, the four-leaf split compiles — the
    #: flat kernel's window extends to 65536 through it (q < 2^62).
    #: Default ON; silently inapplicable (dense path) when the split
    #: tables don't exist (n1 not in {256, 512}, or q >= 2^62 where the
    #: constant Shoup multiply is invalid — the Goldilocks subclass).
    #: Currently wired into nwc_poly_mult (the ledger workload); the
    #: other entry points keep the dense left transform.
    split_left = True

    #: subclasses whose ring has a special-form constant multiply (the
    #: Goldilocks phi-fold) may enable the split tables past the q < 2^62
    #: Shoup window by overriding _shoup_const/_bf_add/_bf_sub
    const_mul_special = False

    def _bf_add(self, a, b):
        """Butterfly mod-add (split-radix bodies); generic form assumes
        2q < 2^64."""
        return add_mod64(a, b, self.q)

    def _bf_sub(self, a, b):
        return sub_mod64(a, b, self.q)

    def _shoup_const(self, x, c_pair):
        """Strict Shoup multiply by a COMPILE-TIME scalar (w, w') pair."""
        w_v, ws_v = c_pair
        hi, lo = x
        w = (jnp.full_like(hi, np.uint32(w_v >> 32)),
             jnp.full_like(lo, np.uint32(w_v & 0xFFFFFFFF)))
        ws = (jnp.full_like(hi, np.uint32(ws_v >> 32)),
              jnp.full_like(lo, np.uint32(ws_v & 0xFFFFFFFF)))
        return shoup_mul64(x, w, ws, self.q)

    def _left_fwd_split(self, x, we, wo):
        """[E; O] = split-radix forward left transform of a (256, 128)
        pair block: row r holds X1[pi(r)] (pi = 2r / 2(r-128)+1); the
        psi-twist column folds and the 2^96 domain scale ride the two
        128-DFT matrices exactly as they rode the dense one."""
        hi, lo = x
        h = LANES
        xt = (hi[:h], lo[:h])
        t = self._shoup_const((hi[h:], lo[h:]), self._split_P)
        u = self._bf_add(xt, t)
        v = self._bf_sub(xt, t)
        e = self._matmul_mont(u, we, left=True, final=False)
        o = self._matmul_mont(v, wo, left=True, final=False)
        return (jnp.concatenate([e[0], o[0]], axis=0),
                jnp.concatenate([e[1], o[1]], axis=0))

    def _left_inv_split(self, c, wa, wb):
        """Mirror split for the inverse left transform: consumes the
        pi-ordered spectrum rows ([E; O] halves are contiguous slices),
        butterflies AFTER the two 128-DFTs; the psi^-1 row folds and the
        2^32 exit scale ride the matrices, the constant psi128^-128
        rides one Shoup pass on the bottom half.  Output rows are natural
        coefficient order, [0, q)."""
        hi, lo = c
        h = LANES
        A = self._matmul_mont((hi[:h], lo[:h]), wa, left=True)
        B = self._matmul_mont((hi[h:], lo[h:]), wb, left=True)
        top = self._bf_add(A, B)
        bot = self._shoup_const(self._bf_sub(A, B), self._split_Pi)
        return (jnp.concatenate([top[0], bot[0]], axis=0),
                jnp.concatenate([top[1], bot[1]], axis=0))

    def _left_fwd_split2(self, x, ws):
        """Depth-2 split-radix forward left transform of a (512, 128)
        pair block: two DIF butterfly levels (each one constant-Shoup
        pass + mod add/sub) feeding FOUR 128-contraction leaf matmuls;
        output row r holds X1[pi2(r)].  All slices are contiguous
        halves (the only slice shape Mosaic supports)."""
        hi, lo = x
        h = 2 * LANES
        t1 = self._shoup_const((hi[h:], lo[h:]), self._split2_P1)
        xt = (hi[:h], lo[:h])
        u = add_mod64(xt, t1, self.q)
        v = sub_mod64(xt, t1, self.q)

        def half(y, P2, wa, wb):
            yh, yl = y
            t = self._shoup_const((yh[LANES:], yl[LANES:]), P2)
            yt = (yh[:LANES], yl[:LANES])
            e = self._matmul_mont(add_mod64(yt, t, self.q), wa,
                                  left=True, final=False)
            o = self._matmul_mont(sub_mod64(yt, t, self.q), wb,
                                  left=True, final=False)
            return e, o

        ee, eo = half(u, self._split2_P2e, ws[0], ws[1])
        oe, oo = half(v, self._split2_P2o, ws[2], ws[3])
        return (jnp.concatenate([ee[0], eo[0], oe[0], oo[0]], axis=0),
                jnp.concatenate([ee[1], eo[1], oe[1], oo[1]], axis=0))

    def _left_inv_split2(self, c, ws):
        """Depth-2 mirror for the inverse left transform: four row-scaled
        128-DFT leaves on the pi2-ordered spectrum quarters, then two
        merge levels of butterfly-after (top = A + B, bot = Pi*(A - B));
        output rows are natural coefficient order, [0, q)."""
        hi, lo = c
        h = 2 * LANES
        top_h, bot_h = (hi[:h], lo[:h]), (hi[h:], lo[h:])

        def merge(blk, wa, wb, Pi):
            bh, bl = blk
            A = self._matmul_mont((bh[:LANES], bl[:LANES]), wa, left=True)
            B = self._matmul_mont((bh[LANES:], bl[LANES:]), wb, left=True)
            top = add_mod64(A, B, self.q)
            bot = self._shoup_const(sub_mod64(A, B, self.q), Pi)
            return top, bot

        e_top, e_bot = merge(top_h, ws[0], ws[1], self._split2_Pi2e)
        o_top, o_bot = merge(bot_h, ws[2], ws[3], self._split2_Pi2o)
        E = (jnp.concatenate([e_top[0], e_bot[0]], axis=0),
             jnp.concatenate([e_top[1], e_bot[1]], axis=0))
        O = (jnp.concatenate([o_top[0], o_bot[0]], axis=0),
             jnp.concatenate([o_top[1], o_bot[1]], axis=0))
        top = add_mod64(E, O, self.q)
        bot = self._shoup_const(sub_mod64(E, O, self.q), self._split2_Pi1)
        return (jnp.concatenate([top[0], bot[0]], axis=0),
                jnp.concatenate([top[1], bot[1]], axis=0))

    def _left_fwd_split3(self, x, ws):
        """Depth-3 split-radix forward left transform of a (1024, 128)
        pair block: three DIF butterfly levels feeding EIGHT
        128-contraction leaf matmuls; output row r holds X1[pi3(r)]."""
        hi, lo = x
        h = 4 * LANES
        t1 = self._shoup_const((hi[h:], lo[h:]), self._split3_P1)
        xt = (hi[:h], lo[:h])
        u = add_mod64(xt, t1, self.q)
        v = sub_mod64(xt, t1, self.q)

        def bfly(y, P, h2):
            yh, yl = y
            t = self._shoup_const((yh[h2:], yl[h2:]), P)
            yt = (yh[:h2], yl[:h2])
            return (add_mod64(yt, t, self.q), sub_mod64(yt, t, self.q))

        outs = []
        for blk, P2, P3pair, wq in (
            (u, self._split3_P2e, self._split3_P3[:2], ws[:4]),
            (v, self._split3_P2o, self._split3_P3[2:], ws[4:]),
        ):
            e_blk, o_blk = bfly(blk, P2, 2 * LANES)
            for sub, P3, wpair in ((e_blk, P3pair[0], wq[:2]),
                                   (o_blk, P3pair[1], wq[2:])):
                a_blk, b_blk = bfly(sub, P3, LANES)
                outs.append(self._matmul_mont(a_blk, wpair[0],
                                              left=True, final=False))
                outs.append(self._matmul_mont(b_blk, wpair[1],
                                              left=True, final=False))
        return (jnp.concatenate([o[0] for o in outs], axis=0),
                jnp.concatenate([o[1] for o in outs], axis=0))

    def _left_inv_split3(self, c, ws):
        """Depth-3 mirror for the inverse left transform: eight row-scaled
        128-DFT leaves on the pi3-ordered spectrum eighths, then three
        merge levels; output rows are natural coefficient order."""
        def halves(pair):
            h2 = pair[0].shape[0] // 2
            return ((pair[0][:h2], pair[1][:h2]),
                    (pair[0][h2:], pair[1][h2:]))

        blocks = []
        for quad in halves(c):
            for sub in halves(quad):
                blocks.extend(halves(sub))
        leaf = [self._matmul_mont(b, w, left=True)
                for b, w in zip(blocks, ws)]

        def merge(A, B, Pi):
            top = add_mod64(A, B, self.q)
            bot = self._shoup_const(sub_mod64(A, B, self.q), Pi)
            return (jnp.concatenate([top[0], bot[0]], axis=0),
                    jnp.concatenate([top[1], bot[1]], axis=0))

        m3 = [merge(leaf[2 * i], leaf[2 * i + 1], self._split3_Pi3[i])
              for i in range(4)]
        m2 = [merge(m3[0], m3[1], self._split3_Pi2[0]),
              merge(m3[2], m3[3], self._split3_Pi2[1])]
        return merge(m2[0], m2[1], self._split3_Pi1)

    def _left_fwd_split4(self, x, ws):
        """Depth-4 split-radix forward left transform of a (2048, 128)
        pair block: four DIF butterfly levels feeding SIXTEEN
        128-contraction leaf matmuls; output row r holds X1[pi4(r)]."""
        hi, lo = x
        h = 8 * LANES
        t1 = self._shoup_const((hi[h:], lo[h:]), self._split4_P1)
        xt = (hi[:h], lo[:h])
        u = add_mod64(xt, t1, self.q)
        v = sub_mod64(xt, t1, self.q)

        def bfly(y, P, h2):
            yh, yl = y
            t = self._shoup_const((yh[h2:], yl[h2:]), P)
            yt = (yh[:h2], yl[:h2])
            return (add_mod64(yt, t, self.q), sub_mod64(yt, t, self.q))

        outs = []
        i3 = i4 = wi = 0
        for blk, P2 in ((u, self._split4_P2e), (v, self._split4_P2o)):
            for sub in bfly(blk, P2, 4 * LANES):
                l3 = bfly(sub, self._split4_P3[i3], 2 * LANES)
                i3 += 1
                for sub2 in l3:
                    l4 = bfly(sub2, self._split4_P4[i4], LANES)
                    i4 += 1
                    for leafblk in l4:
                        outs.append(self._matmul_mont(
                            leafblk, ws[wi], left=True, final=False))
                        wi += 1
        return (jnp.concatenate([o[0] for o in outs], axis=0),
                jnp.concatenate([o[1] for o in outs], axis=0))

    def _left_inv_split4(self, c, ws):
        """Depth-4 mirror for the inverse left transform: sixteen
        row-scaled 128-DFT leaves on the pi4-ordered spectrum sixteenths,
        then four merge levels; output rows are natural coefficient
        order."""
        def halves(pair):
            h2 = pair[0].shape[0] // 2
            return ((pair[0][:h2], pair[1][:h2]),
                    (pair[0][h2:], pair[1][h2:]))

        blocks = []
        for a in halves(c):
            for b2 in halves(a):
                for s in halves(b2):
                    blocks.extend(halves(s))
        leaf = [self._matmul_mont(b, w, left=True)
                for b, w in zip(blocks, ws)]

        def merge(A, B, Pi):
            top = add_mod64(A, B, self.q)
            bot = self._shoup_const(sub_mod64(A, B, self.q), Pi)
            return (jnp.concatenate([top[0], bot[0]], axis=0),
                    jnp.concatenate([top[1], bot[1]], axis=0))

        m4 = [merge(leaf[2 * i], leaf[2 * i + 1], self._split4_Pi4[i])
              for i in range(8)]
        m3 = [merge(m4[2 * i], m4[2 * i + 1], self._split4_Pi3[i])
              for i in range(4)]
        m2 = [merge(m3[0], m3[1], self._split4_Pi2[0]),
              merge(m3[2], m3[3], self._split4_Pi2[1])]
        return merge(m2[0], m2[1], self._split4_Pi1)

    def _nwc_kernel_split3(
        self, a_hi, a_lo, b_hi, b_lo,
        w0, w1f, w2f, w3f, w4f, w5f, w6f, w7f, w2,
        wi0, wi1, wi2, wi3, wi4, wi5, wi6, wi7, w2i,
        mid_hi, mid_lo, mid_shi, mid_slo, midi_hi, midi_lo, midi_shi,
        midi_slo, out_hi, out_lo,
    ):
        """The fused NWC pipeline with depth-3 split-radix left
        transforms (n1 = 1024; mids pi3-permuted)."""
        mid_w = (mid_hi[...], mid_lo[...])
        mid_ws = (mid_shi[...], mid_slo[...])
        midi_w = (midi_hi[...], midi_lo[...])
        midi_ws = (midi_shi[...], midi_slo[...])
        wf = (w0, w1f, w2f, w3f, w4f, w5f, w6f, w7f)
        wi = (wi0, wi1, wi2, wi3, wi4, wi5, wi6, wi7)

        def fwd(x):
            x = self._left_fwd_split3(x, wf)
            x = self._shoup(x, mid_w, mid_ws)
            return self._matmul_mont(x, w2, left=False, final=False)

        for g in range(a_hi.shape[0]):
            fa = fwd((a_hi[g], a_lo[g]))
            fb = fwd((b_hi[g], b_lo[g]))
            c = self._emul(fa, fb)
            c = self._matmul_mont(c, w2i, left=False, final=False)
            c = self._shoup(c, midi_w, midi_ws)
            r_hi, r_lo = self._left_inv_split3(c, wi)
            out_hi[g] = r_hi
            out_lo[g] = r_lo

    def _left_fwd_split5(self, x, ws):
        """Depth-5 split-radix forward left transform of a (4096, 128)
        pair block: five DIF butterfly levels feeding THIRTY-TWO
        128-contraction leaf matmuls; output row r holds X1[pi5(r)]."""
        hi, lo = x
        h = 16 * LANES
        t1 = self._shoup_const((hi[h:], lo[h:]), self._split5_P1)
        xt = (hi[:h], lo[:h])
        u = add_mod64(xt, t1, self.q)
        v = sub_mod64(xt, t1, self.q)

        def bfly(y, P, h2):
            yh, yl = y
            t = self._shoup_const((yh[h2:], yl[h2:]), P)
            yt = (yh[:h2], yl[:h2])
            return (add_mod64(yt, t, self.q), sub_mod64(yt, t, self.q))

        outs = []
        i3 = i4 = i5 = wi = 0
        for blk, P2 in ((u, self._split5_P2e), (v, self._split5_P2o)):
            for sub in bfly(blk, P2, 8 * LANES):
                l3 = bfly(sub, self._split5_P3[i3], 4 * LANES)
                i3 += 1
                for sub2 in l3:
                    l4 = bfly(sub2, self._split5_P4[i4], 2 * LANES)
                    i4 += 1
                    for sub3 in l4:
                        l5 = bfly(sub3, self._split5_P5[i5], LANES)
                        i5 += 1
                        for leafblk in l5:
                            outs.append(self._matmul_mont(
                                leafblk, ws[wi], left=True, final=False))
                            wi += 1
        return (jnp.concatenate([o[0] for o in outs], axis=0),
                jnp.concatenate([o[1] for o in outs], axis=0))

    def _left_inv_split5(self, c, ws):
        """Depth-5 mirror: thirty-two row-scaled 128-DFT leaves on the
        pi5-ordered spectrum 32nds, then five merge levels; output rows
        natural coefficient order."""
        def halves(pair):
            h2 = pair[0].shape[0] // 2
            return ((pair[0][:h2], pair[1][:h2]),
                    (pair[0][h2:], pair[1][h2:]))

        blocks = []
        for a in halves(c):
            for b2 in halves(a):
                for s in halves(b2):
                    for s2 in halves(s):
                        blocks.extend(halves(s2))
        leaf = [self._matmul_mont(b, w, left=True)
                for b, w in zip(blocks, ws)]

        def merge(A, B, Pi):
            top = add_mod64(A, B, self.q)
            bot = self._shoup_const(sub_mod64(A, B, self.q), Pi)
            return (jnp.concatenate([top[0], bot[0]], axis=0),
                    jnp.concatenate([top[1], bot[1]], axis=0))

        m5 = [merge(leaf[2 * i], leaf[2 * i + 1], self._split5_Pi5[i])
              for i in range(16)]
        m4 = [merge(m5[2 * i], m5[2 * i + 1], self._split5_Pi4[i])
              for i in range(8)]
        m3 = [merge(m4[2 * i], m4[2 * i + 1], self._split5_Pi3[i])
              for i in range(4)]
        m2 = [merge(m3[0], m3[1], self._split5_Pi2[0]),
              merge(m3[2], m3[3], self._split5_Pi2[1])]
        return merge(m2[0], m2[1], self._split5_Pi1)

    def _nwc_kernel_split5(self, a_hi, a_lo, b_hi, b_lo, *refs):
        """The fused NWC pipeline with depth-5 split-radix left
        transforms (n1 = 4096; mids pi5-permuted).  refs layout:
        32 fwd leaves, w2, 32 inv leaves, w2i, 4 mid words, 4 inv-mid
        words, out_hi, out_lo."""
        wf = refs[0:32]
        w2 = refs[32]
        wi = refs[33:65]
        w2i = refs[65]
        mid_w = (refs[66][...], refs[67][...])
        mid_ws = (refs[68][...], refs[69][...])
        midi_w = (refs[70][...], refs[71][...])
        midi_ws = (refs[72][...], refs[73][...])
        out_hi, out_lo = refs[74], refs[75]

        def fwd(x):
            x = self._left_fwd_split5(x, wf)
            x = self._shoup(x, mid_w, mid_ws)
            return self._matmul_mont(x, w2, left=False, final=False)

        for g in range(a_hi.shape[0]):
            fa = fwd((a_hi[g], a_lo[g]))
            fb = fwd((b_hi[g], b_lo[g]))
            c = self._emul(fa, fb)
            c = self._matmul_mont(c, w2i, left=False, final=False)
            c = self._shoup(c, midi_w, midi_ws)
            r_hi, r_lo = self._left_inv_split5(c, wi)
            out_hi[g] = r_hi
            out_lo[g] = r_lo

    def _nwc_kernel_split4(self, a_hi, a_lo, b_hi, b_lo, *refs):
        """The fused NWC pipeline with depth-4 split-radix left
        transforms (n1 = 2048; mids pi4-permuted).  refs layout:
        16 fwd leaves, w2, 16 inv leaves, w2i, 4 mid words, 4 inv-mid
        words, out_hi, out_lo."""
        wf = refs[0:16]
        w2 = refs[16]
        wi = refs[17:33]
        w2i = refs[33]
        mid_w = (refs[34][...], refs[35][...])
        mid_ws = (refs[36][...], refs[37][...])
        midi_w = (refs[38][...], refs[39][...])
        midi_ws = (refs[40][...], refs[41][...])
        out_hi, out_lo = refs[42], refs[43]

        def fwd(x):
            x = self._left_fwd_split4(x, wf)
            x = self._shoup(x, mid_w, mid_ws)
            return self._matmul_mont(x, w2, left=False, final=False)

        for g in range(a_hi.shape[0]):
            fa = fwd((a_hi[g], a_lo[g]))
            fb = fwd((b_hi[g], b_lo[g]))
            c = self._emul(fa, fb)
            c = self._matmul_mont(c, w2i, left=False, final=False)
            c = self._shoup(c, midi_w, midi_ws)
            r_hi, r_lo = self._left_inv_split4(c, wi)
            out_hi[g] = r_hi
            out_lo[g] = r_lo

    def _nwc_kernel_split2(
        self, a_hi, a_lo, b_hi, b_lo,
        wee, weo, woe, woo, w2, wiee, wieo, wioe, wioo, w2i,
        mid_hi, mid_lo, mid_shi, mid_slo, midi_hi, midi_lo, midi_shi,
        midi_slo, out_hi, out_lo,
    ):
        """The fused NWC pipeline with depth-2 split-radix left
        transforms (n1 = 512; identical output to _nwc_kernel — the mids
        are pi2-permuted so the pipeline is internally consistent)."""
        mid_w = (mid_hi[...], mid_lo[...])
        mid_ws = (mid_shi[...], mid_slo[...])
        midi_w = (midi_hi[...], midi_lo[...])
        midi_ws = (midi_shi[...], midi_slo[...])
        wf = (wee, weo, woe, woo)
        wi = (wiee, wieo, wioe, wioo)

        def fwd(x):
            x = self._left_fwd_split2(x, wf)
            x = self._shoup(x, mid_w, mid_ws)
            return self._matmul_mont(x, w2, left=False, final=False)

        for g in range(a_hi.shape[0]):
            fa = fwd((a_hi[g], a_lo[g]))
            fb = fwd((b_hi[g], b_lo[g]))
            c = self._emul(fa, fb)
            c = self._matmul_mont(c, w2i, left=False, final=False)
            c = self._shoup(c, midi_w, midi_ws)
            r_hi, r_lo = self._left_inv_split2(c, wi)
            out_hi[g] = r_hi
            out_lo[g] = r_lo

    def _nwc_kernel_split(
        self, a_hi, a_lo, b_hi, b_lo,
        w1e, w1o, w2, w1ia, w1ib, w2i,
        mid_hi, mid_lo, mid_shi, mid_slo, midi_hi, midi_lo, midi_shi,
        midi_slo, out_hi, out_lo,
    ):
        """The fused NWC pipeline with split-radix left transforms (the
        mids are the pi-permuted tables, so the pipeline is internally
        consistent and the output identical to _nwc_kernel)."""
        mid_w = (mid_hi[...], mid_lo[...])
        mid_ws = (mid_shi[...], mid_slo[...])
        midi_w = (midi_hi[...], midi_lo[...])
        midi_ws = (midi_shi[...], midi_slo[...])

        def fwd(x):
            x = self._left_fwd_split(x, w1e, w1o)
            x = self._shoup(x, mid_w, mid_ws)
            return self._matmul_mont(x, w2, left=False, final=False)

        for g in range(a_hi.shape[0]):
            fa = fwd((a_hi[g], a_lo[g]))
            fb = fwd((b_hi[g], b_lo[g]))
            c = self._emul(fa, fb)
            c = self._matmul_mont(c, w2i, left=False, final=False)
            c = self._shoup(c, midi_w, midi_ws)
            r_hi, r_lo = self._left_inv_split(c, w1ia, w1ib)
            out_hi[g] = r_hi
            out_lo[g] = r_lo

    # ------------------------------------------------------------------
    # Kernel body & wrapper
    # ------------------------------------------------------------------

    def _nwc_kernel(
        self, a_hi, a_lo, b_hi, b_lo,
        w1, w2, w1i, w2i,
        mid_hi, mid_lo, mid_shi, mid_slo, midi_hi, midi_lo, midi_shi,
        midi_slo, out_hi, out_lo,
    ):
        """Twist-folded pipeline: zero elementwise twist/untwist passes.

        plain -> [W1*psi^(128n1), 2^96] -> *mid*psi^(n2) -> [W2, 2^160]
        = Mont-64 NWC spectrum; pointwise; [W2i, 2^96] -> *mid_inv*
        psi^(-n2)*n^-1 -> [W1i*psi^(-128n1), 2^32] -> plain result.
        """
        mid_w = (mid_hi[...], mid_lo[...])
        mid_ws = (mid_shi[...], mid_slo[...])
        midi_w = (midi_hi[...], midi_lo[...])
        midi_ws = (midi_shi[...], midi_slo[...])

        def fwd(x):
            x = self._matmul_mont(x, w1, left=True, final=False)
            x = self._shoup(x, mid_w, mid_ws)
            return self._matmul_mont(x, w2, left=False, final=False)

        for g in range(a_hi.shape[0]):
            fa = fwd((a_hi[g], a_lo[g]))
            fb = fwd((b_hi[g], b_lo[g]))
            c = self._emul(fa, fb)  # variable*variable: Montgomery
            c = self._matmul_mont(c, w2i, left=False, final=False)
            c = self._shoup(c, midi_w, midi_ws)
            r_hi, r_lo = self._matmul_mont(c, w1i, left=True)
            out_hi[g] = r_hi
            out_lo[g] = r_lo

    def _cyclic_kernel(
        self, a_hi, a_lo, b_hi, b_lo,
        w1, w2, w1i_exit, w2i,
        mid_hi, mid_lo, mid_shi, mid_slo,
        midi_hi, midi_lo, midi_shi, midi_slo,
        out_hi, out_lo,
    ):
        mid_w = (mid_hi[...], mid_lo[...])
        mid_ws = (mid_shi[...], mid_slo[...])
        midi_w = (midi_hi[...], midi_lo[...])
        midi_ws = (midi_shi[...], midi_slo[...])

        def fwd(x):  # plain in -> Montgomery-64 out (w2 carries 2^160)
            x = self._matmul_mont(x, w1, left=True, final=False)
            x = self._shoup(x, mid_w, mid_ws)
            return self._matmul_mont(x, w2, left=False, final=False)

        for g in range(a_hi.shape[0]):
            fa = fwd((a_hi[g], a_lo[g]))
            fb = fwd((b_hi[g], b_lo[g]))
            c = self._emul(fa, fb)
            c = self._matmul_mont(c, w2i, left=False, final=False)
            c = self._shoup(c, midi_w, midi_ws)  # n^-1 folded
            r_hi, r_lo = self._matmul_mont(c, w1i_exit, left=True)
            out_hi[g] = r_hi
            out_lo[g] = r_lo

    def _cyclic_scaled_kernel(
        self, a_hi, a_lo, b_hi, b_lo,
        pre_hi, pre_lo, pre_shi, pre_slo,
        post_hi, post_lo, post_shi, post_slo,
        w1, w2, w1i_exit, w2i,
        mid_hi, mid_lo, mid_shi, mid_slo,
        midi_hi, midi_lo, midi_shi, midi_slo,
        out_hi, out_lo,
    ):
        """``_cyclic_kernel`` with folded per-element entry/exit Shoup
        scales: out = post . INTT(NTT(pre . a) ∘ NTT(pre . b)).

        Used by the kernel-locals four-step (sharded.KernelFourStep) to
        absorb the OUTER mid tables into the fused row product — the
        three XLA mid-fusion passes (and their full-array HBM round
        trips) become in-register VPU work (round-3 large-N attack,
        BENCH_NOTES.md).  Strict shoup_mul64 at both folds (entry feeds
        the digit scan which wants [0, q); exit must emit plain words),
        so q < 2^62 — the Goldilocks subclass keeps the XLA mid path."""
        mid_w = (mid_hi[...], mid_lo[...])
        mid_ws = (mid_shi[...], mid_slo[...])
        midi_w = (midi_hi[...], midi_lo[...])
        midi_ws = (midi_shi[...], midi_slo[...])

        def fwd(x, g):
            x = shoup_mul64(x, (pre_hi[g], pre_lo[g]),
                            (pre_shi[g], pre_slo[g]), self.q)
            x = self._matmul_mont(x, w1, left=True, final=False)
            x = self._shoup(x, mid_w, mid_ws)
            return self._matmul_mont(x, w2, left=False, final=False)

        for g in range(a_hi.shape[0]):
            fa = fwd((a_hi[g], a_lo[g]), g)
            fb = fwd((b_hi[g], b_lo[g]), g)
            c = self._emul(fa, fb)
            c = self._matmul_mont(c, w2i, left=False, final=False)
            c = self._shoup(c, midi_w, midi_ws)  # n^-1 folded
            r = self._matmul_mont(c, w1i_exit, left=True)
            r = shoup_mul64(r, (post_hi[g], post_lo[g]),
                            (post_shi[g], post_slo[g]), self.q)
            out_hi[g] = r[0]
            out_lo[g] = r[1]

    def _fwd_kernel(
        self, x_hi, x_lo, w1, w2p,
        mid_hi, mid_lo, mid_shi, mid_slo,
        out_hi, out_lo,
    ):
        mid_w = (mid_hi[...], mid_lo[...])
        mid_ws = (mid_shi[...], mid_slo[...])
        for g in range(x_hi.shape[0]):
            x = self._matmul_mont((x_hi[g], x_lo[g]), w1, left=True,
                                  final=False)
            x = self._shoup(x, mid_w, mid_ws)
            r_hi, r_lo = self._matmul_mont(x, w2p, left=False)  # plain out
            out_hi[g] = r_hi
            out_lo[g] = r_lo

    def _inv_kernel(
        self, x_hi, x_lo, w1i, w2i,
        midi_hi, midi_lo, midi_shi, midi_slo,
        out_hi, out_lo,
    ):
        midi_w = (midi_hi[...], midi_lo[...])
        midi_ws = (midi_shi[...], midi_slo[...])
        for g in range(x_hi.shape[0]):
            x = self._matmul_mont((x_hi[g], x_lo[g]), w2i, left=False,
                                  final=False)
            x = self._shoup(x, midi_w, midi_ws)  # n^-1 folded
            r_hi, r_lo = self._matmul_mont(x, w1i, left=True)
            out_hi[g] = r_hi
            out_lo[g] = r_lo

    #: independent 128x128 groups per grid step (ILP across their long
    #: reduction dependency chains)
    groups_per_step = 2

    def _eff_gps(self, batch_rows: int) -> int:
        """Clamp groups-per-step to the actual group count (so small
        batches pay no padding) and to the scoped-VMEM budget at large n.

        The kernel body's per-step temporaries (digit expansions +
        carry-save diagonals) scale with n1 * gps rows; measured on v5e:
        n1 * gps = 1024 (n = 65536, gps = 2) overflows the 16 MB scoped
        vmem limit at 18.6 MB, while n1 * gps = 512 (n = 32768, gps = 2 —
        the hardware-validated bench config) fits.  Cap n1 * gps at 512 so
        every kernel-window size compiles at any batch."""
        groups = -(-batch_rows // self.t)
        cap = max(1, 512 // self.n1)
        return max(1, min(self.groups_per_step, groups, cap))

    def _acc_add(self, x, y):
        """Spectrum-domain accumulation x + y mod q: x normalized [0, q),
        y any reduced representative < 2q (every _emul here is stricter);
        sum < 3q < 2^64 for q < 2^62, two conditional subtracts.  The
        Goldilocks subclass overrides with the 2^64-wrap-aware form."""
        return self._cond_sub2(*add64(x, y))

    def _make_dot_kernel(self, cached: bool):
        """Fused spectrum dot: INTT(Σ_k NTT(a_k)·NTT(b_k)) — the lattice
        A@s / key-switching inner product.  One inverse per output and
        the accumulator never leaves VMEM; data blocks are (gps, K, rows,
        LANES) with the K pairs unrolled at trace time.  With ``cached``
        the b-side blocks are precomputed Montgomery-64 nwc_spectrum
        stacks and skip the forward — K forwards + 1 inverse total."""

        def kernel(
            a_hi, a_lo, b_hi, b_lo,
            w1, w2, w1i, w2i,
            mid_hi, mid_lo, mid_shi, mid_slo, midi_hi, midi_lo, midi_shi,
            midi_slo, out_hi, out_lo,
        ):
            mid_w = (mid_hi[...], mid_lo[...])
            mid_ws = (mid_shi[...], mid_slo[...])
            midi_w = (midi_hi[...], midi_lo[...])
            midi_ws = (midi_shi[...], midi_slo[...])

            def fwd(x):
                x = self._matmul_mont(x, w1, left=True, final=False)
                x = self._shoup(x, mid_w, mid_ws)
                return self._matmul_mont(x, w2, left=False, final=False)

            for g in range(a_hi.shape[0]):
                acc = None
                for k in range(a_hi.shape[1]):
                    fa = fwd((a_hi[g, k], a_lo[g, k]))
                    fb = ((b_hi[g, k], b_lo[g, k]) if cached
                          else fwd((b_hi[g, k], b_lo[g, k])))
                    c = self._emul(fa, fb)
                    acc = c if acc is None else self._acc_add(acc, c)
                c = self._matmul_mont(acc, w2i, left=False, final=False)
                c = self._shoup(c, midi_w, midi_ws)
                r_hi, r_lo = self._matmul_mont(c, w1i, left=True)
                out_hi[g] = r_hi
                out_lo[g] = r_lo

        return kernel

    def _make_matvec_kernel(self, k: int, l: int):
        """Fused A @ s (see mxu.py counterpart): l forwards + k inverses
        for k·l products, A-spectrum blocks and the s spectra resident in
        VMEM throughout."""

        def kernel(
            s_hi, s_lo, a_hi, a_lo,
            w1, w2, w1i, w2i,
            mid_hi, mid_lo, mid_shi, mid_slo, midi_hi, midi_lo, midi_shi,
            midi_slo, out_hi, out_lo,
        ):
            mid_w = (mid_hi[...], mid_lo[...])
            mid_ws = (mid_shi[...], mid_slo[...])
            midi_w = (midi_hi[...], midi_lo[...])
            midi_ws = (midi_shi[...], midi_slo[...])

            def fwd(x):
                x = self._matmul_mont(x, w1, left=True, final=False)
                x = self._shoup(x, mid_w, mid_ws)
                return self._matmul_mont(x, w2, left=False, final=False)

            for g in range(s_hi.shape[0]):
                fs = [fwd((s_hi[g, j], s_lo[g, j])) for j in range(l)]
                for i in range(k):
                    acc = None
                    for j in range(l):
                        c = self._emul(fs[j], (a_hi[i, j], a_lo[i, j]))
                        acc = c if acc is None else self._acc_add(acc, c)
                    c = self._matmul_mont(acc, w2i, left=False, final=False)
                    c = self._shoup(c, midi_w, midi_ws)
                    r_hi, r_lo = self._matmul_mont(c, w1i, left=True)
                    out_hi[g, i] = r_hi
                    out_lo[g, i] = r_lo

        return kernel

    def _nwc_spec_kernel(
        self, x_hi, x_lo, w1, w2,
        mid_hi, mid_lo, mid_shi, mid_slo, out_hi, out_lo,
    ):
        """Forward half of the fused NWC pipeline, output left in the
        Montgomery-64 domain — the cacheable operand spectrum."""
        mid_w = (mid_hi[...], mid_lo[...])
        mid_ws = (mid_shi[...], mid_slo[...])
        for g in range(x_hi.shape[0]):
            x = self._matmul_mont((x_hi[g], x_lo[g]), w1, left=True,
                                  final=False)
            x = self._shoup(x, mid_w, mid_ws)
            r_hi, r_lo = self._matmul_mont(x, w2, left=False)
            out_hi[g] = r_hi
            out_lo[g] = r_lo

    def _nwc_cached_kernel(
        self, a_hi, a_lo, s_hi, s_lo,
        w1, w2, w1i, w2i,
        mid_hi, mid_lo, mid_shi, mid_slo, midi_hi, midi_lo, midi_shi,
        midi_slo, out_hi, out_lo,
    ):
        """Product against a precomputed Montgomery-64 spectrum: one
        forward transform instead of two."""
        mid_w = (mid_hi[...], mid_lo[...])
        mid_ws = (mid_shi[...], mid_slo[...])
        midi_w = (midi_hi[...], midi_lo[...])
        midi_ws = (midi_shi[...], midi_slo[...])
        for g in range(a_hi.shape[0]):
            x = self._matmul_mont((a_hi[g], a_lo[g]), w1, left=True,
                                  final=False)
            x = self._shoup(x, mid_w, mid_ws)
            fa = self._matmul_mont(x, w2, left=False, final=False)
            c = self._emul(fa, (s_hi[g], s_lo[g]))
            c = self._matmul_mont(c, w2i, left=False, final=False)
            c = self._shoup(c, midi_w, midi_ws)
            r_hi, r_lo = self._matmul_mont(c, w1i, left=True)
            out_hi[g] = r_hi
            out_lo[g] = r_lo

    def _nwc_fwd_kernel(
        self, x_hi, x_lo, w1, w2p,
        mid_hi, mid_lo, mid_shi, mid_slo, out_hi, out_lo,
    ):
        """Twist-folded forward: the reference's benchmarked forward_ntt
        (psi-twist + NTT, software_benchmark/benchmark_ntt.cpp:207-211) as
        2 matmul steps + 1 Shoup pass; plain in, plain NWC spectrum out
        (four-step layout)."""
        mid_w = (mid_hi[...], mid_lo[...])
        mid_ws = (mid_shi[...], mid_slo[...])
        for g in range(x_hi.shape[0]):
            x = self._matmul_mont((x_hi[g], x_lo[g]), w1, left=True,
                                  final=False)
            x = self._shoup(x, mid_w, mid_ws)
            r_hi, r_lo = self._matmul_mont(x, w2p, left=False)
            out_hi[g] = r_hi
            out_lo[g] = r_lo

    def _nwc_inv_kernel(
        self, x_hi, x_lo, w2i, w1ip,
        midi_hi, midi_lo, midi_shi, midi_slo,
        out_hi, out_lo,
    ):
        """Untwist-folded inverse (mirror of _nwc_fwd_kernel): plain NWC
        spectrum in (four-step layout), plain natural-order out; the
        psi^(-i) untwist and n^-1 ride the tables — zero elementwise
        exit passes."""
        midi_w = (midi_hi[...], midi_lo[...])
        midi_ws = (midi_shi[...], midi_slo[...])
        for g in range(x_hi.shape[0]):
            x = self._matmul_mont((x_hi[g], x_lo[g]), w2i, left=False,
                                  final=False)
            x = self._shoup(x, midi_w, midi_ws)
            r_hi, r_lo = self._matmul_mont(x, w1ip, left=True)
            out_hi[g] = r_hi
            out_lo[g] = r_lo

    # ------------------------------------------------------------------
    # Split-radix standalone entries (round-5 lever: the fused
    # nwc_poly_mult gained +11..41% from the split left transform at
    # n >= 32768 — DESIGN.md §2.5c — while nwc_ntt_fwd / nwc_ntt_inv /
    # nwc_spectrum / nwc_poly_mult_cached kept the dense left.  These
    # factories give the standalone entries the same split bodies.  The
    # staged spectrum is then emitted in the PI-PERMUTED four-step
    # layout (physical row r of the (n1, 128) block holds spectrum row
    # pi_d(r)); the matching inverse consumes exactly that layout and
    # ``nwc_fourstep_to_natural_perm`` exposes it, so the fwd/inv and
    # spectrum/cached pairs stay self-consistent (dispatch.py layout
    # contract).
    # ------------------------------------------------------------------

    def _split_depth(self) -> int:
        """Active split-radix depth of the left transform (0 = dense)."""
        if not self.split_left:
            return 0
        for d, attr in ((5, "w1s5_nwc"), (4, "w1s4_nwc"),
                        (3, "w1s3_nwc"), (2, "w1s2_nwc"),
                        (1, "w1s_e_nwc")):
            if hasattr(self, attr):
                return d
        return 0

    def _split_fwd_leaves(self, d: int):
        if d == 1:
            return (self.w1s_e_nwc, self.w1s_o_nwc)
        return tuple(getattr(self, f"w1s{d}_nwc"))

    def _split_inv_leaves(self, d: int):
        """Fused-pipeline inverse leaves (exit the Montgomery-64 hop)."""
        if d == 1:
            return (self.w1is_a_nwc, self.w1is_b_nwc)
        return tuple(getattr(self, f"w1is{d}_nwc"))

    def _split_mid(self, d: int):
        return getattr(self, "mid_nwc_split" + ("" if d == 1 else str(d)))

    def _split_mid_inv(self, d: int):
        return getattr(self,
                       "mid_inv_nwc_split" + ("" if d == 1 else str(d)))

    def _left_fwd_split_any(self, x, ws, d: int):
        if d == 1:
            return self._left_fwd_split(x, ws[0], ws[1])
        return getattr(self, f"_left_fwd_split{d}")(x, ws)

    def _left_inv_split_any(self, c, ws, d: int):
        if d == 1:
            return self._left_inv_split(c, ws[0], ws[1])
        return getattr(self, f"_left_inv_split{d}")(c, ws)

    def _split_inv_plain_leaves(self):
        """Domain-neutral (r96) variants of the split inverse leaf
        matrices for the STANDALONE inverse: ``nwc_ntt_inv`` consumes
        ``nwc_ntt_fwd``'s PLAIN spectrum, while the fused pipeline's
        leaves (r32 scale) exist to exit its internal Montgomery-64 hop
        — the exact analog of ``w1i_nwc_plain`` vs ``w1i_nwc`` on the
        dense path.  Mirrors __init__'s per-depth leaf construction
        (root w1i^(2^d), rowbases psi128^-1 * w1i^bitrev_d(br)); built
        lazily on the first standalone-inverse call and cached.  The
        build runs under ``ensure_compile_time_eval``: a first touch
        inside a user jit would otherwise cache TRACERS of the constant
        tables and poison every later trace (third sighting of the
        first-touch-under-trace bug family — kyber KyberPlan was the
        first, round 3)."""
        tabs = self.__dict__.get("_inv_plain_tabs")
        if tabs is not None:
            return tabs
        d = self._split_depth()
        q, p = self.q, self.p
        w1 = pow(p.omega, self.n2, q)
        w1i = pow(w1, q - 2, q)
        psi128_inv = pow(pow(p.psi, self.n2, q), q - 2, q)
        r96 = self._domain_scales(q)[2]
        root = pow(w1i, 1 << d, q)
        pows = _pow_table(root, q, LANES)

        def leaf(rowbase):
            m = np.empty((LANES, LANES), dtype=object)
            for i in range(LANES):
                rs = pow(rowbase, i, q)
                for j in range(LANES):
                    m[i, j] = pows[(i * j) % LANES] * rs % q * r96 % q
            digit_arrays = [np.empty(m.shape, dtype=np.int8)
                            for _ in range(self.nlimbs)]
            for idx, v in np.ndenumerate(m):
                for k, dg in enumerate(_balanced_digits(int(v),
                                                        self.nlimbs)):
                    digit_arrays[k][idx] = dg
            return jnp.asarray(np.concatenate(digit_arrays[::-1], axis=1))

        exps = [int(f"{br:0{d}b}"[::-1], 2) for br in range(1 << d)]
        with jax.ensure_compile_time_eval():
            tabs = tuple(leaf(psi128_inv * pow(w1i, e, q) % q)
                         for e in exps)
        self.__dict__["_inv_plain_tabs"] = tabs
        return tabs

    def _split_row_perm(self):
        """pi_d over the n1 physical rows (row r holds spectrum row
        pi_d(r)), or None on the dense path."""
        d = self._split_depth()
        if not d:
            return None
        r = np.arange(self.n1)
        pi = (r % LANES) << d
        for k in range(d):
            pi += ((r >> (7 + k)) & 1) << (d - 1 - k)
        return pi

    def nwc_fourstep_to_natural_perm(self) -> np.ndarray:
        """perm such that natural_nwc_spectrum = nwc_ntt_fwd_flat[perm].

        Equals ``fourstep_to_natural_perm`` on the dense path; under the
        split-radix left transform the n1 rows are pi_d-permuted (see
        ``_split_row_perm``), so the perm composes pi_d^-1."""
        pi = self._split_row_perm()
        if pi is None:
            return self.fourstep_to_natural_perm()
        inv_pi = np.argsort(pi)
        j = np.arange(self.p.n)
        return inv_pi[j % self.n1] * LANES + j // self.n1

    def _make_nwc_fwd_split_kernel(self, d: int, nleaves: int):
        """Standalone split forward (plain spectrum out): left split +
        pi_d-permuted mid + w2_plain.  refs: nleaves fwd leaves, w2p,
        4 mid words, out_hi, out_lo."""

        def kernel(x_hi, x_lo, *refs):
            wf = refs[0:nleaves]
            w2p = refs[nleaves]
            mid_w = (refs[nleaves + 1][...], refs[nleaves + 2][...])
            mid_ws = (refs[nleaves + 3][...], refs[nleaves + 4][...])
            out_hi, out_lo = refs[nleaves + 5], refs[nleaves + 6]
            for g in range(x_hi.shape[0]):
                x = self._left_fwd_split_any((x_hi[g], x_lo[g]), wf, d)
                x = self._shoup(x, mid_w, mid_ws)
                r_hi, r_lo = self._matmul_mont(x, w2p, left=False)
                out_hi[g] = r_hi
                out_lo[g] = r_lo

        return kernel

    def _make_nwc_inv_split_kernel(self, d: int, nleaves: int):
        """Standalone split inverse (consumes the plain pi_d-permuted
        spectrum).  refs: w2i, nleaves plain inv leaves, 4 inv-mid
        words, out_hi, out_lo."""

        def kernel(x_hi, x_lo, *refs):
            w2i = refs[0]
            wi = refs[1:1 + nleaves]
            midi_w = (refs[nleaves + 1][...], refs[nleaves + 2][...])
            midi_ws = (refs[nleaves + 3][...], refs[nleaves + 4][...])
            out_hi, out_lo = refs[nleaves + 5], refs[nleaves + 6]
            for g in range(x_hi.shape[0]):
                x = self._matmul_mont((x_hi[g], x_lo[g]), w2i,
                                      left=False, final=False)
                x = self._shoup(x, midi_w, midi_ws)
                r_hi, r_lo = self._left_inv_split_any(x, wi, d)
                out_hi[g] = r_hi
                out_lo[g] = r_lo

        return kernel

    def _make_nwc_cached_split_kernel(self, d: int, nleaves: int):
        """Split product against a cached Montgomery-64 spectrum (the
        spectrum itself comes from the split ``nwc_spectrum``, so both
        sides share the pi_d layout).  refs: nleaves fwd leaves, w2,
        nleaves Montgomery inv leaves, w2i, 4 mid + 4 inv-mid words,
        out_hi, out_lo."""

        def kernel(a_hi, a_lo, s_hi, s_lo, *refs):
            wf = refs[0:nleaves]
            w2 = refs[nleaves]
            wi = refs[nleaves + 1:2 * nleaves + 1]
            w2i = refs[2 * nleaves + 1]
            b = 2 * nleaves + 2
            mid_w = (refs[b][...], refs[b + 1][...])
            mid_ws = (refs[b + 2][...], refs[b + 3][...])
            midi_w = (refs[b + 4][...], refs[b + 5][...])
            midi_ws = (refs[b + 6][...], refs[b + 7][...])
            out_hi, out_lo = refs[b + 8], refs[b + 9]
            for g in range(a_hi.shape[0]):
                x = self._left_fwd_split_any((a_hi[g], a_lo[g]), wf, d)
                x = self._shoup(x, mid_w, mid_ws)
                fa = self._matmul_mont(x, w2, left=False, final=False)
                c = self._emul(fa, (s_hi[g], s_lo[g]))
                c = self._matmul_mont(c, w2i, left=False, final=False)
                c = self._shoup(c, midi_w, midi_ws)
                r_hi, r_lo = self._left_inv_split_any(c, wi, d)
                out_hi[g] = r_hi
                out_lo[g] = r_lo

        return kernel

    def _make_nwc_spec_split_kernel(self, d: int, nleaves: int):
        """Split forward half of the fused pipeline: cacheable
        Montgomery-64 spectrum in the pi_d layout.  refs: nleaves fwd
        leaves, w2, 4 mid words, out_hi, out_lo."""

        def kernel(x_hi, x_lo, *refs):
            wf = refs[0:nleaves]
            w2 = refs[nleaves]
            mid_w = (refs[nleaves + 1][...], refs[nleaves + 2][...])
            mid_ws = (refs[nleaves + 3][...], refs[nleaves + 4][...])
            out_hi, out_lo = refs[nleaves + 5], refs[nleaves + 6]
            for g in range(x_hi.shape[0]):
                x = self._left_fwd_split_any((x_hi[g], x_lo[g]), wf, d)
                x = self._shoup(x, mid_w, mid_ws)
                r_hi, r_lo = self._matmul_mont(x, w2, left=False)
                out_hi[g] = r_hi
                out_lo[g] = r_lo

        return kernel

    def _group_batch(self, hi, lo):
        b = hi.shape[0]
        step = self.t * self._eff_gps(b)
        pad = (-b) % step
        if pad:
            z = jnp.zeros((pad, hi.shape[1]), U32)
            hi = jnp.concatenate([hi, z], axis=0)
            lo = jnp.concatenate([lo, z], axis=0)
        g = (b + pad) // self.t
        return (hi.reshape(g, self.rows, LANES),
                lo.reshape(g, self.rows, LANES), b)

    def _call(self, kernel, data, tables, interpret, scales=()):
        """data: flat tuple of (G,128,128) arrays; returns (hi, lo).

        ``scales``: optional (P,128,128) planes whose group pattern
        repeats every P data groups (the four-step outer mids) — block
        index i reads scale block i % (P/gps), so the plane rides VMEM
        at 1/Pth the data traffic instead of being tiled to full size."""
        gps = self._eff_gps(data[0].shape[0] * self.t)
        g = data[0].shape[0]
        data_spec = pl.BlockSpec(
            (gps, self.rows, LANES), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )

        def spec_for(t):
            # full-array constant-index block (W digit stacks, tables)
            zeros = lambda *_: (0,) * t.ndim
            return pl.BlockSpec(t.shape, zeros, memory_space=pltpu.VMEM)

        def scale_spec(t):
            nblk = t.shape[0] // gps
            return pl.BlockSpec(
                (gps, self.rows, LANES), lambda i, k=nblk: (i % k, 0, 0),
                memory_space=pltpu.VMEM,
            )

        in_specs = ([data_spec] * len(data)
                    + [scale_spec(t) for t in scales]
                    + [spec_for(t) for t in tables])
        compiler_params = None
        cp_kw = {}
        if self.n1 * gps > 512 and not interpret:
            # Beyond the measured n1 * gps <= 512 window (see _eff_gps)
            # the per-step temporaries exceed Mosaic's default 16 MB
            # scoped-VMEM budget (27.7 MB at n1 = 1024); v5e has 128 MiB
            # of VMEM, so raise the cap for these large flat plans only —
            # every measured config at or below the window keeps the
            # default limit and its recorded performance.  Depth-5
            # (n1 = 4096) doubles the per-step temporaries once more and
            # needs the cap near the physical ceiling.
            mb = 112 if self.n1 >= 32 * LANES else 100
            cp_kw["vmem_limit_bytes"] = mb * 1024 * 1024
        if self.dimension_semantics is not None and not interpret:
            cp_kw["dimension_semantics"] = (self.dimension_semantics,)
        if cp_kw:
            compiler_params = pltpu.CompilerParams(**cp_kw)
        return pl.pallas_call(
            kernel,
            grid=(g // gps,),
            out_shape=(
                jax.ShapeDtypeStruct((g, self.rows, LANES), U32),
                jax.ShapeDtypeStruct((g, self.rows, LANES), U32),
            ),
            in_specs=in_specs,
            out_specs=(data_spec, data_spec),
            interpret=interpret,
            compiler_params=compiler_params,
        )(*data, *scales, *tables)

    def _unflatten(self, out, bsz):
        return (
            out[0].reshape(-1, self.p.n)[:bsz],
            out[1].reshape(-1, self.p.n)[:bsz],
        )

    def nwc_poly_mult(self, a, b, interpret: bool = False):
        """Fused negacyclic product: a, b are (hi, lo) uint32 pairs of shape
        (B, n), natural order, coefficients in [0, q)."""
        ga_hi, ga_lo, bsz = self._group_batch(*a)
        gb_hi, gb_lo, _ = self._group_batch(*b)
        if self.split_left and hasattr(self, "w1s5_nwc"):
            out = self._call(
                self._nwc_kernel_split5,
                (ga_hi, ga_lo, gb_hi, gb_lo),
                (
                    *self.w1s5_nwc, self.w2,
                    *self.w1is5_nwc, self.w2i,
                    *self.mid_nwc_split5, *self.mid_inv_nwc_split5,
                ),
                interpret,
            )
            return self._unflatten(out, bsz)
        if self.split_left and hasattr(self, "w1s4_nwc"):
            out = self._call(
                self._nwc_kernel_split4,
                (ga_hi, ga_lo, gb_hi, gb_lo),
                (
                    *self.w1s4_nwc, self.w2,
                    *self.w1is4_nwc, self.w2i,
                    *self.mid_nwc_split4, *self.mid_inv_nwc_split4,
                ),
                interpret,
            )
            return self._unflatten(out, bsz)
        if self.split_left and hasattr(self, "w1s3_nwc"):
            out = self._call(
                self._nwc_kernel_split3,
                (ga_hi, ga_lo, gb_hi, gb_lo),
                (
                    *self.w1s3_nwc, self.w2,
                    *self.w1is3_nwc, self.w2i,
                    *self.mid_nwc_split3, *self.mid_inv_nwc_split3,
                ),
                interpret,
            )
            return self._unflatten(out, bsz)
        if self.split_left and hasattr(self, "w1s2_nwc"):
            out = self._call(
                self._nwc_kernel_split2,
                (ga_hi, ga_lo, gb_hi, gb_lo),
                (
                    *self.w1s2_nwc, self.w2,
                    *self.w1is2_nwc, self.w2i,
                    *self.mid_nwc_split2, *self.mid_inv_nwc_split2,
                ),
                interpret,
            )
            return self._unflatten(out, bsz)
        if self.split_left and hasattr(self, "w1s_e_nwc"):
            out = self._call(
                self._nwc_kernel_split,
                (ga_hi, ga_lo, gb_hi, gb_lo),
                (
                    self.w1s_e_nwc, self.w1s_o_nwc, self.w2,
                    self.w1is_a_nwc, self.w1is_b_nwc, self.w2i,
                    *self.mid_nwc_split, *self.mid_inv_nwc_split,
                ),
                interpret,
            )
            return self._unflatten(out, bsz)
        out = self._call(
            self._nwc_kernel,
            (ga_hi, ga_lo, gb_hi, gb_lo),
            (
                self.w1_nwc, self.w2, self.w1i_nwc, self.w2i,
                *self.mid_nwc, *self.mid_inv_nwc,
            ),
            interpret,
        )
        return self._unflatten(out, bsz)

    def cyclic_poly_mult(self, a, b, interpret: bool = False):
        """Fused cyclic product INTT(NTT(a) . NTT(b)) — the RTL top-level
        pipeline semantics (rtl/ntt_poly_mult.sv)."""
        ga_hi, ga_lo, bsz = self._group_batch(*a)
        gb_hi, gb_lo, _ = self._group_batch(*b)
        out = self._call(
            self._cyclic_kernel,
            (ga_hi, ga_lo, gb_hi, gb_lo),
            (
                self.w1, self.w2, self.w1i_exit, self.w2i,
                *self.mid_shoup, *self.mid_inv_fold,
            ),
            interpret,
        )
        return self._unflatten(out, bsz)

    def cyclic_poly_mult_scaled(self, a, b, pre, post,
                                interpret: bool = False):
        """Cyclic product with folded per-element entry/exit scales:
        post . INTT(NTT(pre . a) ∘ NTT(pre . b)).

        ``pre``/``post``: four uint32 planes each (w_hi, w_lo, ws_hi,
        ws_lo — strict Shoup pairs), shaped (P, 128, 128) and grouped
        exactly like _group_batch groups the data; data group G is scaled
        by plane row G % P (the four-step outer-mid pattern repeats every
        P = n1_outer/t groups).  Strict Shoup needs q < 2^62; the
        Goldilocks subclass inherits the guard and keeps XLA mids."""
        if self.p.q >= 1 << 62:
            raise ValueError(
                "cyclic_poly_mult_scaled requires q < 2^62 (strict Shoup)"
            )
        ga_hi, ga_lo, bsz = self._group_batch(*a)
        gb_hi, gb_lo, _ = self._group_batch(*b)
        gps = self._eff_gps(ga_hi.shape[0] * self.t)
        if pre[0].shape[0] % gps:
            raise ValueError(
                f"scale period {pre[0].shape[0]} not divisible by "
                f"groups-per-step {gps}"
            )
        out = self._call(
            self._cyclic_scaled_kernel,
            (ga_hi, ga_lo, gb_hi, gb_lo),
            (
                self.w1, self.w2, self.w1i_exit, self.w2i,
                *self.mid_shoup, *self.mid_inv_fold,
            ),
            interpret,
            scales=(*pre, *post),
        )
        return self._unflatten(out, bsz)

    def ntt_fwd(self, x, interpret: bool = False):
        """Batched cyclic forward NTT, four-step output layout (entry
        [k1, k2] holds X[k2*n1 + k1]); plain domain in and out."""
        gx_hi, gx_lo, bsz = self._group_batch(*x)
        out = self._call(
            self._fwd_kernel,
            (gx_hi, gx_lo),
            (self.w1, self.w2_plain, *self.mid_shoup),
            interpret,
        )
        return self._unflatten(out, bsz)

    def ntt_inv(self, x, interpret: bool = False):
        """Batched cyclic inverse NTT consuming the four-step layout."""
        gx_hi, gx_lo, bsz = self._group_batch(*x)
        out = self._call(
            self._inv_kernel,
            (gx_hi, gx_lo),
            (self.w1i, self.w2i, *self.mid_inv_fold),
            interpret,
        )
        return self._unflatten(out, bsz)

    def nwc_spectrum(self, x, interpret: bool = False):
        """Cacheable operand spectrum (Montgomery-64 domain; four-step
        layout, pi_d-permuted under the split left transform — see
        ``nwc_fourstep_to_natural_perm``) for nwc_poly_mult_cached."""
        gx_hi, gx_lo, bsz = self._group_batch(*x)
        d = self._split_depth()
        if d:
            wf = self._split_fwd_leaves(d)
            out = self._call(
                self._make_nwc_spec_split_kernel(d, len(wf)),
                (gx_hi, gx_lo),
                (*wf, self.w2, *self._split_mid(d)),
                interpret,
            )
            return self._unflatten(out, bsz)
        out = self._call(
            self._nwc_spec_kernel,
            (gx_hi, gx_lo),
            (self.w1_nwc, self.w2, *self.mid_nwc),
            interpret,
        )
        return self._unflatten(out, bsz)

    def nwc_dot(self, a, b, interpret: bool = False):
        """Fused INTT(Σ_k NTT(a_k)·NTT(b_k)): a, b are (hi, lo) uint32
        pairs of shape (K, B, n) (natural order, [0, q)); returns the
        (B, n) pair Σ_k a_k ⊛ b_k (negacyclic).  Equivalent to K fused
        products and K-1 modular adds, but pays ONE inverse transform per
        output and never materializes spectra to HBM — the A@s /
        key-switching inner-product shape (examples/spectrum_accumulate
        is the staged-API route for operand-reuse patterns this one-shot
        form doesn't cover)."""
        return self._dot_call(a, b, cached=False, interpret=interpret)

    def nwc_dot_cached(self, a, spectra, interpret: bool = False):
        """Fused dot against precomputed spectra: spectra is the (K, B, n)
        (hi, lo) pair stack of ``nwc_spectrum(b_k)`` (Montgomery-64
        domain).  K forwards + ONE inverse instead of 2K+1 transforms —
        the key-switching / fixed-operand inner product (keys transformed
        once, reused across many dots)."""
        return self._dot_call(a, spectra, cached=True, interpret=interpret)

    def _dot_call(self, a, b, cached: bool, interpret: bool):
        K = a[0].shape[0]
        if not 1 <= K <= 8:
            raise ValueError(f"nwc_dot supports 1 <= K <= 8 pairs, got {K}")

        def stack(x):
            ghs, gls, bsz = [], [], None
            for k in range(K):
                gh, gl, bsz = self._group_batch(x[0][k], x[1][k])
                ghs.append(gh)
                gls.append(gl)
            return jnp.stack(ghs, axis=1), jnp.stack(gls, axis=1), bsz

        ga_hi, ga_lo, bsz = stack(a)
        gb_hi, gb_lo, _ = stack(b)
        g = ga_hi.shape[0]
        gps = self._eff_gps(g * self.t)
        data_spec = pl.BlockSpec(
            (gps, K, self.rows, LANES), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_spec = pl.BlockSpec(
            (gps, self.rows, LANES), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )
        tables = (
            self.w1_nwc, self.w2, self.w1i_nwc, self.w2i,
            *self.mid_nwc, *self.mid_inv_nwc,
        )

        def spec_for(t):
            zeros = lambda *_: (0,) * t.ndim
            return pl.BlockSpec(t.shape, zeros, memory_space=pltpu.VMEM)

        out = pl.pallas_call(
            self._make_dot_kernel(cached),
            grid=(g // gps,),
            out_shape=(
                jax.ShapeDtypeStruct((g, self.rows, LANES), U32),
                jax.ShapeDtypeStruct((g, self.rows, LANES), U32),
            ),
            in_specs=[data_spec] * 4 + [spec_for(t) for t in tables],
            out_specs=(out_spec, out_spec),
            interpret=interpret,
        )(ga_hi, ga_lo, gb_hi, gb_lo, *tables)
        return self._unflatten(out, bsz)

    def nwc_matvec_spectra(self, A, interpret: bool = False):
        """Precompute block-layout spectra for ``nwc_matvec_cached``: A is
        a (hi, lo) uint32 pair of shape (k, l, n); returns the
        (k, l, rows, 128) pair of Montgomery-64 spectrum blocks, each
        tiled across the t poly slots of one MXU group."""
        k, l = A[0].shape[0], A[0].shape[1]
        his, los = [], []
        for i in range(k):
            rh, rl = [], []
            for j in range(l):
                tiled = (jnp.tile(A[0][i, j][None], (self.t, 1)),
                         jnp.tile(A[1][i, j][None], (self.t, 1)))
                sp_hi, sp_lo = self.nwc_spectrum(tiled, interpret=interpret)
                gh, gl, _ = self._group_batch(sp_hi, sp_lo)
                rh.append(gh[0])
                rl.append(gl[0])
            his.append(jnp.stack(rh))
            los.append(jnp.stack(rl))
        return jnp.stack(his), jnp.stack(los)

    def nwc_matvec_cached(self, s, A_blocks, interpret: bool = False):
        """Fused A @ s over Z_q[x]/(x^n + 1): s is a (hi, lo) pair of
        shape (l, B, n), A_blocks the pair from ``nwc_matvec_spectra``;
        returns the (k, B, n) pair with out[i] = Σ_j A[i,j] ⊛ s[j].
        l + k transforms for k·l products (the Dilithium A@s shape)."""
        k, l = A_blocks[0].shape[0], A_blocks[0].shape[1]
        if s[0].shape[0] != l:
            raise ValueError(
                f"s has {s[0].shape[0]} rows, A has l={l} columns")
        if not (1 <= l <= 8 and 1 <= k <= 8):
            raise ValueError(f"nwc_matvec supports 1 <= k, l <= 8, got "
                             f"k={k}, l={l}")

        ghs, gls, bsz = [], [], None
        for j in range(l):
            gh, gl, bsz = self._group_batch(s[0][j], s[1][j])
            ghs.append(gh)
            gls.append(gl)
        gs_hi = jnp.stack(ghs, axis=1)
        gs_lo = jnp.stack(gls, axis=1)
        g = gs_hi.shape[0]
        gps = self._eff_gps(g * self.t)
        data_spec = pl.BlockSpec(
            (gps, l, self.rows, LANES), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        a_spec = pl.BlockSpec(
            (k, l, self.rows, LANES), lambda i: (0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_spec = pl.BlockSpec(
            (gps, k, self.rows, LANES), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        tables = (
            self.w1_nwc, self.w2, self.w1i_nwc, self.w2i,
            *self.mid_nwc, *self.mid_inv_nwc,
        )

        def spec_for(t):
            zeros = lambda *_: (0,) * t.ndim
            return pl.BlockSpec(t.shape, zeros, memory_space=pltpu.VMEM)

        out = pl.pallas_call(
            self._make_matvec_kernel(k, l),
            grid=(g // gps,),
            out_shape=(
                jax.ShapeDtypeStruct((g, k, self.rows, LANES), U32),
                jax.ShapeDtypeStruct((g, k, self.rows, LANES), U32),
            ),
            in_specs=[data_spec] * 2 + [a_spec] * 2
            + [spec_for(t) for t in tables],
            out_specs=(out_spec, out_spec),
            interpret=interpret,
        )(gs_hi, gs_lo, *A_blocks, *tables)
        reshape = lambda o: o.transpose(1, 0, 2, 3).reshape(
            k, -1, self.p.n)[:, :bsz]
        return reshape(out[0]), reshape(out[1])

    def nwc_poly_mult_cached(self, a, spectrum, interpret: bool = False):
        """Negacyclic product of a against a cached nwc_spectrum."""
        ga_hi, ga_lo, bsz = self._group_batch(*a)
        gs_hi, gs_lo, _ = self._group_batch(*spectrum)
        d = self._split_depth()
        if d:
            wf = self._split_fwd_leaves(d)
            out = self._call(
                self._make_nwc_cached_split_kernel(d, len(wf)),
                (ga_hi, ga_lo, gs_hi, gs_lo),
                (
                    *wf, self.w2, *self._split_inv_leaves(d), self.w2i,
                    *self._split_mid(d), *self._split_mid_inv(d),
                ),
                interpret,
            )
            return self._unflatten(out, bsz)
        out = self._call(
            self._nwc_cached_kernel,
            (ga_hi, ga_lo, gs_hi, gs_lo),
            (
                self.w1_nwc, self.w2, self.w1i_nwc, self.w2i,
                *self.mid_nwc, *self.mid_inv_nwc,
            ),
            interpret,
        )
        return self._unflatten(out, bsz)

    def nwc_ntt_fwd(self, x, interpret: bool = False):
        """Batched negacyclic forward transform (twist folded), plain
        domain in and out; four-step output layout, pi_d-permuted under
        the split left transform (``nwc_fourstep_to_natural_perm`` is
        the layout map either way)."""
        gx_hi, gx_lo, bsz = self._group_batch(*x)
        d = self._split_depth()
        if d:
            wf = self._split_fwd_leaves(d)
            out = self._call(
                self._make_nwc_fwd_split_kernel(d, len(wf)),
                (gx_hi, gx_lo),
                (*wf, self.w2_plain, *self._split_mid(d)),
                interpret,
            )
            return self._unflatten(out, bsz)
        out = self._call(
            self._nwc_fwd_kernel,
            (gx_hi, gx_lo),
            (self.w1_nwc, self.w2_plain, *self.mid_nwc),
            interpret,
        )
        return self._unflatten(out, bsz)

    def nwc_ntt_inv(self, x, interpret: bool = False):
        """Batched negacyclic inverse transform (untwist + n^-1 folded),
        consuming nwc_ntt_fwd's plain-domain four-step-layout spectrum;
        natural-order coefficients out (the reference's inverse+SCALE
        phases, rtl/ntt_inverse.v, for users who stage NWC spectra)."""
        gx_hi, gx_lo, bsz = self._group_batch(*x)
        d = self._split_depth()
        if d:
            wi = self._split_inv_plain_leaves()
            out = self._call(
                self._make_nwc_inv_split_kernel(d, len(wi)),
                (gx_hi, gx_lo),
                (self.w2i, *wi, *self._split_mid_inv(d)),
                interpret,
            )
            return self._unflatten(out, bsz)
        out = self._call(
            self._nwc_inv_kernel,
            (gx_hi, gx_lo),
            (self.w2i, self.w1i_nwc_plain, *self.mid_inv_nwc),
            interpret,
        )
        return self._unflatten(out, bsz)

    def fourstep_to_natural_perm(self) -> np.ndarray:
        """perm such that natural_spectrum = fourstep_flat[perm]."""
        return np.arange(self.p.n).reshape(self.n1, LANES).T.reshape(-1)
