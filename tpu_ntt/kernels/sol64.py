"""Fused poly-mult kernel for Solinas trinomial moduli q = 2^a - 2^b + 1.

The reference's headline 60-bit modulus q = 1152921504606830593
(rtl/ntt_poly_mult.sv:18-24) is exactly 2^60 - 2^14 + 1 — a Solinas
trinomial, the same structural family as the Goldilocks prime
(kernels/gl64.py).  The identity 2^a ≡ 2^b - 1 (mod q) turns the whole
160-bit carry-save reduction into constant shifts and adds: where the
generic double-word kernel (kernels/mxu64.py) spends three chained
Montgomery-32 steps (~27 VPU multiplies per reduction,
rtl/montgomery_reduction.v semantics), this plan spends ZERO multiplies —
two bias-driven carry propagations plus a dozen shift-add folds.  Unlike
the Goldilocks specialization it keeps the generic kernel's 8 balanced
digits and 15 product diagonals (gl64 needs 9/17), so it strictly
dominates both: less MXU work than gl64, cheaper reduction than mxu64.

Reduction pipeline (all steps exact integer rewrites; every bound is
recomputed and asserted for the concrete (q, n) at plan build):

  1. bias-propagate the 8 signed i32 carry-save lanes bottom-up into
     canonical u16 digits u_0..u_7 plus a small top carry c8
     (t_j = d_j + 2^27 + carry; the bias keeps every t nonnegative);
  2. single-pass fold: each high source (u_4..u_7 at weights 2^64..2^112,
     c8 at 2^128) is replaced by its precomputed small-coefficient
     expansion mod q — e.g. for a=60, b=14: 2^64 ≡ 2^18 - 2^4, so u_4
     contributes +4·u_4 to lane 1 and -16·u_4 to lane 0.  The constant
     bias totals of steps 1 and 3, negated mod q, are folded in as
     initial lane digits, so no end-of-pipe correction exists at all;
  3. bias-propagate the four folded lanes into u16 digits + carry c4;
  4. assemble the (hi, lo) pair, fold the bits >= 2^a (including c4)
     once more via v_top·(2^b - 1), leaving a value < 2^a + 2^28;
     `final` normalizes to [0, q) with one conditional subtract,
     otherwise the lazy representative feeds the next digit scan as-is
     (it is far inside the scan's 2^62 exactness window).

The elementwise pointwise multiply reuses the same fold on the u16
digits of the exact 128-bit product (modmath.mul64_full), so the plan
has no Montgomery anywhere and every table is plain-domain.

Validated bit-exact vs the pure-Python goldens (tests/test_kernels_sol64.py)
and the native big-int oracle on hardware.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..modmath import mont_mul64, mul64_full
from ..params import NttParams
from .mxu64 import LANES, MxuPlan64

U32 = jnp.uint32
I32 = jnp.int32

_BIAS1 = 1 << 27  # step-1 lane bias (> any carry-save lane magnitude)
_BIAS2 = 1 << 24  # step-3 lane bias (> any folded-lane magnitude)


def solinas_exponents(q: int) -> tuple[int, int] | None:
    """(a, b) with q = 2^a - 2^b + 1, or None if q is not of that form."""
    a = q.bit_length()
    for b in range(1, a):
        if (1 << a) - (1 << b) + 1 == q:
            return a, b
    return None


def _fold_terms(a: int, b: int, e: int) -> list[tuple[int, int]]:
    """2^e mod q as [(exponent, coeff)], all exponents < a, coeffs exact."""
    pend, out = [(e, 1)], {}
    while pend:
        ee, s = pend.pop()
        if ee < a:
            out[ee] = out.get(ee, 0) + s
        else:
            pend.append((ee - a + b, s))
            pend.append((ee - a, -s))
    return [(ee, c) for ee, c in sorted(out.items()) if c]


def _lane_terms(a: int, b: int, e: int) -> list[tuple[int, int]]:
    """Fold of one unit of weight 2^e into (dst_lane, signed coeff) pairs
    on the 16-bit digit grid."""
    return [(ee // 16, c * (1 << (ee % 16))) for ee, c in _fold_terms(a, b, e)]


def _pow2_shifts(terms: list[tuple[int, int]]) -> list[tuple[int, int, int]]:
    """(dst, coeff) pairs -> (dst, shift, sign) with coeff = Σ sign·2^shift
    (binary expansion of |coeff|, sign shared — exact for any coeff)."""
    out = []
    for dst, coeff in terms:
        sign = 1 if coeff > 0 else -1
        mag = abs(coeff)
        s = 0
        while mag:
            if mag & 1:
                out.append((dst, s, sign))
            mag >>= 1
            s += 1
    return out


class _FoldPlan:
    """Precomputed fold terms + exact worst-case bound verification for
    one (a, b, lane_max) configuration.  Raises ValueError if any i32/u32
    bound would be violated — callers treat that as 'not coverable'."""

    def __init__(self, a: int, b: int, lane_max: int, q: int):
        if not 48 <= a <= 62:
            raise ValueError("Solinas fold supports 48 <= a <= 62")
        self.a, self.b, self.q = a, b, q
        self.src_terms = {j: _lane_terms(a, b, 16 * j) for j in range(4, 8)}
        self.c8_terms = _lane_terms(a, b, 128)
        for terms in (*self.src_terms.values(), self.c8_terms):
            if any(dst > 3 or abs(c) >= (1 << 31) for dst, c in terms):
                raise ValueError("fold terms do not fit the 4-lane grid")
        # kernel emission works in shifts: decompose each coefficient into
        # signed powers of two (coeffs can be e.g. -2^23 from combined
        # duplicate exponents, or non-pow2 sums for other (a, b))
        self.src_shifts = {j: _pow2_shifts(t)
                           for j, t in self.src_terms.items()}
        self.c8_shifts = _pow2_shifts(self.c8_terms)

        # step 1: worst-case carry chain with every lane at +lane_max
        if lane_max >= _BIAS1:
            raise ValueError("carry-save lane bound exceeds the step-1 bias")
        c = 0
        for _ in range(8):
            t = lane_max + _BIAS1 + c
            if t >= 1 << 32:
                raise ValueError("step-1 digit overflows u32")
            c = t >> 16
        self.c8_max = c

        # step 2 bounds WITHOUT the constant correction digits yet (each
        # correction digit adds at most 2^16 - 1; fold it into vmax)
        vmax = [2 * 65535, 2 * 65535, 2 * 65535, 2 * 65535]
        vmin = [0, 0, 0, 0]
        for j, terms in self.src_terms.items():
            for dst, coeff in terms:
                if coeff > 0:
                    vmax[dst] += coeff * 65535
                else:
                    vmin[dst] += coeff * 65535
        for dst, coeff in self.c8_terms:
            if coeff > 0:
                vmax[dst] += coeff * self.c8_max
            else:
                vmin[dst] += coeff * self.c8_max

        # step-3 bias: smallest power of two covering the most negative
        # folded lane (2^24 for the shipped (60, 14); larger coefficients
        # from other (a, b) pairs raise it automatically)
        self.bias2 = max(_BIAS2, 1 << (-min(vmin)).bit_length())
        if any(v >= (1 << 31) - self.bias2 for v in vmax) or any(
            v <= -(1 << 31) for v in vmin
        ):
            raise ValueError("folded lane overflows i32")

        # constant corrections (negated bias totals mod q) as u16 digits
        bt = sum(_BIAS1 << (16 * j) for j in range(8)) + sum(
            self.bias2 << (16 * j) for j in range(4)
        )
        self.corr_cs = self._digits4((-bt) % q)
        self.corr_mul = self._digits4(
            (-sum(self.bias2 << (16 * j) for j in range(4))) % q
        )

        # step 3: worst-case carries
        c = 0
        for k in range(4):
            t = vmax[k] + self.bias2 + c
            if t >= 1 << 32:
                raise ValueError("step-3 digit overflows u32")
            c = t >> 16
        self.c4_max = c

        # final top fold: v = pair + v_top·(2^b - 1), computed pair-wide;
        # the result must stay below 2^64, below two q (one conditional
        # subtract), and — when the plan runs lazily (q inside
        # MxuPlan64._lazy_window) — inside the digit scan's 2^62 window
        vtop_max = ((1 << 32) - 1 >> (a - 32)) + (self.c4_max << (64 - a))
        add_max = vtop_max * ((1 << b) - 1)
        self.lazy_max = (1 << a) + add_max
        if self.lazy_max >= 2 * q:
            raise ValueError("fold output exceeds one conditional subtract")
        if self.lazy_max >= 1 << 62:
            raise ValueError("fold output exceeds the pair range")
        if q < (1 << 61) - (1 << 40) and self.lazy_max >= 1 << 61:
            raise ValueError("lazy representative exceeds the scan window")

    @staticmethod
    def _digits4(v: int) -> list[int]:
        assert v < 1 << 64
        return [(v >> (16 * j)) & 0xFFFF for j in range(4)]


class _DirectFoldPlan:
    """Fold variant that consumes the SIGNED carry-save lanes directly,
    skipping the depth-8 step-1 propagation.  Only feasible when the
    fold-amplified lane magnitudes fit i32 (true for the shipped (60, 14)
    at rows = 128, i.e. n <= 16384 — the headline size); the builder
    raises ValueError otherwise and the plan falls back to the staged
    fold.  The step-3 bias is 2^31, applied for free by the signed->
    unsigned wrap of the u32 cast."""

    def __init__(self, a: int, b: int, lane_max: int, q: int):
        if not 48 <= a <= 62:
            raise ValueError("Solinas fold supports 48 <= a <= 62")
        self.a, self.b, self.q = a, b, q
        self.src_terms = {j: _lane_terms(a, b, 16 * j) for j in range(4, 8)}
        for terms in self.src_terms.values():
            if any(dst > 3 for dst, _ in terms):
                raise ValueError("fold terms do not fit the 4-lane grid")
        self.src_shifts = {j: _pow2_shifts(t)
                           for j, t in self.src_terms.items()}

        bias = 1 << 31
        self.corr = _FoldPlan._digits4(
            (-sum(bias << (16 * j) for j in range(4))) % q
        )
        amp = [1, 1, 1, 1]
        for terms in self.src_terms.values():
            for dst, coeff in terms:
                amp[dst] += abs(coeff)
        vmax = [amp[k] * lane_max + 65535 for k in range(4)]
        if any(v >= bias for v in vmax):
            raise ValueError("direct fold lane overflows i32")
        c = 0
        for k in range(4):
            t = vmax[k] + bias + c
            if t >= 1 << 32:
                raise ValueError("direct-fold digit overflows u32")
            c = t >> 16
        self.c4_max = c
        vtop_max = ((1 << 32) - 1 >> (a - 32)) + (self.c4_max << (64 - a))
        lazy_max = (1 << a) + vtop_max * ((1 << b) - 1)
        if lazy_max >= min(2 * q, 1 << 62) or (
            q < (1 << 61) - (1 << 40) and lazy_max >= 1 << 61
        ):
            raise ValueError("direct-fold output exceeds its window")


def _lane_bound(n: int) -> int:
    """Exact worst-case |carry-save lane| for the 8-limb matmul at size n.

    Lane j receives (kernels/mxu64.py _matmul_mont): one even diagonal
    (|diag| <= D = nlimbs·contraction·128², balanced digits reach -128 so
    a digit product reaches 128², contraction <= nlimbs·rows), one odd
    diagonal's low byte shifted up ((diag & 0xFF) << 8 in [0, 65280]),
    and one odd diagonal's arithmetic-shift high part (|diag >> 8| <=
    D/256 + 1).  rows = max(n/128, 128)."""
    rows = max(n // LANES, LANES)
    d = 8 * rows * 128 * 128
    return d + ((1 << 16) - 256) + d // 256 + 1


class SolinasPlan64(MxuPlan64):
    """MxuPlan64 specialization for Solinas trinomials 2^a - 2^b + 1."""

    name = "pallas-sol64"
    nlimbs = 8
    #: diagonals reach byte offset 14 -> digit lanes 0..7 only
    cs_lanes = 8
    #: Pointwise strategy: ``True`` keeps spectra in the Montgomery-64
    #: domain (w2 carries 2^64, the exit matrices strip it — the scales
    #: ride the matmuls for free, exactly the mxu64 domain plan) so the
    #: variable·variable product is one mont_mul64; ``False`` keeps all
    #: tables plain and reduces the 128-bit product with the digit fold.
    #: Montgomery's three dependent wide multiplies pipeline better on
    #: the VPU than the fold's two serial carry propagations (measured:
    #: BENCH_NOTES.md round 2); both are bit-identical end-to-end.
    emul_montgomery = True
    #: ``True`` folds the SIGNED carry-save lanes directly (skipping the
    #: staged variant's depth-8 bias propagation) wherever the amplified
    #: bounds verify — n <= 16384 for the shipped (60, 14).
    direct_fold = True

    @classmethod
    def covers_q(cls, q: int, n: int) -> bool:
        """Cheap predicate: q is a trinomial whose fold bounds verify at
        size n (no table construction)."""
        ab = solinas_exponents(q)
        if ab is None or not 30 < q.bit_length() <= 62:
            return False
        try:
            _FoldPlan(ab[0], ab[1], _lane_bound(n), q)
        except ValueError:
            return False
        return True

    def _check_width(self, p: NttParams) -> None:
        if solinas_exponents(p.q) is None or not 30 < p.width <= 62:
            raise ValueError(
                "SolinasPlan64 requires q = 2^a - 2^b + 1 with 30 < a <= 62;"
                " use MxuPlan64 for generic q < 2^62"
            )

    def _domain_scales(self, q: int) -> tuple[int, int, int, int]:
        # the fold divides by nothing; under ``emul_montgomery`` the
        # spectrum-producing matrix carries 2^64 and the exit matrices
        # carry 2^-64 (the (r32, r160) slots of the base domain plan),
        # otherwise every table is plain-domain
        if self.emul_montgomery:
            r64 = pow(2, 64, q)
            return (pow(r64, q - 2, q), 1, 1, r64)
        return (1, 1, 1, 1)

    def __init__(self, p: NttParams):
        super().__init__(p)
        a, b = solinas_exponents(p.q)
        self._fold = _FoldPlan(a, b, _lane_bound(p.n), p.q)
        try:
            self._fold_direct = _DirectFoldPlan(a, b, _lane_bound(p.n), p.q)
        except ValueError:
            self._fold_direct = None

    # -- reducers -------------------------------------------------------

    def _redc96(self, words, final: bool = True):  # pragma: no cover
        raise NotImplementedError(
            "SolinasPlan64 is carry-save only (the u32-words REDC path "
            "assumes Montgomery domain scales)"
        )

    def _cond_sub_q(self, t_hi, t_lo):
        """One conditional subtract: [0, 2q) -> [0, q)."""
        q_lo = U32(self.q_lo)
        q_hi = U32(self.q_hi)
        ge = (t_hi > q_hi) | ((t_hi == q_hi) & (t_lo >= q_lo))
        new_lo = t_lo - q_lo
        borrow = (t_lo < q_lo).astype(U32)
        new_hi = t_hi - q_hi - borrow
        return (jnp.where(ge, new_hi, t_hi), jnp.where(ge, new_lo, t_lo))

    def _fold_digits(self, u, c8, corr, final: bool):
        """Steps 2-4 of the module docstring: u16 digits (+ top carry c8,
        + constant correction digits) -> (hi, lo) pair, [0, q) when
        ``final`` else the lazy representative < 2^a + 2^28."""
        f = self._fold
        v = [u[k].astype(I32) + I32(corr[k]) for k in range(4)]
        for j, shifts in f.src_shifts.items():
            uj = u[j].astype(I32)
            for dst, s, sign in shifts:
                v[dst] = v[dst] + (uj << s) if sign > 0 else v[dst] - (uj << s)
        if c8 is not None:
            c8i = c8.astype(I32)
            for dst, s, sign in f.c8_shifts:
                v[dst] = (v[dst] + (c8i << s) if sign > 0
                          else v[dst] - (c8i << s))

        u2, c = [], None
        for k in range(4):
            t = (v[k] + I32(f.bias2)).astype(U32)
            t = t if c is None else t + c
            u2.append(t & 0xFFFF)
            c = t >> 16
        return self._fold_tail(u2, c, f, final)

    def _fold_tail(self, u2, c4, f, final: bool):
        """Assemble the pair and fold the bits >= 2^a (incl. c4) via
        v_top·(2^b - 1), pair-wide; bounds verified at plan build."""
        lo = u2[0] | (u2[1] << 16)
        hi = u2[2] | (u2[3] << 16)
        vtop = (hi >> (f.a - 32)) + (c4 << (64 - f.a))
        hi60 = hi & U32((1 << (f.a - 32)) - 1)
        if f.b < 32:
            add_hi, add_lo = vtop >> (32 - f.b), vtop << f.b
        else:
            add_hi, add_lo = vtop << (f.b - 32), jnp.zeros_like(vtop)
        borrow = (add_lo < vtop).astype(U32)
        add_hi, add_lo = add_hi - borrow, add_lo - vtop
        lo2 = lo + add_lo
        hi2 = hi60 + add_hi + (lo2 < lo).astype(U32)
        if not final and self.lazy:
            return hi2, lo2
        return self._cond_sub_q(hi2, lo2)

    def _reduce_cs(self, d, final: bool):
        """Signed carry-save lanes -> value mod q.  Direct fold when its
        bounds verified at build (skips the depth-8 propagation);
        otherwise step 1 (bias-propagate to u16 digits) + staged fold."""
        fd = self._fold_direct if self.direct_fold else None
        if fd is not None:
            v = [d[k] + I32(fd.corr[k]) for k in range(4)]
            for j, shifts in fd.src_shifts.items():
                dj = d[j]
                for dst, s, sign in shifts:
                    v[dst] = (v[dst] + (dj << s) if sign > 0
                              else v[dst] - (dj << s))
            u2, c = [], None
            for k in range(4):
                # the u32 cast applies the 2^31 bias for free:
                # v + 2^31 = bit_pattern(v) + 2^31 (mod 2^32), exact
                # because -2^31 <= v < 2^31 keeps the sum in [0, 2^32)
                t = v[k].astype(U32) + U32(0x80000000)
                t = t if c is None else t + c
                u2.append(t & 0xFFFF)
                c = t >> 16
            return self._fold_tail(u2, c, fd, final)

        u, c = [], None
        for j in range(8):
            t = (d[j] + I32(_BIAS1)).astype(U32)
            t = t if c is None else t + c
            u.append(t & 0xFFFF)
            c = t >> 16
        return self._fold_digits(u, c, self._fold.corr_cs, final)

    # -- elementwise ----------------------------------------------------

    def _emul(self, x, table):
        """Variable·variable pointwise product.  Montgomery when the
        spectra carry the 2^64 domain factor (see ``emul_montgomery``);
        otherwise exact 128-bit word product + the same digit fold."""
        if self.emul_montgomery:
            return mont_mul64(x, table, self.q, self.q_prime64)
        w3, w2, w1, w0 = mul64_full(x, table)
        u = [w0 & 0xFFFF, w0 >> 16, w1 & 0xFFFF, w1 >> 16,
             w2 & 0xFFFF, w2 >> 16, w3 & 0xFFFF, w3 >> 16]
        return self._fold_digits(u, None, self._fold.corr_mul, False)
