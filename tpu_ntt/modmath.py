"""Exact modular arithmetic on TPU 32-bit vector hardware.

The TPU VPU is a 32-bit machine: there is no native 64-bit integer multiply
(XLA emulates int64 slowly, and Pallas/Mosaic does not support it at all).
This module builds exact wide arithmetic from uint32 lanes:

* ``mul32``      — exact 32x32 -> 64 via 16-bit half-word partial products.
* single-word Barrett / Montgomery for q < 2^30 (the 24-bit path; reference
  algorithm: rtl/barrett_mult.v:36-62, rtl/montgomery_reduction.v:22-26,
  constants from scripts/precompute_constants.py:30-111).
* double-word (u64 as a (hi, lo) uint32 pair) Barrett / Montgomery for
  q < 2^62 (the 60-bit path; reference: rtl/ntt_poly_mult.sv:18-24 60-bit
  parameters, software_benchmark/benchmark_ntt_60bit.cpp uses __int128 —
  here replaced by 32-bit limb algebra that also runs inside Pallas).

Every function is pure jnp on uint32 arrays, so it traces identically under
jit, vmap, shard_map and inside Pallas kernel bodies.  All shift amounts are
Python ints (static), so XLA sees only constant shifts.

The ``Ring32`` / ``Ring64`` classes bind an ``NttParams`` to a uniform
element interface used by the transform code: a Ring32 element is one uint32
array; a Ring64 element is a ``(hi, lo)`` tuple of uint32 arrays.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .params import NttParams, Reduction

_MASK16 = 0xFFFF

U32 = jnp.uint32
Pair = Tuple[jnp.ndarray, jnp.ndarray]  # (hi, lo) uint32


# --------------------------------------------------------------------------
# 32-bit primitives
# --------------------------------------------------------------------------


def mul32(a: jnp.ndarray, b: jnp.ndarray) -> Pair:
    """Exact 32x32 -> 64 multiply: returns (hi, lo) uint32.

    Half-word decomposition; every partial product and partial sum is proven
    < 2^32, so uint32 wrap-around never loses information:
      ll <= (2^16-1)^2 < 2^32
      mid = lh + (ll>>16) + (hl & 0xffff) <= (2^16-1)^2 + 2*(2^16-1) = 2^32-1
    """
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    mid = lh + (ll >> 16) + (hl & _MASK16)
    lo = (mid << 16) | (ll & _MASK16)
    hi = hh + (hl >> 16) + (mid >> 16)
    return hi, lo


def addc32(a: jnp.ndarray, b: jnp.ndarray) -> Pair:
    """a + b with carry-out: returns (sum, carry) where carry in {0, 1}."""
    s = a + b
    return s, (s < a).astype(U32)


def shr64(hi: jnp.ndarray, lo: jnp.ndarray, s: int) -> Pair:
    """Logical right shift of a 64-bit (hi, lo) pair by static 0 <= s < 64."""
    if s == 0:
        return hi, lo
    if s < 32:
        return hi >> s, (lo >> s) | (hi << (32 - s))
    if s == 32:
        return jnp.zeros_like(hi), hi
    return jnp.zeros_like(hi), hi >> (s - 32)


# --------------------------------------------------------------------------
# Single-word modular ops (q < 2^30)
# --------------------------------------------------------------------------


def add_mod32(a: jnp.ndarray, b: jnp.ndarray, q: int) -> jnp.ndarray:
    """(a + b) mod q for a, b in [0, q), q < 2^31 (rtl/mod_add.v semantics)."""
    s = a + b
    return jnp.where(s >= q, s - q, s)


def sub_mod32(a: jnp.ndarray, b: jnp.ndarray, q: int) -> jnp.ndarray:
    """(a - b) mod q for a, b in [0, q) (rtl/mod_sub.v semantics)."""
    return jnp.where(a >= b, a - b, a + U32(q) - b)


def barrett_mul32(a: jnp.ndarray, b: jnp.ndarray, q: int, k: int, mu: int) -> jnp.ndarray:
    """(a * b) mod q via Barrett, q < 2^30 (k = bitlen(q) <= 30).

    q1 = p >> (k-1); q2 = (q1 * mu) >> (k+1); r = p - q2*q; r -= q while r>=q.
    The estimate error is < 3q, so two conditional subtractions suffice
    (reference does one, rtl/barrett_mult.v:55-62, valid for its operand
    range; two is always-safe and costs one extra select).
    """
    hi, lo = mul32(a, b)
    _, q1 = shr64(hi, lo, k - 1)  # q1 < 2^(k+1) <= 2^31, fits one word
    mhi, mlo = mul32(q1, U32(mu))
    _, q2 = shr64(mhi, mlo, k + 1)  # q2 < 2^(k+1)
    r = lo - q2 * U32(q)  # exact: true r < 3q < 2^32
    r = jnp.where(r >= 2 * q, r - U32(2 * q), r)
    return jnp.where(r >= q, r - U32(q), r)


def shoup_mul32(a: jnp.ndarray, w: jnp.ndarray, w_shoup: jnp.ndarray,
                q: int) -> jnp.ndarray:
    """(a * w) mod q with w constant and w' = floor(w * 2^32 / q) precomputed.

    r = a*w - floor(a*w' / 2^32)*q lies in [0, 2q) (Shoup/NTL; needs
    q < 2^31), computed entirely in low 32-bit words — cheaper than Barrett
    or Montgomery because only ONE widening multiply (for the high word of
    a*w') is needed.
    """
    t_hi, _ = mul32(a, w_shoup)
    r = a * w - t_hi * U32(q)  # wrapping; true r < 2q < 2^32 so exact
    return jnp.where(r >= q, r - U32(q), r)


def shoup_mul64_lazy(a: Pair, w: Pair, w_shoup: Pair, q: int) -> Pair:
    """64-bit Shoup multiply WITHOUT the final conditional subtract.

    Returns the lazy representative r = a*w - floor(a*w'/2^64)*q in
    [0, 2q), exact for ANY a < 2^64 (the floor estimate is off by at most
    one for a < 2^64, independent of a's reduction state — so lazy < 2q
    inputs are fine).  Consumers that tolerate < 2q (the balanced-digit
    matmul scan of kernels/mxu64.py) skip the compare+select entirely."""
    t3, t2, _, _ = mul64_full(a, w_shoup)  # floor(a*w' / 2^64)
    aw = mul64_lo(a, w)
    tq = mul64_lo((t3, t2), const64(q, a[1]))
    return sub64(aw, tq)  # true r < 2q < 2^63: wrapping-exact


def shoup_mul64(a: Pair, w: Pair, w_shoup: Pair, q: int) -> Pair:
    """64-bit Shoup multiply: (a * w) mod q, q < 2^62, w' = floor(w*2^64/q)."""
    r = shoup_mul64_lazy(a, w, w_shoup, q)
    qq = const64(q, a[1])
    return select64(ge64(r, qq), sub64(r, qq), r)


def mont_mul32(a: jnp.ndarray, b: jnp.ndarray, q: int, q_prime: int) -> jnp.ndarray:
    """REDC(a * b) = a*b*R^-1 mod q with R = 2^32, q < 2^31.

    m = (T mod R) * q' mod R; t = (T + m*q) / R; conditional subtract
    (rtl/montgomery_reduction.v:22-26 with word-aligned R).
    """
    t_hi, t_lo = mul32(a, b)
    m = t_lo * U32(q_prime)
    mq_hi, _ = mul32(m, U32(q))
    # low 64 bits of T + m*q are ≡ 0 mod 2^32; carry-out is 1 iff t_lo != 0.
    t = t_hi + mq_hi + (t_lo != 0).astype(U32)
    return jnp.where(t >= q, t - U32(q), t)


# --------------------------------------------------------------------------
# Double-word (64-bit as uint32 pair) ops
# --------------------------------------------------------------------------


def ge64(a: Pair, b: Pair) -> jnp.ndarray:
    return (a[0] > b[0]) | ((a[0] == b[0]) & (a[1] >= b[1]))


def add64(a: Pair, b: Pair) -> Pair:
    lo, c = addc32(a[1], b[1])
    return a[0] + b[0] + c, lo


def sub64(a: Pair, b: Pair) -> Pair:
    lo = a[1] - b[1]
    borrow = (a[1] < b[1]).astype(U32)
    return a[0] - b[0] - borrow, lo


def select64(pred: jnp.ndarray, t: Pair, f: Pair) -> Pair:
    return jnp.where(pred, t[0], f[0]), jnp.where(pred, t[1], f[1])


def const64(v: int, like: jnp.ndarray) -> Pair:
    hi = jnp.full_like(like, (v >> 32) & 0xFFFFFFFF)
    lo = jnp.full_like(like, v & 0xFFFFFFFF)
    return hi, lo


def add_mod64(a: Pair, b: Pair, q: int) -> Pair:
    """(a + b) mod q for a, b in [0, q), q < 2^62 (no 64-bit overflow)."""
    s = add64(a, b)
    qq = const64(q, a[1])
    return select64(ge64(s, qq), sub64(s, qq), s)


def sub_mod64(a: Pair, b: Pair, q: int) -> Pair:
    d = sub64(a, b)
    qq = const64(q, a[1])
    return select64(ge64(a, b), d, add64(d, qq))


def mul64_full(a: Pair, b: Pair) -> Tuple[jnp.ndarray, ...]:
    """Exact 64x64 -> 128: returns 4 uint32 words (w3, w2, w1, w0), w0 = LSW."""
    a1, a0 = a
    b1, b0 = b
    h00, l00 = mul32(a0, b0)
    h01, l01 = mul32(a0, b1)
    h10, l10 = mul32(a1, b0)
    h11, l11 = mul32(a1, b1)
    w0 = l00
    s1, c1 = addc32(h00, l01)
    s1, c2 = addc32(s1, l10)
    w1 = s1
    s2, d1 = addc32(l11, h01)
    s2, d2 = addc32(s2, h10)
    s2, d3 = addc32(s2, c1 + c2)
    w2 = s2
    w3 = h11 + d1 + d2 + d3  # h11 <= (2^16-1)^2, + 3 carries: no overflow
    return w3, w2, w1, w0


def mul64_lo(a: Pair, b: Pair) -> Pair:
    """Low 64 bits of a * b (wrapping)."""
    a1, a0 = a
    b1, b0 = b
    h00, l00 = mul32(a0, b0)
    return h00 + a0 * b1 + a1 * b0, l00


def shr128_to_64(w: Tuple[jnp.ndarray, ...], s: int) -> Pair:
    """(w3:w2:w1:w0) >> s as a 64-bit pair, for static 0 <= s < 96.

    Caller guarantees the true shifted value fits in 64 bits.
    """
    w3, w2, w1, w0 = w
    words = [w0, w1, w2, w3, jnp.zeros_like(w0), jnp.zeros_like(w0)]
    ws, bs = divmod(s, 32)
    if bs == 0:
        return words[ws + 1], words[ws]
    lo = (words[ws] >> bs) | (words[ws + 1] << (32 - bs))
    hi = (words[ws + 1] >> bs) | (words[ws + 2] << (32 - bs))
    return hi, lo


def mont_mul64(a: Pair, b: Pair, q: int, q_prime: int) -> Pair:
    """REDC(a * b) = a*b*R^-1 mod q with R = 2^64, q < 2^62.

    T = a*b; m = (T mod R) * q' mod R; t = (T + m*q) >> 64; cond. subtract.
    t < q^2/R + q < 2q so one subtraction suffices.
    """
    t3, t2, t1, t0 = mul64_full(a, b)
    m = mul64_lo((t1, t0), const64(q_prime, a[1]))
    mq3, mq2, mq1, mq0 = mul64_full(m, const64(q, a[1]))
    # Low 64 bits of T + m*q are ≡ 0 (mod 2^64); we only need the carry out.
    s0, c0 = addc32(t0, mq0)
    s1, c1a = addc32(t1, mq1)
    s1b, c1b = addc32(s1, c0)
    carry_lo = c1a + c1b  # in {0, 1}: s1 chain can carry at most once total
    r_lo, e0 = addc32(t2, mq2)
    r_lo2, e1 = addc32(r_lo, carry_lo)
    r_hi = t3 + mq3 + e0 + e1
    t = (r_hi, r_lo2)
    qq = const64(q, a[1])
    return select64(ge64(t, qq), sub64(t, qq), t)


# --------------------------------------------------------------------------
# Host-side encode / decode
# --------------------------------------------------------------------------


def encode32(values: Sequence[int]) -> np.ndarray:
    return np.asarray(values, dtype=np.uint32)


def decode32(arr) -> list:
    return [int(v) for v in np.asarray(arr).reshape(-1)]


def encode64(values: Sequence[int]) -> Tuple[np.ndarray, np.ndarray]:
    vals = [int(v) for v in values]
    hi = np.asarray([v >> 32 for v in vals], dtype=np.uint32)
    lo = np.asarray([v & 0xFFFFFFFF for v in vals], dtype=np.uint32)
    return hi, lo


def decode64(hi, lo) -> list:
    hi = np.asarray(hi, dtype=np.uint64).reshape(-1)
    lo = np.asarray(lo, dtype=np.uint64).reshape(-1)
    return [int(h) << 32 | int(l) for h, l in zip(hi, lo)]


# --------------------------------------------------------------------------
# Ring abstraction
# --------------------------------------------------------------------------


class Ring32:
    """Z_q with q < 2^30; elements are single uint32 arrays."""

    nlimbs = 1

    def __init__(self, p: NttParams, reduction: Reduction = Reduction.SHOUP):
        if p.width > 30:
            raise ValueError("Ring32 requires q < 2^30; use Ring64")
        self.p = p
        self.q = p.q
        self.reduction = reduction

    # -- element algebra ----------------------------------------------------
    def add(self, a, b):
        return add_mod32(a, b, self.q)

    def sub(self, a, b):
        return sub_mod32(a, b, self.q)

    def mul(self, a, b):
        """Standard-domain product (both operands in standard domain)."""
        if self.reduction is Reduction.MONTGOMERY:
            ab_r_inv = mont_mul32(a, b, self.q, self.p.mont_q_prime)
            r2 = jnp.full_like(a, self.p.mont_r2_mod_q)
            return mont_mul32(ab_r_inv, r2, self.q, self.p.mont_q_prime)
        return barrett_mul32(a, b, self.q, self.p.barrett_k, self.p.barrett_mu)

    def mul_tw(self, a, tw):
        """Product with a precomputed twiddle (encoded via encode_tw)."""
        if self.reduction is Reduction.SHOUP:
            return shoup_mul32(a, tw[0], tw[1], self.q)
        if self.reduction is Reduction.MONTGOMERY:
            return mont_mul32(a, tw, self.q, self.p.mont_q_prime)
        return barrett_mul32(a, tw, self.q, self.p.barrett_k, self.p.barrett_mu)

    # -- structure ------------------------------------------------------------
    def select(self, pred, t, f):
        return jnp.where(pred, t, f)

    def full_like(self, ref, v: int):
        return jnp.full_like(ref, v)

    # -- host encode / decode -------------------------------------------------
    def encode(self, values: Sequence[int]):
        return encode32(values)

    def encode_tw(self, values: Sequence[int]):
        """Twiddle encoding.  Montgomery stores tw * R mod q so that
        mont_mul(a, tw_enc) returns a*tw in standard domain directly; Shoup
        stores the (w, floor(w * 2^32 / q)) pair."""
        if self.reduction is Reduction.SHOUP:
            w = encode32(values)
            ws = encode32([(int(v) << 32) // self.q for v in values])
            return (w, ws)
        if self.reduction is Reduction.MONTGOMERY:
            values = [self.p.to_mont(v) for v in values]
        return encode32(values)

    def decode(self, arr) -> list:
        return decode32(arr)


class Ring64:
    """Z_q with q < 2^62; elements are (hi, lo) uint32 pairs."""

    nlimbs = 2

    def __init__(self, p: NttParams, reduction: Reduction = Reduction.SHOUP):
        self.p = p
        self.q = p.q
        if reduction is Reduction.SIMPLE:
            reduction = Reduction.BARRETT
        self.reduction = reduction
        # Montgomery constants for THIS ring's word size (R = 2^64).  For
        # 31-bit moduli NttParams derives its constants for R = 2^32
        # (mont_bits picks the narrower word), but mont_mul64 always reduces
        # by 2^64 — using the params constants there would silently corrupt
        # products, so recompute locally when the widths disagree.
        if p.mont_bits == 64:
            self._q_prime64 = p.mont_q_prime
            self._r2_mod_q64 = p.mont_r2_mod_q
        else:
            self._q_prime64 = (-pow(self.q, -1, 1 << 64)) % (1 << 64)
            self._r2_mod_q64 = pow(1 << 64, 2, self.q)

    def add(self, a, b):
        return add_mod64(a, b, self.q)

    def sub(self, a, b):
        return sub_mod64(a, b, self.q)

    def _barrett(self, a, b):
        p = self.p
        prod = mul64_full(a, b)
        q1 = shr128_to_64(prod, p.barrett_k - 1)
        q1mu = mul64_full(q1, const64(p.barrett_mu, a[1]))
        q2 = shr128_to_64(q1mu, p.barrett_k + 1)
        q2q = mul64_lo(q2, const64(self.q, a[1]))
        r = sub64((prod[2], prod[3]), q2q)  # low 64 bits of p, minus q2*q
        qq = const64(self.q, a[1])
        r = select64(ge64(r, add64(qq, qq)), sub64(r, add64(qq, qq)), r)
        return select64(ge64(r, qq), sub64(r, qq), r)

    def mul(self, a, b):
        if self.reduction in (Reduction.MONTGOMERY, Reduction.SHOUP):
            # Shoup applies only to constant operands; variable*variable
            # products (pointwise) use Montgomery double-REDC.
            qp = self._q_prime64
            ab_r_inv = mont_mul64(a, b, self.q, qp)
            r2 = const64(self._r2_mod_q64, a[1])
            return mont_mul64(ab_r_inv, r2, self.q, qp)
        return self._barrett(a, b)

    def mul_tw(self, a, tw):
        if self.reduction is Reduction.SHOUP:
            return shoup_mul64(a, tw[0], tw[1], self.q)
        if self.reduction is Reduction.MONTGOMERY:
            return mont_mul64(a, tw, self.q, self._q_prime64)
        return self._barrett(a, tw)

    def select(self, pred, t, f):
        return select64(pred, t, f)

    def full_like(self, ref, v: int):
        return const64(v, ref[1])

    def encode(self, values: Sequence[int]):
        return encode64(values)

    def encode_tw(self, values: Sequence[int]):
        if self.reduction is Reduction.SHOUP:
            w = encode64(values)
            ws = encode64([(int(v) << 64) // self.q for v in values])
            return (w, ws)
        if self.reduction is Reduction.MONTGOMERY:
            # This ring's domain is R = 2^64 regardless of p.mont_bits.
            values = [(int(v) << 64) % self.q for v in values]
        return encode64(values)

    def decode(self, arr) -> list:
        return decode64(arr[0], arr[1])


GOLDILOCKS_Q = (1 << 64) - (1 << 32) + 1


def goldilocks_reduce128(w3: jnp.ndarray, w2: jnp.ndarray, w1: jnp.ndarray,
                         w0: jnp.ndarray) -> Pair:
    """Reduce a 128-bit value (four uint32 words, LSW last arg order
    (w3, w2, w1, w0)) modulo the Goldilocks prime q = 2^64 - 2^32 + 1.

    Uses 2^96 ≡ -1 and 2^64 ≡ 2^32 - 1 (mod q): with t = a*2^96 + b*2^64
    + c (a = w3, b = w2, c = (w1, w0)),  t ≡ c - a + b*(2^32 - 1).
    Constant shifts and uint32 limb arithmetic only — the same VPU budget
    class as one Montgomery step, far cheaper than a generic 64-bit
    Barrett; this is why the Goldilocks modulus gets a dedicated ring.
    """
    q_hi = U32((GOLDILOCKS_Q >> 32) & 0xFFFFFFFF)
    q_lo = U32(GOLDILOCKS_Q & 0xFFFFFFFF)
    qq = (jnp.broadcast_to(q_hi, w0.shape).astype(U32),
          jnp.broadcast_to(q_lo, w0.shape).astype(U32))

    # r = c - a  (a < 2^32 <= q: one conditional +q)
    a64 = (jnp.zeros_like(w3), w3)
    c = (w1, w0)
    borrow = ~ge64(c, a64)
    r = sub64(c, a64)
    r = select64(borrow, add64(r, qq), r)

    # s = b * (2^32 - 1) = (b << 32) - b  as an exact 64-bit value
    s_lo = (jnp.zeros_like(w2) - w2)
    s_hi = w2 - (w2 != 0).astype(U32)
    s = (s_hi, s_lo)

    # r + s may carry out of 64 bits; carry represents 2^64 ≡ 2^32 - 1.
    t = add64(r, s)
    carry = (t[0] < r[0]) | ((t[0] == r[0]) & (t[1] < r[1]))
    wrap = (jnp.zeros_like(w0), U32(0xFFFFFFFF) & jnp.full_like(w0, 0))
    # add (2^32 - 1) when carried: hi += 0, lo/hi via add64 of (0, 2^32-1)
    fix = (jnp.zeros_like(w0), jnp.full_like(w0, 0xFFFFFFFF))
    del wrap
    t = select64(carry, add64(t, fix), t)
    # adding 2^32-1 < q cannot carry again past 2^64 after the wrap
    # (t_wrapped < 2q - 2^64 + 2^32 < 2^63); two conditional subtracts
    for _ in range(2):
        t = select64(ge64(t, qq), sub64(t, qq), t)
    return t


def goldilocks_mul(a: Pair, b: Pair) -> Pair:
    """(a * b) mod the Goldilocks prime, exact for a, b in [0, q)."""
    w3, w2, w1, w0 = mul64_full(a, b)
    return goldilocks_reduce128(w3, w2, w1, w0)


class GoldilocksRing(Ring64):
    """Z_q for the Goldilocks prime q = 2^64 - 2^32 + 1 (width 64).

    Ring64's generic paths assume q < 2^62 (headroom for 64-bit adds and
    Shoup's 2q bound), so this ring overrides the arithmetic with the
    special-form reduction; elements remain (hi, lo) uint32 pairs and the
    XLA transform paths (ntt.py) work unchanged.  Widely used by
    STARK/zk systems; requested as the round-2 breadth item
    (VERDICT.md next #8).
    """

    def __init__(self, p: NttParams, reduction: Reduction | None = None):
        if p.q != GOLDILOCKS_Q:
            raise ValueError("GoldilocksRing requires q = 2^64 - 2^32 + 1")
        self.p = p
        self.q = p.q
        self.reduction = Reduction.SIMPLE  # dedicated reduction, no mux

    def add(self, a, b):
        s = add64(a, b)
        carried = (s[0] < a[0]) | ((s[0] == a[0]) & (s[1] < a[1]))
        qq = const64(self.q, a[1])
        over = carried | ge64(s, qq)
        return select64(over, sub64(s, qq), s)

    def sub(self, a, b):
        d = sub64(a, b)
        qq = const64(self.q, a[1])
        return select64(ge64(a, b), d, add64(d, qq))

    def mul(self, a, b):
        return goldilocks_mul(a, b)

    def mul_tw(self, a, tw):
        return goldilocks_mul(a, tw)

    def encode_tw(self, values: Sequence[int]):
        return encode64(values)


def make_ring(p: NttParams, reduction: Reduction | None = None):
    """Pick the natural ring for a parameter set (width <= 30 -> Ring32).

    Default backend is SHOUP: measured fastest on TPU for the twiddle
    multiplies that dominate every transform (one widening multiply per
    modmul instead of Barrett's two / Montgomery's three).
    """
    if p.q == GOLDILOCKS_Q:
        return GoldilocksRing(p)
    if p.width <= 30:
        return Ring32(p, reduction or Reduction.SHOUP)
    if p.width > 62:
        raise ValueError(
            f"{p.width}-bit modulus exceeds the 62-bit double-word ring; "
            "use tpu_ntt.rns for wide moduli (or the Goldilocks prime)"
        )
    return Ring64(p, reduction or Reduction.SHOUP)
