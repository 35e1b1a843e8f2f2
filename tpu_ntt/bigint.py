"""Arbitrary-precision integer multiplication on the NTT kernels.

The classic application of number-theoretic transforms beyond lattice
cryptography: multiplying huge integers as limb-polynomial convolutions
(the small-prime RNS formulation — "three-prime NTT multiplication" —
rather than Schönhage–Strassen's ring of 2^K+1, which maps poorly to
fixed-width vector lanes).  The reference accelerator computes exactly
the convolution this needs but never exposes the application; here it is
a thin exact layer over the existing dispatch kernels, so a pair of
million-bit integers multiplies as one batched negacyclic product per
RNS channel on the MXU.

Math.  x = Σ x_i 2^(b·i) with limbs x_i < 2^b.  The limb polynomials'
product over Z gives z_k = Σ_{i+j=k} x_i y_j < L·(2^b−1)², where L is
the limb count; with both operands padded to n ≥ 2L the negacyclic wrap
never triggers (i + j ≤ 2L − 2 < n), so the ring's FAST path (the nwc
product) computes the plain convolution.  Each channel reduces z mod an
NTT-friendly prime; with prod(p_j) > L·(2^b−1)² the exact CRT exit
(rns.RnsRing.reconstruct_words, device-resident) recovers z_k as
integers, and the final carry assembly is four int.from_bytes
re-interpretations per 32-bit word plane:

    Σ_k z_k 2^(b·k) = Σ_planes 2^(16·p) · int.from_bytes(plane_p bytes)

— O(L) with a handful of big-int additions, no per-limb Python loop.

Bit-exactness oracle: Python's own ``x * y`` (tests/test_bigint.py).
"""

from __future__ import annotations

import numpy as np

from .rns import RnsRing, ntt_friendly_primes


def _next_pow2(v: int) -> int:
    return 1 << max(1, (v - 1).bit_length())


class BigMulPlan:
    """Reusable plan for products of integers up to ``max_bits`` bits.

    ``limb_bits`` must be 16 (the byte-aligned split the carry assembly
    exploits); the RNS basis is chosen so prod(p_j) exceeds the exact
    convolution bound L·(2^16−1)².  Construction cost is the per-channel
    dispatch plans (cached); ``mul_many`` batches B products of the SAME
    padded size — the shape the kernels want.
    """

    def __init__(self, max_bits: int, prime_width: int = 24):
        if max_bits < 1:
            raise ValueError("max_bits must be positive")
        self.limb_bits = 16
        self.max_bits = max_bits
        L = -(-max_bits // self.limb_bits)  # ceil
        self.L = L
        self.n = _next_pow2(2 * L)
        bound = L * ((1 << self.limb_bits) - 1) ** 2
        moduli: list[int] = []
        prod, below = 1, None
        while prod <= bound:
            try:
                m = ntt_friendly_primes(self.n, prime_width, 1,
                                        below=below)[0]
            except ValueError:
                # not enough primes at this width (large n eats the
                # 2-adicity budget): widen the basis primes
                prime_width += 6
                if prime_width > 30:
                    raise
                below = None
                moduli, prod = [], 1
                continue
            moduli.append(m)
            prod *= m
            below = m
        self.ring = RnsRing(self.n, moduli=moduli)

    # -- limb IO --------------------------------------------------------------
    def to_limbs(self, x: int) -> np.ndarray:
        """Nonnegative int -> (n,) uint32 array of base-2^16 limbs."""
        if x < 0:
            raise ValueError("operands must be nonnegative")
        if x.bit_length() > self.max_bits:
            raise ValueError(
                f"operand has {x.bit_length()} bits > plan max "
                f"{self.max_bits}")
        raw = x.to_bytes(2 * self.n, "little")
        return np.frombuffer(raw, dtype=np.uint16).astype(np.uint32)

    def _assemble(self, words: np.ndarray) -> int:
        """(n, nwords) uint32 coefficient words -> the integer
        Σ_k z_k 2^(16k), via word-plane byte reinterpretation."""
        total = 0
        for w in range(words.shape[-1]):
            col = np.ascontiguousarray(words[:, w])
            lo = (col & 0xFFFF).astype("<u2")
            hi = (col >> 16).astype("<u2")
            total += int.from_bytes(lo.tobytes(), "little") << (32 * w)
            total += int.from_bytes(hi.tobytes(), "little") << (32 * w + 16)
        return total

    # -- products -------------------------------------------------------------
    def mul_many(self, xs, ys) -> list[int]:
        """Batched exact products: [x_0*y_0, x_1*y_1, ...].

        One (B, n) negacyclic product per RNS channel (limbs < 2^16 are
        already reduced in every channel, so the SAME device array feeds
        all of them), one exact device CRT exit, O(L) host assembly."""
        if len(xs) != len(ys):
            raise ValueError("operand lists must have equal length")
        a = np.stack([self.to_limbs(x) for x in xs])
        b = np.stack([self.to_limbs(y) for y in ys])
        k = len(self.ring.moduli)
        prod = self.ring.nwc_mult([a] * k, [b] * k)
        words = np.asarray(self.ring.reconstruct_words(prod))
        return [self._assemble(words[i]) for i in range(len(xs))]

    def mul(self, x: int, y: int) -> int:
        return self.mul_many([x], [y])[0]


def mul(x: int, y: int, prime_width: int = 24) -> int:
    """One-shot exact product of two nonnegative Python ints on the NTT
    path (plans are cheap to rebuild but reuse BigMulPlan for loops)."""
    bits = max(x.bit_length(), y.bit_length(), 1)
    return BigMulPlan(bits, prime_width=prime_width).mul(x, y)
