"""RNS/CRT negacyclic polynomial multiplication for wide moduli (q >= 2^62).

The reference accelerator is parameterized up to WIDTH=60
(rtl/ntt_poly_mult.sv:15-28) and its report names wider moduli as the
domain of residue-number-system decomposition (the standard FHE practice).
This module is that extension, built the TPU way: the product mod a wide q
is assembled from negacyclic products modulo several small NTT-FRIENDLY
primes — each of which runs on the fused int8-MXU kernel via the normal
dispatch policy — and recombined by the Chinese Remainder Theorem.

Math.  Let c = a *_nwc b over the integers with inputs reduced mod q:
|c_i| <= n * (q-1)^2 in magnitude before sign wrapping; computing c mod
p_j for coprime p_j with P = prod p_j > 2 * n * (q-1)^2 determines the
INTEGER result exactly (balanced CRT representative), and therefore
c mod q for ANY q — q needs no NTT-friendly structure at all.

The per-prime transforms are where all the compute lives and they run
batched on device; the CRT recombination is exact big-int arithmetic on
the host (numpy object dtype) — O(n * k) cheap relative to the k
transforms.  Primes are drawn 24-bit NTT-friendly first (the fastest
kernel), falling back to 30-bit for very large operands.
"""

from __future__ import annotations

import functools
from typing import Sequence

import numpy as np

from . import dispatch
from .params import NttParams, _is_probable_prime, make_params


def ntt_friendly_primes(n: int, width: int, count: int,
                        below: int | None = None) -> list[int]:
    """The ``count`` largest primes p < 2^width with 2n | p - 1 (so a
    primitive 2n-th root exists; scripts/find_psi.py's existence
    condition)."""
    step = 2 * n
    out: list[int] = []
    start = ((below if below is not None else (1 << width)) - 2) // step
    for c in range(start, 0, -1):
        p = c * step + 1
        if p.bit_length() > width:
            continue
        if _is_probable_prime(p):
            out.append(p)
            if len(out) >= count:
                return out
    raise ValueError(f"not enough {width}-bit NTT primes for n={n}")


class RnsPlan:
    """Negacyclic product modulo an arbitrary q via RNS decomposition.

    ``moduli`` defaults to the smallest set of 24-bit NTT-friendly primes
    whose product exceeds 2*n*(q-1)^2 (the exact-integer-result bound).
    Each residue channel uses the standard dispatch policy, so 24-bit
    channels run on the fused MXU kernel.
    """

    def __init__(self, n: int, q: int, moduli: Sequence[int] | None = None,
                 prime_width: int = 24):
        self.n = n
        self.q = q
        bound = 2 * n * (q - 1) ** 2
        if moduli is None:
            moduli = []
            prod = 1
            below = None
            while prod <= bound:
                p = ntt_friendly_primes(n, prime_width, 1, below=below)[0]
                moduli.append(p)
                prod *= p
                below = p
        self.moduli = [int(m) for m in moduli]
        if len(set(self.moduli)) != len(self.moduli):
            raise ValueError("RNS moduli must be distinct")
        self.P = 1
        for m in self.moduli:
            self.P *= m
        if self.P <= bound:
            raise ValueError(
                f"prod(moduli) = {self.P} <= exactness bound {bound}"
            )
        self.params = [make_params(n, m) for m in self.moduli]
        # CRT reconstruction constants: e_j = (P/p_j) * ((P/p_j)^-1 mod p_j)
        self._crt_e = []
        for m in self.moduli:
            pj = self.P // m
            self._crt_e.append(pj * pow(pj % m, -1, m))

    def nwc_poly_mult(self, a, b) -> np.ndarray:
        """(B, n) arrays of residues mod q (object ints or uint64 when q
        fits) -> (B, n) object array of the negacyclic product mod q."""
        a_arr = np.asarray(a, dtype=object)
        b_arr = np.asarray(b, dtype=object)
        squeeze = a_arr.ndim == 1
        if squeeze:
            a_arr, b_arr = a_arr[None], b_arr[None]
        # residues fit uint64 only when the prime does; reduce with ints
        def residues(x, m):
            return np.frompyfunc(lambda v: int(v) % m, 1, 1)(x).astype(
                np.uint64
            )

        channels = []
        for p in self.params:
            mult = dispatch.best_nwc_poly_mult(p)
            am = residues(a_arr, p.q).astype(np.uint32)
            bm = residues(b_arr, p.q).astype(np.uint32)
            channels.append(np.asarray(mult(am, bm)))

        # Exact CRT on host: integer result in the BALANCED range
        # (-P/2, P/2], then reduced mod q.
        acc = np.zeros(a_arr.shape, dtype=object)
        for ch, e in zip(channels, self._crt_e):
            acc = acc + ch.astype(object) * e
        half = self.P >> 1

        def finish(v):
            v %= self.P
            if v > half:
                v -= self.P
            return v % self.q

        out = np.frompyfunc(finish, 1, 1)(acc)
        return out[0] if squeeze else out


@functools.lru_cache(maxsize=None)
def _cached_plan(n: int, q: int, prime_width: int) -> RnsPlan:
    return RnsPlan(n, q, prime_width=prime_width)


def nwc_poly_mult(n: int, q: int, a, b, prime_width: int = 24):
    """One-call negacyclic product mod an arbitrary modulus q (any width,
    no NTT-friendliness required)."""
    return _cached_plan(n, q, prime_width).nwc_poly_mult(a, b)
