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


class RnsRing:
    """Z_q with q = p_1 * ... * p_k an RNS-basis product — the FHE-native
    form (RNS-CKKS/BGV practice: the ciphertext modulus IS a product of
    word-sized NTT-friendly primes, so EVERY ring operation is exact
    independent per-channel arithmetic and values never leave the residue
    representation between operations).

    This is the production counterpart of :class:`RnsPlan` (which computes
    one integer convolution under an arbitrary external q and recombines
    per call): here residues are device arrays, products/additions chain
    indefinitely on device (each channel on its own dispatched kernel —
    24-bit channels ride the fused int8-MXU path), and the CRT exit runs
    ON DEVICE (:meth:`reconstruct_words`) as exact uint32 multiword
    arithmetic — no host big-int in the loop, closing the round-2 finding
    that recombination was host-bound (BENCH_NOTES.md round 2).

    Device reconstruction math: with y_j = c_j * (q/p_j)^-1 mod p_j,
    the canonical representative satisfies  sum_j y_j * (q/p_j) = c + k*q
    with 0 <= k < #channels.  k is estimated as floor(sum y_j / p_j) in
    float32 (absolute error < 2e-6 for <= 64 channels, so k_est is within
    +-1 of k), and the estimate is made EXACT by computing
    T = sum_j y_j*E_j + q - k_est*q  in multiword uint32 (T in [0, 3q)
    guaranteed) followed by two conditional multiword subtracts of q.
    Everything else is mul32/carry chains — integer-exact.
    """

    def __init__(self, n: int, moduli: Sequence[int] | None = None,
                 channels: int = 6, prime_width: int = 24):
        self.n = n
        if moduli is None:
            moduli = []
            below = None
            for _ in range(channels):
                m = ntt_friendly_primes(n, prime_width, 1, below=below)[0]
                moduli.append(m)
                below = m
        self.moduli = [int(m) for m in moduli]
        if len(set(self.moduli)) != len(self.moduli):
            raise ValueError("RNS moduli must be distinct")
        self.q = 1
        for m in self.moduli:
            self.q *= m
        self.params = [make_params(n, m) for m in self.moduli]
        # per-channel CRT constants: E_j = q/p_j (exact), inv_j = E_j^-1
        # mod p_j; E_j's uint32 word decomposition for the device combine
        self.nwords = (self.q.bit_length() + 31) // 32
        self._acc_words = self.nwords + 1  # sum < #ch * 2^w * q < 2^32 * q
        self._E = [self.q // m for m in self.moduli]
        self._inv = [pow(e % m, -1, m) for e, m in zip(self._E, self.moduli)]
        self._E_words = np.array(
            [[(e >> (32 * w)) & 0xFFFFFFFF for w in range(self._acc_words)]
             for e in self._E], dtype=np.uint32,
        )
        self._q_words = np.array(
            [(self.q >> (32 * w)) & 0xFFFFFFFF
             for w in range(self._acc_words)], dtype=np.uint32,
        )

    # -- host IO -------------------------------------------------------------
    def encode(self, x) -> list[np.ndarray]:
        """Host values (object ints / uint64, any shape) -> per-channel
        residue arrays (uint32 each)."""
        arr = np.asarray(x, dtype=object)
        return [
            np.frompyfunc(lambda v, m=m: int(v) % m, 1, 1)(arr)
            .astype(np.uint64).astype(np.uint32)
            for m in self.moduli
        ]

    def decode(self, residues) -> np.ndarray:
        """Host big-int CRT (the IO path; device chains should exit via
        reconstruct_words instead)."""
        acc = np.zeros(np.asarray(residues[0]).shape, dtype=object)
        for r, e, inv, m in zip(residues, self._E, self._inv, self.moduli):
            y = np.asarray(r).astype(np.uint64).astype(object) * inv % m
            acc = acc + y * e
        return np.frompyfunc(lambda v: v % self.q, 1, 1)(acc)

    # -- device ring ops (residue lists in, residue lists out) ---------------
    def nwc_mult(self, a, b) -> list:
        """Negacyclic product in Z_q[x]/(x^n + 1): exact per-channel fused
        products, chainable indefinitely (q = prod p_j, so per-channel
        reduction IS reduction mod q)."""
        return [dispatch.best_nwc_poly_mult(p)(ra, rb)
                for p, ra, rb in zip(self.params, a, b)]

    def add(self, a, b) -> list:
        import jax.numpy as jnp

        return [
            jnp.where(s >= p.q, s - np.uint32(p.q), s)
            for p, s in ((p, jnp.asarray(ra) + jnp.asarray(rb))
                         for p, ra, rb in zip(self.params, a, b))
        ]

    def sub(self, a, b) -> list:
        import jax.numpy as jnp

        out = []
        for p, ra, rb in zip(self.params, a, b):
            ra, rb = jnp.asarray(ra), jnp.asarray(rb)
            out.append(jnp.where(ra >= rb, ra - rb,
                                 ra + np.uint32(p.q) - rb))
        return out

    # -- device CRT exit ------------------------------------------------------
    def reconstruct_words(self, residues):
        """Exact on-device CRT: residues -> canonical c in [0, q) as a
        (..., nwords) uint32 little-endian word array.

        Pure uint32 multiword arithmetic; the single float32 k-estimate is
        made exact by construction (T = sum + q - k_est*q lies in [0, 3q)
        for k_est within +-1 of the true k, then two conditional multiword
        subtracts land in [0, q)).  Bit-exact vs :meth:`decode`
        (tests/test_rns.py)."""
        import jax
        import jax.numpy as jnp

        from .modmath import barrett_mul32, mul32

        U32 = jnp.uint32
        W = self._acc_words
        E_words = self._E_words
        q_words = [int(v) for v in self._q_words]
        params = self.params
        invs = self._inv
        nch = len(params)

        def add_at(acc, val, w0):
            """acc += val << (32*w0), exact ripple (in-place on the list).

            Wrap detection: s = a + c wraps iff s < a (for c >= 0)."""
            c = val
            for i in range(w0, W):
                s = acc[i] + c
                c = (s < acc[i]).astype(U32)
                acc[i] = s

        @jax.jit
        def rec(*res):
            # y_j = c_j * (q/p_j)^-1 mod p_j (single-word Barrett)
            ys = [
                barrett_mul32(r, jnp.full_like(r, inv), p.q,
                              p.barrett_k, p.barrett_mu)
                for r, inv, p in zip(res, invs, params)
            ]
            # k = floor(sum y_j / p_j) up to +-1 (f32 abs error < 2e-6;
            # y_j < 2^24 is exactly representable in f32)
            s = sum(y.astype(jnp.float32) * np.float32(1.0 / p.q)
                    for y, p in zip(ys, params))
            k_est = jnp.clip(jnp.floor(s), 0, nch).astype(U32)

            zero = jnp.zeros_like(res[0])
            # T = q + sum_j y_j * E_j   (init +q covers k_est = k + 1)
            acc = [jnp.broadcast_to(jnp.uint32(qw), res[0].shape)
                   for qw in q_words]
            for y, ew in zip(ys, E_words):
                for w in range(W):
                    if int(ew[w]) == 0:
                        continue
                    hi, lo = mul32(y, jnp.full_like(y, int(ew[w])))
                    add_at(acc, lo, w)
                    if w + 1 < W:
                        add_at(acc, hi, w + 1)

            # m = k_est * q (k_est < 2^6: word products + ripple)
            m = [zero] * W
            for w in range(W):
                if q_words[w] == 0:
                    continue
                hi, lo = mul32(k_est, jnp.full_like(k_est, q_words[w]))
                add_at(m, lo, w)
                if w + 1 < W:
                    add_at(m, hi, w + 1)

            # T -= m (multiword borrow chain; borrow in {0, 1} each step)
            borrow = zero
            for w in range(W):
                sub = m[w] + borrow
                bw = (sub < borrow).astype(U32)  # wrap: m[w]=2^32-1, b=1
                t = acc[w] - sub
                borrow = bw + (acc[w] < sub).astype(U32)
                acc[w] = t

            # two conditional subtracts of q: T in [0, 3q) -> [0, q)
            for _ in range(2):
                gt = jnp.zeros_like(res[0], dtype=jnp.bool_)
                eq = jnp.ones_like(res[0], dtype=jnp.bool_)
                for w in range(W - 1, -1, -1):
                    qw = jnp.uint32(q_words[w])
                    gt = gt | (eq & (acc[w] > qw))
                    eq = eq & (acc[w] == qw)
                ge = gt | eq
                borrow = zero
                new = []
                for w in range(W):
                    qw = jnp.full_like(res[0], q_words[w])
                    sub = qw + borrow
                    bw = (sub < borrow).astype(U32)
                    t = acc[w] - sub
                    borrow = bw + (acc[w] < sub).astype(U32)
                    new.append(jnp.where(ge, t, acc[w]))
                # lanes where ge is False keep acc; their borrow lanes are
                # discarded along with t, so no gating is needed
                acc = new
            return jnp.stack(acc[: self.nwords], axis=-1)

        import numpy as _np

        return rec(*[jnp.asarray(_np.asarray(r), dtype=jnp.uint32)
                     for r in residues])

    def decode_words(self, words) -> np.ndarray:
        """(…, nwords) uint32 little-endian -> host object ints."""
        w = np.asarray(words, dtype=np.uint64)
        out = np.zeros(w.shape[:-1], dtype=object)
        for i in range(w.shape[-1]):
            out = out + (w[..., i].astype(object) << (32 * i))
        return out


@functools.lru_cache(maxsize=None)
def _cached_plan(n: int, q: int, prime_width: int) -> RnsPlan:
    return RnsPlan(n, q, prime_width=prime_width)


def nwc_poly_mult(n: int, q: int, a, b, prime_width: int = 24):
    """One-call negacyclic product mod an arbitrary modulus q (any width,
    no NTT-friendliness required)."""
    return _cached_plan(n, q, prime_width).nwc_poly_mult(a, b)
