"""Pure-Python golden models (oracle only — never on the hot path).

Semantics contract (SURVEY.md §0):

1.  Plain (cyclic) constant-geometry NTT — what the reference RTL computes
    (reference: new_reference/cg_ntt.py:29-75, test/refs/ntt_forward_reference.py).
    Input is bit-reversed, then log2(n) stages of CG Cooley-Tukey butterflies
    ``A[i] = a[2i] + w*a[2i+1]``, ``A[i + n/2] = a[2i] - w*a[2i+1]`` with
    ``w = omega_s^(i // k)``, ``k = n >> stage``, ``omega_s = omega^k``.
    The inverse is the same network with omega^-1 plus a final n^-1 scaling.

2.  Negacyclic (NWC) polynomial multiplication via the psi-twist
    (reference: new_reference/cg_ntt.py:78-92): ``a_i <- a_i * psi^i`` before
    the forward transform, ``c_i <- c_i * psi^-i`` after the inverse.

These are fresh implementations of the published algorithms, used as the
bit-exactness oracle for every JAX/Pallas path.
"""

from __future__ import annotations

from typing import List, Sequence

from .params import NttParams


def bit_reverse(value: int, bits: int) -> int:
    out = 0
    for _ in range(bits):
        out = (out << 1) | (value & 1)
        value >>= 1
    return out


def bit_reverse_permutation(n: int) -> List[int]:
    """perm[i] = bit_reverse(i); an involution, so it is its own inverse."""
    bits = n.bit_length() - 1
    return [bit_reverse(i, bits) for i in range(n)]


def cg_ntt(x: Sequence[int], omega: int, q: int) -> List[int]:
    """Plain cyclic NTT, constant-geometry network, natural-order in and out."""
    n = len(x)
    log_n = n.bit_length() - 1
    perm = bit_reverse_permutation(n)
    a = [x[perm[i]] % q for i in range(n)]
    for stage in range(1, log_n + 1):
        k = n >> stage
        omega_s = pow(omega, k, q)
        nxt = [0] * n
        w = 1
        for i in range(n // 2):
            # w == omega_s^(i // k); update incrementally at group boundaries.
            if i and i % k == 0:
                w = w * omega_s % q
            t = w * a[2 * i + 1] % q
            nxt[i] = (a[2 * i] + t) % q
            nxt[i + n // 2] = (a[2 * i] - t) % q
        a = nxt
    return a


def cg_intt(x: Sequence[int], omega: int, q: int) -> List[int]:
    """Inverse cyclic NTT: forward network with omega^-1, then scale by n^-1."""
    n = len(x)
    a = cg_ntt(x, pow(omega, q - 2, q), q)
    n_inv = pow(n, q - 2, q)
    return [v * n_inv % q for v in a]


def cyclic_poly_mult(a: Sequence[int], b: Sequence[int], p: NttParams) -> List[int]:
    """INTT(NTT(a) ⊙ NTT(b)) — the reference RTL top-level pipeline semantics
    (reference: test/cocotb_tests/test_ntt_poly_mult.py:38-43)."""
    fa = cg_ntt(a, p.omega, p.q)
    fb = cg_ntt(b, p.omega, p.q)
    prod = [x * y % p.q for x, y in zip(fa, fb)]
    return cg_intt(prod, p.omega, p.q)


def nwc_poly_mult(a: Sequence[int], b: Sequence[int], p: NttParams) -> List[int]:
    """Negacyclic product via psi-twist + cyclic transform (cg_ntt.py:78-92)."""
    q, n = p.q, p.n
    at = [a[i] * pow(p.psi, i, q) % q for i in range(n)]
    bt = [b[i] * pow(p.psi, i, q) % q for i in range(n)]
    c = cyclic_poly_mult(at, bt, p)
    return [c[i] * pow(p.psi_inv, i, q) % q for i in range(n)]


def schoolbook_negacyclic(a: Sequence[int], b: Sequence[int], q: int) -> List[int]:
    """O(n^2) negacyclic convolution: x^n = -1
    (reference: software_benchmark/benchmark_ntt.cpp:213-226)."""
    n = len(a)
    out = [0] * n
    for i in range(n):
        if a[i] == 0:
            continue
        for j in range(n):
            k = i + j
            term = a[i] * b[j]
            if k < n:
                out[k] = (out[k] + term) % q
            else:
                out[k - n] = (out[k - n] - term) % q
    return out


# ---------------------------------------------------------------------------
# ML-KEM (Kyber) incomplete NTT — FIPS-203 §4.3 golden model
# ---------------------------------------------------------------------------
#
# q = 3329 has 2-adicity 8 (q - 1 = 2^8 * 13), so no 512th root of unity
# exists and the full-size psi-twist machinery above cannot apply: the
# deployed standard instead uses the INCOMPLETE transform, mapping
# Z_q[x]/(x^256 + 1) onto 128 quadratic extensions Z_q[x]/(x^2 - gamma_i)
# with gamma_i = zeta^(2*br7(i)+1), zeta = 17 a primitive 256th root.
# Products finish with a 2x2 "base case" multiplication per pair.
#
# The reference repo explored exactly this workload and abandoned it
# (test/archive/ntt_inverse_kyber.py:1-3, built from the pq-crystals
# reference); these are fresh implementations of FIPS-203 Algorithms 9-12,
# used as the bit-exactness oracle for the TPU paths in kyber.py /
# kernels/kyber.py.  All values are plain residues in [0, q) (the FIPS
# definition; no Montgomery factors anywhere in the golden).

KYBER_Q = 3329
KYBER_N = 256
KYBER_ZETA = 17  # primitive 256th root of unity mod 3329


def _br7(i: int) -> int:
    return bit_reverse(i, 7)


def kyber_ntt(f: Sequence[int]) -> List[int]:
    """FIPS-203 Algorithm 9: 7-layer CT network, natural coefficients in,
    the standard NTT representation out (the order ML-KEM serializes)."""
    q = KYBER_Q
    a = [v % q for v in f]
    assert len(a) == KYBER_N
    k = 1
    length = 128
    while length >= 2:
        for start in range(0, KYBER_N, 2 * length):
            zeta = pow(KYBER_ZETA, _br7(k), q)
            k += 1
            for j in range(start, start + length):
                t = zeta * a[j + length] % q
                a[j + length] = (a[j] - t) % q
                a[j] = (a[j] + t) % q
        length //= 2
    return a


def kyber_intt(fh: Sequence[int]) -> List[int]:
    """FIPS-203 Algorithm 10: GS network + final 128^-1 scale."""
    q = KYBER_Q
    a = [v % q for v in fh]
    assert len(a) == KYBER_N
    k = 127
    length = 2
    while length <= 128:
        for start in range(0, KYBER_N, 2 * length):
            zeta = pow(KYBER_ZETA, _br7(k), q)
            k -= 1
            for j in range(start, start + length):
                t = a[j]
                a[j] = (t + a[j + length]) % q
                a[j + length] = zeta * (a[j + length] - t) % q
        length *= 2
    n_half_inv = pow(128, q - 2, q)  # 3303
    return [v * n_half_inv % q for v in a]


def kyber_basemul(ah: Sequence[int], bh: Sequence[int]) -> List[int]:
    """FIPS-203 Algorithms 11-12: pairwise product in the NTT domain —
    128 independent multiplications in Z_q[x]/(x^2 - gamma_i)."""
    q = KYBER_Q
    out = [0] * KYBER_N
    for i in range(128):
        gamma = pow(KYBER_ZETA, 2 * _br7(i) + 1, q)
        a0, a1 = ah[2 * i], ah[2 * i + 1]
        b0, b1 = bh[2 * i], bh[2 * i + 1]
        out[2 * i] = (a0 * b0 + a1 * b1 % q * gamma) % q
        out[2 * i + 1] = (a0 * b1 + a1 * b0) % q
    return out


def kyber_poly_mult(a: Sequence[int], b: Sequence[int]) -> List[int]:
    """Negacyclic product in R_q = Z_q[x]/(x^256 + 1) via the incomplete
    NTT — must equal schoolbook_negacyclic(a, b, KYBER_Q)."""
    return kyber_intt(kyber_basemul(kyber_ntt(a), kyber_ntt(b)))


# ---------------------------------------------------------------------------
# ML-DSA (Dilithium) complete NTT — FIPS-204 §7.5 golden model
# ---------------------------------------------------------------------------
#
# q = 8380417 IS the reference's shipped 24-bit modulus (Dilithium's prime;
# rtl/ntt_poly_mult_openroad.sv:22-24, new_reference/test_cg_ntt.py:7), but
# the deployed FIPS-204 standard fixes a specific root (zeta = 1753, a
# primitive 512th root of unity) and a specific in-place network whose
# output order is the ML-DSA serialization order.  These are fresh
# implementations of FIPS-204 Algorithms 41 (NTT), 42 (NTT^-1) and the
# coefficient-wise MultiplyNTT (complete transform, so the base case is a
# plain pointwise product — unlike ML-KEM's 2x2 slots above), used as the
# bit-exactness oracle for the TPU paths in mldsa.py.

MLDSA_Q = 8380417
MLDSA_N = 256
MLDSA_ZETA = 1753  # primitive 512th root of unity mod 8380417 (FIPS-204)


def _br8(i: int) -> int:
    return bit_reverse(i, 8)


def mldsa_ntt(w: Sequence[int]) -> List[int]:
    """FIPS-204 Algorithm 41: 8-layer CT network, natural coefficients in,
    the ML-DSA NTT representation out (the order FIPS-204 serializes)."""
    q = MLDSA_Q
    a = [v % q for v in w]
    assert len(a) == MLDSA_N
    k = 0
    length = 128
    while length >= 1:
        for start in range(0, MLDSA_N, 2 * length):
            k += 1
            zeta = pow(MLDSA_ZETA, _br8(k), q)
            for j in range(start, start + length):
                t = zeta * a[j + length] % q
                a[j + length] = (a[j] - t) % q
                a[j] = (a[j] + t) % q
        length //= 2
    return a


def mldsa_intt(wh: Sequence[int]) -> List[int]:
    """FIPS-204 Algorithm 42: GS network + final 256^-1 = 8347681 scale."""
    q = MLDSA_Q
    a = [v % q for v in wh]
    assert len(a) == MLDSA_N
    k = MLDSA_N
    length = 1
    while length < MLDSA_N:
        for start in range(0, MLDSA_N, 2 * length):
            k -= 1
            zeta = (q - pow(MLDSA_ZETA, _br8(k), q)) % q  # -zeta^brv(k)
            for j in range(start, start + length):
                t = a[j]
                a[j] = (t + a[j + length]) % q
                a[j + length] = zeta * (t - a[j + length]) % q
        length *= 2
    f = pow(MLDSA_N, q - 2, q)  # 8347681
    return [v * f % q for v in a]


def mldsa_multiply(ah: Sequence[int], bh: Sequence[int]) -> List[int]:
    """FIPS-204 MultiplyNTT: coefficient-wise product in the NTT domain
    (the transform is complete, so there is no 2x2 base case)."""
    return [x * y % MLDSA_Q for x, y in zip(ah, bh)]


def mldsa_poly_mult(a: Sequence[int], b: Sequence[int]) -> List[int]:
    """Negacyclic product in R_q = Z_q[x]/(x^256 + 1) via the FIPS-204
    transform — must equal schoolbook_negacyclic(a, b, MLDSA_Q)."""
    return mldsa_intt(mldsa_multiply(mldsa_ntt(a), mldsa_ntt(b)))


def schoolbook_cyclic(a: Sequence[int], b: Sequence[int], q: int) -> List[int]:
    """O(n^2) cyclic convolution: x^n = 1."""
    n = len(a)
    out = [0] * n
    for i in range(n):
        if a[i] == 0:
            continue
        for j in range(n):
            out[(i + j) % n] = (out[(i + j) % n] + a[i] * b[j]) % q
    return out
