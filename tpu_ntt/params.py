"""Parameter sets and derived constants for NTT negacyclic polynomial multiplication.

A parameter set is ``(n, q, psi)`` with ``q`` prime and ``psi`` a primitive
2n-th root of unity mod q (``psi^(2n) == 1``, ``psi^n == q - 1``).  ``omega =
psi^2`` is the primitive n-th root used by the plain (cyclic) transform.

This mirrors the configuration surface of the reference accelerator
(reference: rtl/ntt_poly_mult.sv:15-28 parameters N/WIDTH/Q/PSI/PSI_INV/N_INV/
REDUCTION_TYPE; constants derivation: scripts/precompute_constants.py:30-111,
scripts/find_psi.py).  The four shipped parameter sets below reproduce the
reference's configs bit-exactly (see SURVEY.md section 0 for the file:line
provenance of each constant).
"""

from __future__ import annotations

import dataclasses
import enum
import functools


class Reduction(enum.Enum):
    """Modular-multiplication backend (reference: rtl/mod_mult.v:21-128).

    All backends compute exactly ``(a * b) % q``; the choice only affects the
    instruction sequence, never the result.
    """

    SIMPLE = "simple"  # direct remainder (golden / host path only)
    BARRETT = "barrett"
    MONTGOMERY = "montgomery"
    # Shoup precomputed-quotient multiply for constant (twiddle) operands:
    # w' = floor(w * 2^word / q) stored alongside w; a*w mod q then needs
    # only mulhi(a, w'), two low multiplies and one conditional subtract.
    # Falls back to Barrett/Montgomery for variable*variable products.
    SHOUP = "shoup"


def _is_probable_prime(n: int) -> bool:
    """Deterministic Miller-Rabin for n < 3.3e24 (covers all our moduli)."""
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


@dataclasses.dataclass(frozen=True)
class NttParams:
    """One (n, q, psi) configuration plus every derived constant.

    Derived constants match scripts/precompute_constants.py (Barrett: k, mu;
    Montgomery: k, r, q', r mod q) and new_reference/cg_ntt.py (n_inv,
    psi_inv, omega).
    """

    n: int
    q: int
    psi: int
    name: str = ""

    def __post_init__(self):
        if self.n & (self.n - 1) or self.n < 2:
            raise ValueError(f"n must be a power of two >= 2, got {self.n}")
        if not _is_probable_prime(self.q):
            raise ValueError(f"q must be prime, got {self.q}")
        if (self.q - 1) % (2 * self.n):
            raise ValueError("q must satisfy q ≡ 1 (mod 2n) for psi to exist")
        if pow(self.psi, self.n, self.q) != self.q - 1:
            raise ValueError("psi is not a primitive 2n-th root of unity: psi^n != -1")

    # --- basic derived values -------------------------------------------------
    @property
    def log_n(self) -> int:
        return self.n.bit_length() - 1

    @property
    def width(self) -> int:
        """Coefficient bit width = ceil(log2 q) (reference WIDTH parameter)."""
        return self.q.bit_length()

    @property
    def omega(self) -> int:
        """Primitive n-th root of unity: omega = psi^2 mod q."""
        return pow(self.psi, 2, self.q)

    @property
    def psi_inv(self) -> int:
        return pow(self.psi, self.q - 2, self.q)

    @property
    def omega_inv(self) -> int:
        return pow(self.omega, self.q - 2, self.q)

    @property
    def n_inv(self) -> int:
        return pow(self.n, self.q - 2, self.q)

    # --- Barrett constants (reference: rtl/mod_mult.v:8-9, barrett_mult.v) ----
    @property
    def barrett_k(self) -> int:
        return self.q.bit_length()

    @property
    def barrett_mu(self) -> int:
        """mu = floor(2^(2k) / q); q1 = p >> (k-1); q2 = (q1*mu) >> (k+1)."""
        return (1 << (2 * self.barrett_k)) // self.q

    # --- Montgomery constants (reference: rtl/montgomery_reduction.v) ---------
    @property
    def mont_bits(self) -> int:
        """R = 2^mont_bits.  We use word-aligned R (32 or 64) on TPU, which is
        a superset of the reference's k = ceil(log2 q) choice; both satisfy
        R > q and produce identical final residues."""
        return 32 if self.width <= 31 else 64

    @property
    def mont_r(self) -> int:
        return 1 << self.mont_bits

    @property
    def mont_q_prime(self) -> int:
        """q' = -q^-1 mod R, used by REDC."""
        r = self.mont_r
        return (-pow(self.q, -1, r)) % r

    @property
    def mont_r_mod_q(self) -> int:
        return self.mont_r % self.q

    @property
    def mont_r2_mod_q(self) -> int:
        """R^2 mod q — converts a standard-domain value into Montgomery domain
        with one REDC multiply."""
        return (self.mont_r * self.mont_r) % self.q

    def to_mont(self, x: int) -> int:
        return (x * self.mont_r) % self.q

    def validate_roots(self) -> None:
        """Full sanity suite (reference: scripts/generate_twiddles.py:44-56)."""
        assert pow(self.psi, 2 * self.n, self.q) == 1
        assert pow(self.psi, self.n, self.q) == self.q - 1
        assert pow(self.omega, self.n, self.q) == 1
        assert pow(self.omega, self.n // 2, self.q) == self.q - 1
        assert (self.psi * self.psi_inv) % self.q == 1
        assert (self.n * self.n_inv) % self.q == 1


# --- Shipped parameter sets (bit-exact vs the reference; SURVEY.md §0) --------

#: Dilithium modulus, n=256 (reference: new_reference/cg_ntt.py:5-7,
#: new_reference/test_cg_ntt.py:7).
DILITHIUM_256 = NttParams(n=256, q=8380417, psi=1239911, name="dilithium_256")

#: 1024-point, 24-bit modulus (reference: test/Makefile:268-283).
P24_1024 = NttParams(n=1024, q=8380417, psi=5548360, name="p24_1024")

#: 4096-point, 24-bit modulus (reference: test/Makefile:289-304,
#: rtl/ntt_poly_mult_openroad.sv:22-24).
P24_4096 = NttParams(n=4096, q=8380417, psi=283817, name="p24_4096")

#: 4096-point, 60-bit modulus (reference: rtl/ntt_poly_mult.sv:18-24).
P60_4096 = NttParams(
    n=4096, q=1152921504606830593, psi=431606828070683274, name="p60_4096"
)

#: 4096-point, Goldilocks prime 2^64 - 2^32 + 1 (width 64) — BEYOND the
#: reference's WIDTH=60 ceiling (rtl/ntt_poly_mult.sv:15-28); the
#: STARK/zk ecosystem's standard modulus, served by a dedicated
#: special-form kernel (kernels/gl64.py) and ring (modmath.GoldilocksRing).
GOLDILOCKS_4096 = NttParams(
    n=4096, q=(1 << 64) - (1 << 32) + 1, psi=1532612707718625687,
    name="goldilocks_4096"
)

#: Falcon / FN-DSA modulus q = 12289 = 3*2^12 + 1, the third NIST PQC
#: signature family, at both deployed degrees (FIPS-206 draft; Falcon-512
#: and Falcon-1024).  BEYOND the reference's shipped sets: its smallest
#: modulus is the 24-bit Dilithium prime (test/Makefile:268-283), but the
#: same generic datapath applies — and here the 14-bit width makes
#: operands 2-limb on the int8 MXU kernel, the framework's cheapest case.
#: 2-adicity of q-1 is 12, so the full-size psi exists for n <= 2048.
FALCON_512 = NttParams(n=512, q=12289, psi=10302, name="falcon_512")
FALCON_1024 = NttParams(n=1024, q=12289, psi=1945, name="falcon_1024")

PRESETS = {p.name: p for p in (DILITHIUM_256, P24_1024, P24_4096, P60_4096,
                               GOLDILOCKS_4096, FALCON_512, FALCON_1024)}


@functools.lru_cache(maxsize=None)
def find_psi(n: int, q: int) -> int:
    """Find the smallest primitive 2n-th root of unity mod q.

    TPU-native replacement for scripts/find_psi.py:28-40: searches generator
    candidates g and returns g^((q-1)/(2n)) with the primitivity check
    psi^n == -1.
    """
    if (q - 1) % (2 * n):
        raise ValueError(f"q={q} does not support n={n} (need 2n | q-1)")
    exp = (q - 1) // (2 * n)
    for g in range(2, 10_000):
        psi = pow(g, exp, q)
        if pow(psi, n, q) == q - 1:
            return psi
    raise ValueError("no psi found")


def make_params(n: int, q: int, psi: int | None = None, name: str = "") -> NttParams:
    """Build a parameter set, deriving psi when not given."""
    if psi is None:
        psi = find_psi(n, q)
    return NttParams(n=n, q=q, psi=psi, name=name or f"w{q.bit_length()}_{n}")
