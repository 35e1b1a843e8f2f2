"""BGV-style leveled homomorphic encryption assembled from the framework's
RNS primitives — the end-to-end FHE workload the reference accelerator's
polynomial products exist to serve.

The reference is a fixed-(n, q) negacyclic product engine
(rtl/ntt_poly_mult.sv); its report motivates the design with
lattice/homomorphic cryptography, where those products appear inside a
SCHEME: ciphertexts are pairs over R_Q = Z_Q[x]/(x^n + 1) with Q a product
of NTT-friendly primes, and the scheme operations around the products are
modulus switching, digit-decomposed key switching, and Galois rotations —
exactly the RnsRing surface (rns.py).  This module closes the loop: a
working BGV (Brakerski–Gentry–Vaikuntanathan) leveled scheme whose every
ring operation runs on the dispatched TPU paths (24-bit channels ride the
fused int8-MXU kernels) and whose key-switch inner products are the fused
matvec kernels (keys transformed once at keygen, the cached-operand shape
kernels/mxu.nwc_matvec_cached was built for).

Scheme summary (RNS-BGV, the HElib/SEAL-BGV construction):

  secret    s ternary; public key (b, a) with b = [t*e - a*s]_Q
  encrypt   c = (b*u + t*e0 + m,  a*u + t*e1),   m in R_t
  decrypt   m = f^{-1} * [ centered([c0 + c1*s + c2*s^2]_Q) ]_t
  add       componentwise (plaintext factors matched by scalar mult)
  mul       tensor product via Karatsuba (3 ring products) -> degree 2
  relin     hybrid key switch of the s^2 component back to (1, s):
            dnum-grouped canonical digits, EXACT ModUp (base_extend),
            one fused 2 x dnum spectrum matvec per extended channel,
            t-preserving exact ModDown (rns.RnsRing.mod_down_mod_t)
  modswitch rescale_mod_t per component — drops the last prime, scales
            the tracked plaintext factor by p_k^{-1} mod t
  rotate    Galois automorphism x -> x^g + key switch of sigma_g(s)

Everything is exact integer arithmetic: ModUp rides the exact device CRT
(no BEHZ +kq approximation) and ModDown subtracts the unique eps ≡ 0
(mod t), so homomorphic identities hold with NO probabilistic slack — the
tests assert bit-equality against plaintext-ring oracles, not closeness.

The plaintext FACTOR: modulus switching divides the phase by p_k, so the
plaintext is multiplied by p_k^{-1} mod t.  Ciphertexts carry the
accumulated factor and decrypt removes it (HElib's ptxtSpace bookkeeping);
when every prime ≡ 1 (mod t) — free whenever t | 2n, since NTT primes
satisfy p ≡ 1 (mod 2n) — the factor stays 1.

SIMD slots: for prime t with 2n | t - 1 the plaintext ring R_t splits into
n slots under the SAME negacyclic NTT the framework accelerates
(slot_encode/slot_decode run the merged-psi transforms at q = t), so one
ciphertext product is n parallel Z_t multiplications.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

from . import dispatch
from .ntt import NttPlan, nwc_fwd_merged, nwc_inv_merged
from .params import _is_probable_prime, make_params
from .rns import RnsRing, _u32, ntt_friendly_primes


def _centered(arr: np.ndarray, modulus: int) -> np.ndarray:
    """Canonical [0, M) object array -> centered (-M/2, M/2] integers."""
    half = modulus >> 1
    return np.frompyfunc(
        lambda v: v - modulus if v > half else v, 1, 1)(arr)


def decrypt_phase(sk, ct) -> np.ndarray:
    """Centered integer phase [c0 + c1 s + c2 s^2]_Q of a ciphertext over
    any RnsRing (host object ints via the exact device CRT exit) — the
    RLWE decryption core shared by BGV (mod-t extraction) and CKKS
    (scaled-real extraction, tpu_ntt/ckks.py)."""
    ring = ct.ring
    s = sk.residues(ring)
    c1s = ring.nwc_mult(
        ct.parts[1],
        [np.broadcast_to(np.asarray(r), np.shape(ct.parts[1][0]))
         for r in s])
    acc = ring.add(ct.parts[0], c1s)
    if ct.degree >= 2:
        s2 = sk.square_residues(ring)
        c2s2 = ring.nwc_mult(
            ct.parts[2],
            [np.broadcast_to(np.asarray(r), np.shape(ct.parts[2][0]))
             for r in s2])
        acc = ring.add(acc, c2s2)
    words = ring.reconstruct_words(acc)
    return _centered(ring.decode_words(words), ring.q)


@dataclasses.dataclass
class SecretKey:
    """Ternary secret with per-basis residue caches (s and s^2 are needed
    over Q at every level and over the extended Q*P basis at keygen)."""

    s: np.ndarray  # (n,) int8 in {-1, 0, 1}

    def __post_init__(self):
        self._res: dict = {}
        self._sq: dict = {}

    def residues(self, ring: RnsRing) -> list:
        key = tuple(ring.moduli)
        if key not in self._res:
            self._res[key] = [
                _u32(np.asarray(self.s, dtype=np.int64) % p)
                for p in ring.moduli
            ]
        return self._res[key]

    def square_residues(self, ring: RnsRing) -> list:
        """s^2 in R_Q, computed as one device ring product per channel
        (exact: per-channel reduction IS reduction mod Q)."""
        key = tuple(ring.moduli)
        if key not in self._sq:
            s = [r[None, :] for r in self.residues(ring)]
            self._sq[key] = [r[0] for r in ring.nwc_mult(s, s)]
        return self._sq[key]


@dataclasses.dataclass
class PublicKey:
    b: list  # residues of [t*e - a*s]_Q
    a: list  # residues of a (uniform)


@dataclasses.dataclass
class KeySwitchKey:
    """Hybrid key-switching key: per extended-basis channel, the cached
    matvec spectra of the fixed (2, dnum, n) key matrix
    A[0, j] = [t*e_j - a_j*s + P*G_j*target]_{QP},  A[1, j] = a_j
    (keys are transformed ONCE here; every switch afterwards pays only
    dnum digit forwards + one inverse per channel)."""

    moduli: tuple  # Q basis this key decomposes over
    special: tuple  # P basis appended for the switch
    dnum: int
    spectra: list  # per QP channel: best_nwc_matvec_spectra output
    #: raw (k0, k1) residues over QP (lists over groups of per-channel
    #: arrays) — kept so the SHARDED path (ShardedBgv) can re-transform
    #: the same key with the mesh's q-generic merged transform (the
    #: per-channel kernel spectra above are backend-specific layouts)
    raw: tuple | None = None


@dataclasses.dataclass
class Ciphertext:
    """(c0, c1[, c2]) residue lists over ``ring``, decrypting under
    (1, s[, s^2]); ``factor`` is the accumulated plaintext scale mod t
    (modulus switching multiplies the plaintext by p_k^{-1} mod t)."""

    ring: RnsRing
    parts: tuple
    factor: int = 1

    @property
    def degree(self) -> int:
        return len(self.parts) - 1


class RlweSampler:
    """Host-side randomness shared by the RLWE schemes (BGV here, CKKS in
    tpu_ntt/ckks.py): ternary secrets/encryption randomness, bounded
    uniform noise, uniform ring elements (independent uniform residues
    per channel ARE uniform mod Q — CRT is a bijection), and the exact
    signed-integer residue encoding."""

    err_bound: int

    def _ternary(self, rng, shape) -> np.ndarray:
        return rng.integers(-1, 2, shape).astype(np.int64)

    def _err(self, rng, shape) -> np.ndarray:
        return rng.integers(-self.err_bound, self.err_bound + 1,
                            shape).astype(np.int64)

    def _encode_signed(self, arr: np.ndarray, ring: RnsRing) -> list:
        """Small signed host integers -> residue lists (exact)."""
        a = np.asarray(arr, dtype=np.int64)
        return [_u32(a % p) for p in ring.moduli]

    def _uniform(self, rng, ring: RnsRing, shape) -> list:
        return [_u32(rng.integers(0, p, shape, dtype=np.int64))
                for p in ring.moduli]


class HybridKeygen(RlweSampler):
    """RLWE key generation + hybrid key-switching-key construction,
    shared by BGV and CKKS (tpu_ntt/ckks.py).  The single scheme
    difference is the noise multiplier on every error term:
    ``_ksk_noise_mult`` is the plaintext modulus t for BGV (noise rides
    above the plaintext) and 1 for CKKS (noise rides in the low bits
    the scale protects) — one audited copy of the gadget/digit-group
    math instead of two (round-5 review finding)."""

    #: scheme hook: multiplies every sampled error term
    _ksk_noise_mult: int = 1

    def keygen(self, rng) -> tuple[SecretKey, PublicKey]:
        sk = SecretKey(self._ternary(rng, self.n).astype(np.int8))
        ring = self.ring
        a = self._uniform(rng, ring, (self.n,))
        e = self._err(rng, (self.n,))
        a_s = [r[0] for r in ring.nwc_mult(
            [x[None, :] for x in a],
            [x[None, :] for x in sk.residues(ring)])]
        ne = self._encode_signed(self._ksk_noise_mult * e, ring)
        b = ring.sub(ne, a_s)
        return sk, PublicKey(b=b, a=a)

    def _make_ksk(self, sk: SecretKey, target: list, rng,
                  ring: RnsRing) -> KeySwitchKey:
        """Key switching key for an arbitrary target element (residues of
        s^2 for relinearization, sigma_g(s) for rotations) over
        ``ring``'s extended basis."""
        qp = ring.extended(self.special)
        groups = ring.digit_groups(self.dnum or len(ring.moduli))
        P = 1
        for p in self.special:
            P *= p
        s_qp = sk.residues(qp)
        # extend the target to QP: entries of `target` are residues over
        # ring (mod Q); the key needs P*G_j*target mod every QP channel,
        # so lift the target by exact base extension
        tgt_qp = ring.base_extend(
            [r[None, :] if np.ndim(r) == 1 else r for r in target], qp)
        k0 = []
        k1 = []
        for idxs in groups:
            Qj = 1
            for i in idxs:
                Qj *= ring.moduli[i]
            Qhat = 1
            for i, p in enumerate(ring.moduli):
                if i not in idxs:
                    Qhat *= p
            g = (Qhat * pow(Qhat % Qj, -1, Qj)) % ring.q  # digit CRT factor
            a_j = self._uniform(rng, qp, (self.n,))
            e_j = self._err(rng, (self.n,))
            a_s = [r[0] for r in qp.nwc_mult(
                [x[None, :] for x in a_j],
                [x[None, :] for x in s_qp])]
            ne = self._encode_signed(self._ksk_noise_mult * e_j, qp)
            import jax.numpy as jnp

            from .modmath import add_mod32, barrett_mul32, sub_mod32

            row = []
            for i, p in enumerate(qp.params):
                scal = (P * g) % p.q
                term = barrett_mul32(
                    jnp.reshape(_u32(tgt_qp[i]), (self.n,)),
                    jnp.full((self.n,), scal, dtype=jnp.uint32),
                    p.q, p.barrett_k, p.barrett_mu)
                row.append(add_mod32(sub_mod32(ne[i], a_s[i], p.q),
                                     term, p.q))
            k0.append(row)
            k1.append(a_j)
        # per QP channel: cached spectra of the (2, dnum, n) key matrix
        import jax.numpy as jnp

        spectra = []
        for i, p in enumerate(qp.params):
            A = jnp.stack([
                jnp.stack([k0[j][i] for j in range(len(groups))]),
                jnp.stack([k1[j][i] for j in range(len(groups))]),
            ])
            spectra.append(dispatch.best_nwc_matvec_spectra(p)(A))
        return KeySwitchKey(moduli=tuple(ring.moduli), special=self.special,
                            dnum=len(groups), spectra=spectra,
                            raw=(k0, k1))

    def relin_key(self, sk: SecretKey, rng,
                  ring: RnsRing | None = None) -> KeySwitchKey:
        ring = ring or self.ring
        return self._make_ksk(sk, sk.square_residues(ring), rng, ring)

    def galois_key(self, sk: SecretKey, g: int, rng,
                   ring: RnsRing | None = None) -> KeySwitchKey:
        ring = ring or self.ring
        sig_s = ring.automorphism(sk.residues(ring), g)
        return self._make_ksk(sk, sig_s, rng, ring)



class BgvContext(HybridKeygen):
    """One BGV parameterization: ring dimension n, plaintext modulus t,
    an RNS ciphertext modulus Q = p_1 ... p_k of NTT-friendly primes, and
    ``num_special`` extra primes P for hybrid key switching.

    t must be coprime to every prime (automatic: NTT primes are odd and
    ≡ 1 mod 2n), smaller than every prime, and <= 65537 (the
    rescale_mod_t device bound).  err_bound is the uniform noise bound
    (e coefficients drawn from [-err_bound, err_bound])."""

    def __init__(self, n: int, t: int, channels: int = 4,
                 moduli: Sequence[int] | None = None, num_special: int = 1,
                 dnum: int | None = None, prime_width: int = 24,
                 err_bound: int = 6):
        self.n = n
        self.t = int(t)
        self.ring = RnsRing(n, moduli=moduli, channels=channels,
                            prime_width=prime_width)
        if any(p % self.t == 0 for p in self.ring.moduli):
            raise ValueError("t must be coprime to every RNS prime")
        if self.t >= min(self.ring.moduli):
            raise ValueError("t must be smaller than every RNS prime")
        self.special = tuple(ntt_friendly_primes(
            n, prime_width, num_special, below=min(self.ring.moduli)))
        self.dnum = dnum
        self.err_bound = err_bound
        self._ksk_noise_mult = self.t
        # slot packing is available when R_t itself is NTT-friendly
        self._slot_plan = None
        if _is_probable_prime(self.t) and (self.t - 1) % (2 * n) == 0:
            self._slot_plan = NttPlan(make_params(n, self.t))

    # -- encryption / decryption (keygen: HybridKeygen mixin) ---------------
    def encrypt(self, pk: PublicKey, m, rng) -> Ciphertext:
        """m: host array of residues mod t, shape (n,) or (B, n)."""
        ring = self.ring
        m_arr = np.asarray(m, dtype=np.int64) % self.t
        squeeze = m_arr.ndim == 1
        if squeeze:
            m_arr = m_arr[None]
        shape = m_arr.shape
        u = self._encode_signed(self._ternary(rng, shape), ring)
        b = [np.broadcast_to(np.asarray(x), shape) for x in pk.b]
        a = [np.broadcast_to(np.asarray(x), shape) for x in pk.a]
        bu = ring.nwc_mult([_u32(x) for x in b], u)
        au = ring.nwc_mult([_u32(x) for x in a], u)
        te0_m = self._encode_signed(
            self.t * self._err(rng, shape) + m_arr, ring)
        te1 = self._encode_signed(self.t * self._err(rng, shape), ring)
        c0 = ring.add(bu, te0_m)
        c1 = ring.add(au, te1)
        return Ciphertext(ring=ring, parts=(c0, c1))

    def _phase(self, sk: SecretKey, ct: Ciphertext) -> np.ndarray:
        return decrypt_phase(sk, ct)

    def decrypt(self, sk: SecretKey, ct: Ciphertext) -> np.ndarray:
        phase = self._phase(sk, ct)
        m = np.frompyfunc(lambda v: v % self.t, 1, 1)(phase)
        if ct.factor != 1:
            f_inv = pow(ct.factor, -1, self.t)
            m = np.frompyfunc(lambda v: v * f_inv % self.t, 1, 1)(m)
        return m.astype(np.int64)

    def noise_budget(self, sk: SecretKey, ct: Ciphertext) -> int:
        """floor(log2(Q / (2*|phase|_inf))) — bits of room before the
        noise wraps and decryption fails (0 means failure imminent)."""
        phase = self._phase(sk, ct)
        mx = max(1, int(max(abs(int(v)) for v in phase.reshape(-1))))
        return max(0, (ct.ring.q // 2).bit_length() - 1 - mx.bit_length())

    # -- homomorphic operations ---------------------------------------------
    def _match_factors(self, c1: Ciphertext, c2: Ciphertext):
        if c1.factor == c2.factor:
            return c1, c2
        u = c1.factor * pow(c2.factor, -1, self.t) % self.t
        return c1, self.mul_scalar(c2, u)

    def add(self, ct1: Ciphertext, ct2: Ciphertext) -> Ciphertext:
        ct1, ct2 = self._match_factors(ct1, ct2)
        self._check_ring(ct1, ct2)
        ring = ct1.ring
        d = max(ct1.degree, ct2.degree)
        parts = []
        for i in range(d + 1):
            p1 = ct1.parts[i] if i <= ct1.degree else None
            p2 = ct2.parts[i] if i <= ct2.degree else None
            if p1 is None:
                parts.append(p2)
            elif p2 is None:
                parts.append(p1)
            else:
                parts.append(ring.add(p1, p2))
        return Ciphertext(ring=ring, parts=tuple(parts), factor=ct1.factor)

    def sub(self, ct1: Ciphertext, ct2: Ciphertext) -> Ciphertext:
        neg = self.mul_scalar(ct2, self.t - 1)
        return self.add(ct1, neg)

    def mul_scalar(self, ct: Ciphertext, u: int) -> Ciphertext:
        """Multiply by an integer scalar (centered lift for minimal noise
        growth); plaintext becomes u*m, factor unchanged."""
        import jax.numpy as jnp

        from .modmath import barrett_mul32

        u %= self.t
        uc = u - self.t if u > self.t // 2 else u
        ring = ct.ring
        parts = []
        for part in ct.parts:
            out = []
            for p, r in zip(ring.params, part):
                s = uc % p.q
                out.append(barrett_mul32(
                    _u32(r), jnp.full(np.shape(r), s, dtype=jnp.uint32),
                    p.q, p.barrett_k, p.barrett_mu))
            parts.append(out)
        return Ciphertext(ring=ring, parts=tuple(parts), factor=ct.factor)

    def add_plain(self, ct: Ciphertext, m) -> Ciphertext:
        """ct + m for a plaintext m (factor-corrected: the lifted value
        added to c0 is f*m so decrypt sees m)."""
        ring = ct.ring
        m_arr = np.asarray(m, dtype=np.int64) % self.t
        m_arr = (m_arr * ct.factor) % self.t
        shape = np.shape(ct.parts[0][0])
        lift = self._encode_signed(np.broadcast_to(m_arr, shape), ring)
        c0 = ring.add(ct.parts[0], lift)
        return Ciphertext(ring=ring, parts=(c0,) + ct.parts[1:],
                          factor=ct.factor)

    def mul_plain(self, ct: Ciphertext, m) -> Ciphertext:
        """ct * m for a plaintext polynomial m (ring product per part —
        this is the fused-kernel hot path; factor unchanged)."""
        ring = ct.ring
        m_arr = np.asarray(m, dtype=np.int64) % self.t
        shape = np.shape(ct.parts[0][0])
        m_res = self._encode_signed(
            np.broadcast_to(
                _centered(m_arr.astype(object), self.t), shape
            ).astype(np.int64),
            ring)
        parts = tuple(ring.nwc_mult(part, m_res) for part in ct.parts)
        return Ciphertext(ring=ring, parts=parts, factor=ct.factor)

    def _check_ring(self, ct1, ct2):
        if tuple(ct1.ring.moduli) != tuple(ct2.ring.moduli):
            raise ValueError("ciphertexts live at different levels; "
                             "mod_switch to align them first")

    def mul(self, ct1: Ciphertext, ct2: Ciphertext) -> Ciphertext:
        """Tensor product -> degree-2 ciphertext under (1, s, s^2), via
        Karatsuba: 3 ring products instead of 4 (each a batched fused
        kernel per channel)."""
        if ct1.degree != 1 or ct2.degree != 1:
            raise ValueError("mul expects degree-1 ciphertexts "
                             "(relinearize first)")
        self._check_ring(ct1, ct2)
        ring = ct1.ring
        c0, c1 = ct1.parts
        d0, d1 = ct2.parts
        e0 = ring.nwc_mult(c0, d0)
        e2 = ring.nwc_mult(c1, d1)
        mid = ring.nwc_mult(ring.add(c0, c1), ring.add(d0, d1))
        e1 = ring.sub(ring.sub(mid, e0), e2)
        return Ciphertext(ring=ring, parts=(e0, e1, e2),
                          factor=ct1.factor * ct2.factor % self.t)

    def _key_switch(self, ring: RnsRing, part: list,
                    ksk: KeySwitchKey) -> tuple[list, list]:
        """Hybrid switch of one ciphertext component: canonical digits
        (ModUp via exact base extension), ONE fused 2 x dnum matvec per
        extended channel, t-preserving ModDown.  Returns (u0, u1) over Q
        with u0 + u1*s ≡ part * target (mod Q, mod-t exact)."""
        import jax.numpy as jnp

        if tuple(ring.moduli) != ksk.moduli:
            raise ValueError("key-switch key was generated for a "
                             "different level")
        qp = ring.extended(self.special)
        groups = ring.digit_groups(ksk.dnum)
        ext = ring.mod_up(part, groups, qp)
        u0, u1 = [], []
        for i, p in enumerate(qp.params):
            dstack = jnp.stack([_u32(ext[j][i])
                                for j in range(len(groups))])
            out = dispatch.best_nwc_matvec(p)(dstack, ksk.spectra[i])
            u0.append(out[0])
            u1.append(out[1])
        ns = len(self.special)
        return (ring.mod_down_mod_t(qp, u0, ns, self.t),
                ring.mod_down_mod_t(qp, u1, ns, self.t))

    def relinearize(self, ct: Ciphertext, rlk: KeySwitchKey) -> Ciphertext:
        if ct.degree != 2:
            raise ValueError("relinearize expects a degree-2 ciphertext")
        ring = ct.ring
        u0, u1 = self._key_switch(ring, ct.parts[2], rlk)
        return Ciphertext(
            ring=ring,
            parts=(ring.add(ct.parts[0], u0), ring.add(ct.parts[1], u1)),
            factor=ct.factor)

    def mul_relin(self, ct1: Ciphertext, ct2: Ciphertext,
                  rlk: KeySwitchKey) -> Ciphertext:
        return self.relinearize(self.mul(ct1, ct2), rlk)

    def apply_galois(self, ct: Ciphertext, g: int,
                     gk: KeySwitchKey) -> Ciphertext:
        """sigma_g on the plaintext: permute both components, then switch
        the sigma_g(s) component back to s."""
        if ct.degree != 1:
            raise ValueError("apply_galois expects a degree-1 ciphertext")
        ring = ct.ring
        c0 = ring.automorphism(ct.parts[0], g)
        c1 = ring.automorphism(ct.parts[1], g)
        u0, u1 = self._key_switch(ring, c1, gk)
        return Ciphertext(ring=ring,
                          parts=(ring.add(c0, u0), u1),
                          factor=ct.factor)

    def mod_switch(self, ct: Ciphertext) -> Ciphertext:
        """Drop the last prime of Q (noise divided by ~p_k); plaintext
        factor scales by p_k^{-1} mod t (identity when p_k ≡ 1 mod t)."""
        ring = ct.ring
        pk = ring.moduli[-1]
        parts = tuple(ring.rescale_mod_t(part, self.t)
                      for part in ct.parts)
        f = ct.factor * pow(pk, -1, self.t) % self.t
        return Ciphertext(ring=ring.drop_last(), parts=parts, factor=f)

    # -- SIMD slot packing ----------------------------------------------------
    def slot_encode(self, values) -> np.ndarray:
        """n slot values mod t -> plaintext polynomial coefficients (the
        inverse merged-psi NWC transform AT q = t — the plaintext ring is
        NTT-friendly exactly when t is; ring products then act slotwise).
        Requires prime t ≡ 1 (mod 2n)."""
        if self._slot_plan is None:
            raise ValueError(
                f"t={self.t} has no slot structure (need prime t ≡ 1 mod 2n)")
        plan = self._slot_plan
        v = np.asarray(values, dtype=np.int64) % self.t
        squeeze = v.ndim == 1
        if squeeze:
            v = v[None]
        out = plan.decode(nwc_inv_merged(plan, plan.encode(v)))
        return out[0] if squeeze else out

    def slot_decode(self, coeffs) -> np.ndarray:
        if self._slot_plan is None:
            raise ValueError(
                f"t={self.t} has no slot structure (need prime t ≡ 1 mod 2n)")
        plan = self._slot_plan
        v = np.asarray(coeffs, dtype=np.int64) % self.t
        squeeze = v.ndim == 1
        if squeeze:
            v = v[None]
        out = plan.decode(nwc_fwd_merged(plan, plan.encode(v)))
        return out[0] if squeeze else out


# ---------------------------------------------------------------------------
# RLWE schemes on the device mesh (channel-sharded ciphertext algebra)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ShardedCiphertext:
    """Ciphertext whose residue parts live as stacked (k, ..., n) arrays
    on a :class:`tpu_ntt.rns_sharded.ShardedRnsRing` (channel axis
    sharded across the mesh); same (1, s[, s^2]) / factor semantics as
    :class:`Ciphertext`."""

    sring: object  # ShardedRnsRing at this ciphertext's level
    parts: tuple
    factor: int = 1

    @property
    def degree(self) -> int:
        return len(self.parts) - 1


class ShardedRlweBase:
    """Mesh plumbing shared by :class:`ShardedBgv` and
    :class:`tpu_ntt.ckks.ShardedCkks` (one audited copy — round-5
    review): level chain walk, key-spectra mesh transform, the hybrid
    key switch (ModUp all-reduce -> fused 2 x dnum spectrum matvec ->
    scheme-specific ModDown via the ``_mod_down`` hook), Karatsuba
    tensor parts, Galois parts, and degree-padded part-wise add/sub
    (padding SUBTRACTION negates the unmatched part — a zip-truncate
    here silently drops the s^2 component of an unrelinearized
    ciphertext, the round-5 review's most severe finding)."""

    def __init__(self, ctx, mesh, axis: str = "ch",
                 batch_axis: str | None = None):
        from .rns_sharded import ShardedRnsRing

        self.ctx = ctx
        self.base = ShardedRnsRing(ctx.ring, mesh, axis, batch_axis)

    def _sring(self, ring: RnsRing):
        """The sharded view at ``ring``'s level (drop_last chain walk —
        each level's view is built once and cached by the chain)."""
        sr = self.base
        while tuple(sr.ring.moduli) != tuple(ring.moduli):
            if len(sr.ring.moduli) <= 1:
                raise ValueError("ciphertext ring is not a level of "
                                 "this context's modulus chain")
            sr = sr.drop_last()
        return sr

    def _sharded_specs(self, sr, ksk: KeySwitchKey):
        """(k0, k1) merged spectra of the key over the sharded extended
        basis, stacked (dnum, k_qp, n) each — transformed ONCE per
        (key, sharded ring) pair.  Keyed by the ring INSTANCE, not just
        the level moduli: one key shared by contexts over different
        meshes must not feed one mesh's committed arrays into the
        other's program (round-5 review finding; the sring instances
        are stable — cached along the drop_last chain)."""
        import jax.numpy as jnp

        cache = getattr(ksk, "_sharded_specs", None)
        if cache is None:
            cache = ksk._sharded_specs = {}
        key = (tuple(sr.ring.moduli), id(sr))
        if key not in cache:
            if ksk.raw is None:
                raise ValueError("key has no raw residues (regenerate "
                                 "with this framework's keygen)")
            qp = sr.extended(self.ctx.special)
            k0, k1 = ksk.raw
            cache[key] = tuple(
                jnp.stack([qp.nwc_fwd(qp.put(row)) for row in rows])
                for rows in (k0, k1))
        return cache[key]

    def _mod_down(self, sr, qp, u, num_special):
        raise NotImplementedError  # scheme hook (plain vs mod-t)

    def _key_switch(self, sr, part, ksk: KeySwitchKey):
        """Hybrid switch of one component on the mesh: ModUp (one
        all-reduce per digit group spanning multiple devices) -> fused
        2 x dnum spectrum matvec per extended channel (collective-free)
        -> scheme ModDown."""
        import jax.numpy as jnp

        if tuple(sr.ring.moduli) != ksk.moduli:
            raise ValueError("key-switch key was generated for a "
                             "different level")
        qp = sr.extended(self.ctx.special)
        groups = sr.digit_groups(ksk.dnum)
        k0s, k1s = self._sharded_specs(sr, ksk)
        ext = jnp.stack(sr.mod_up(part, groups, qp))
        u0, u1 = sr._hks_matvec(len(groups))(qp.tabs, qp.scal, ext,
                                             k0s, k1s)
        ns = len(self.ctx.special)
        return (self._mod_down(sr, qp, u0, ns),
                self._mod_down(sr, qp, u1, ns))

    # -- part-level algebra (scheme wrappers add factor/scale meta) ----------
    def _mul_parts(self, sr, a_parts, b_parts):
        """Karatsuba tensor product: 3 SPMD ring products, zero
        collectives."""
        c0, c1 = a_parts
        d0, d1 = b_parts
        e0 = sr.nwc_mult(c0, d0)
        e2 = sr.nwc_mult(c1, d1)
        mid = sr.nwc_mult(sr.add(c0, c1), sr.add(d0, d1))
        return (e0, sr.sub(sr.sub(mid, e0), e2), e2)

    def _combine_parts(self, sr, a_parts, b_parts, subtract: bool):
        d = max(len(a_parts), len(b_parts))
        out = []
        for i in range(d):
            pa = a_parts[i] if i < len(a_parts) else None
            pb = b_parts[i] if i < len(b_parts) else None
            if pa is None:
                out.append(sr.neg(pb) if subtract else pb)
            elif pb is None:
                out.append(pa)
            else:
                out.append(sr.sub(pa, pb) if subtract else sr.add(pa, pb))
        return tuple(out)

    def _galois_parts(self, sr, parts, g: int, gk: KeySwitchKey):
        if len(parts) != 2:
            raise ValueError("galois ops expect a degree-1 ciphertext")
        c0 = sr.automorphism(parts[0], g)
        c1 = sr.automorphism(parts[1], g)
        u0, u1 = self._key_switch(sr, c1, gk)
        return (sr.add(c0, u0), u1)


class ShardedBgv(ShardedRlweBase):
    """BGV ciphertext algebra on the channel-sharded RNS ring — the
    multi-chip form of :class:`BgvContext` (SURVEY.md §2.8's mesh mandate
    applied to the op that dominates FHE cost: key switching).

    Key generation, encryption and decryption stay on the single-chip
    context (host-randomness one-time ops); everything in the ciphertext
    HOT LOOP — tensor products, relinearization (ModUp -> fused 2 x dnum
    spectrum matvec -> t-preserving ModDown), modulus switching, Galois
    rotations — runs as SPMD programs over the mesh.  Per-channel work is
    collective-free; each digit group's ModUp costs ONE channel-axis
    all-reduce (the radix-2^16 digit-lane sum, rns_sharded.py module
    docstring).  Every operation is bit-exact vs the single-chip
    BgvContext on the same inputs (tests/test_rns_sharded.py)."""

    def _mod_down(self, sr, qp, u, num_special):
        return sr.mod_down_mod_t(qp, u, num_special, self.ctx.t)

    # -- IO ------------------------------------------------------------------
    def put_ct(self, ct: Ciphertext) -> ShardedCiphertext:
        sr = self._sring(ct.ring)
        return ShardedCiphertext(
            sring=sr,
            parts=tuple(sr.put([np.asarray(r) for r in part])
                        for part in ct.parts),
            factor=ct.factor)

    def get_ct(self, sct: ShardedCiphertext) -> Ciphertext:
        return Ciphertext(ring=sct.sring.ring,
                          parts=tuple(sct.sring.get(p) for p in sct.parts),
                          factor=sct.factor)

    def encrypt(self, pk: PublicKey, m, rng) -> ShardedCiphertext:
        return self.put_ct(self.ctx.encrypt(pk, m, rng))

    def decrypt(self, sk: SecretKey, sct: ShardedCiphertext) -> np.ndarray:
        return self.ctx.decrypt(sk, self.get_ct(sct))

    # -- ciphertext algebra --------------------------------------------------
    def _match(self, a: ShardedCiphertext, b: ShardedCiphertext):
        if tuple(a.sring.ring.moduli) != tuple(b.sring.ring.moduli):
            raise ValueError("ciphertexts live at different levels; "
                             "mod_switch to align them first")
        if a.factor == b.factor:
            return a, b
        u = a.factor * pow(b.factor, -1, self.ctx.t) % self.ctx.t
        return a, self.mul_scalar(b, u)

    def add(self, a: ShardedCiphertext, b: ShardedCiphertext):
        a, b = self._match(a, b)
        return ShardedCiphertext(
            sring=a.sring,
            parts=self._combine_parts(a.sring, a.parts, b.parts, False),
            factor=a.factor)

    def sub(self, a: ShardedCiphertext, b: ShardedCiphertext):
        a, b = self._match(a, b)
        return ShardedCiphertext(
            sring=a.sring,
            parts=self._combine_parts(a.sring, a.parts, b.parts, True),
            factor=a.factor)

    def mul_scalar(self, sct: ShardedCiphertext, u: int):
        """Centered-scalar multiply, channel-local (per-channel Barrett
        against the (k,)-vector of uc mod p).  The vmapped program is
        built ONCE per instance (a per-call jit closure would retrace
        every factor-matching add — round-5 review finding); the scalar
        vector is data."""
        import jax
        import jax.numpy as jnp

        from .modmath import barrett_mul32

        sr = sct.sring
        u %= self.ctx.t
        uc = u - self.ctx.t if u > self.ctx.t // 2 else u
        us = jnp.asarray([uc % p.q for p in sr.ring.params],
                         dtype=jnp.uint32)
        f = getattr(self, "_mul_scalar_j", None)
        if f is None:
            kb = self.base.k_bits  # same-width basis: shared Barrett k

            def per(q, mu, sc, r):
                return barrett_mul32(r, jnp.broadcast_to(sc, r.shape),
                                     q, kb, mu)

            f = self._mul_scalar_j = jax.jit(jax.vmap(per))
        parts = tuple(f(sr.scal["q"], sr.scal["mu"], us, p)
                      for p in sct.parts)
        return ShardedCiphertext(sring=sr, parts=parts, factor=sct.factor)

    def mul(self, a: ShardedCiphertext, b: ShardedCiphertext):
        """Karatsuba tensor product -> degree-2 ciphertext."""
        if a.degree != 1 or b.degree != 1:
            raise ValueError("mul expects degree-1 ciphertexts "
                             "(relinearize first)")
        a, b = self._match(a, b)
        return ShardedCiphertext(
            sring=a.sring,
            parts=self._mul_parts(a.sring, a.parts, b.parts),
            factor=a.factor * b.factor % self.ctx.t)

    def relinearize(self, sct: ShardedCiphertext, rlk: KeySwitchKey):
        if sct.degree != 2:
            raise ValueError("relinearize expects a degree-2 ciphertext")
        sr = sct.sring
        u0, u1 = self._key_switch(sr, sct.parts[2], rlk)
        return ShardedCiphertext(
            sring=sr,
            parts=(sr.add(sct.parts[0], u0), sr.add(sct.parts[1], u1)),
            factor=sct.factor)

    def mul_relin(self, a, b, rlk: KeySwitchKey):
        return self.relinearize(self.mul(a, b), rlk)

    def apply_galois(self, sct: ShardedCiphertext, g: int,
                     gk: KeySwitchKey):
        return ShardedCiphertext(
            sring=sct.sring,
            parts=self._galois_parts(sct.sring, sct.parts, g, gk),
            factor=sct.factor)

    def mod_switch(self, sct: ShardedCiphertext):
        """Drop the last prime (rescale_mod_t per part, channel-local
        with one dropped-channel broadcast); factor scales by
        p_k^{-1} mod t."""
        sr = sct.sring
        pk = sr.ring.moduli[-1]
        parts = tuple(sr.rescale_mod_t(p, self.ctx.t) for p in sct.parts)
        f = sct.factor * pow(pk, -1, self.ctx.t) % self.ctx.t
        return ShardedCiphertext(sring=sr.drop_last(), parts=parts,
                                 factor=f)
