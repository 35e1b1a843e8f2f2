"""Fused ML-KEM (Kyber) incomplete-NTT Pallas kernels on the MXU.

The workload the reference explored and abandoned
(reference: test/archive/ntt_inverse_kyber.py:1-3, a pq-crystals-derived
inverse model that never reached RTL): q = 3329 has 2-adicity 8, so the
full-size negacyclic machinery (which needs 2n | q-1) cannot express it.
FIPS-203 instead maps Z_q[x]/(x^256 + 1) onto 128 quadratic slots
Z_q[x]/(x^2 - gamma_i), gamma_i = zeta^(2*br7(i)+1), zeta = 17, and
multiplies with a 2x2 base case per slot.

TPU-first design — this transform is a PERFECT fit for one MXU tile:

* Split a(x) = a_e(x^2) + x*a_o(x^2).  Then the FIPS NTT is
  a_hat[2i] = sum_j a_e[j] * gamma_i^j (same for odd), i.e. each half is a
  dense length-128 DFT-like product — ONE 128x128 matmul, no butterfly
  network, no bit-reversal (the br7 ordering is baked into the matrix
  columns).  A group of 64 polynomials = 128 rows = one MXU pass.
* q < 2^12, so operands split into TWO 6-BIT limbs that are individually
  < 64: they fit the int8 systolic pipeline UNSIGNED, with no zero-point
  correction, no line sums, no BASE tables (contrast kernels/mxu.py, whose
  8-bit limbs of 24-bit operands need the offset-by-128 scheme).  Four
  int8 dots per matmul; every int32 partial sum is exact, and the
  recombined total S < 128 * q^2 < 2^31 fits ONE word.
* All transform-internal values live in the Montgomery domain (R = 2^32):
  the forward matrix carries gamma_i^j * R^2 (REDC of plain*W*R^2 ENTERS
  the domain), the base-case multiply runs mont_mul against a
  Montgomery-form gamma table, and the inverse matrix is plain (REDC
  EXITS) with 128^-1 folded in — zero standalone domain-conversion passes
  (the same fold scheme as kernels/mxu.py).
* Pair layout for the base case: within a 128-row group, rows 0..63 are
  the even halves of 64 polys and rows 64..127 the odd halves, so the 2x2
  slot products are contiguous-half slices + concat (Mosaic supports no
  strided slices; CLAUDE.md).

Bit-exactness contract: every entry point equals the FIPS-203 golden
(reference.kyber_ntt / kyber_intt / kyber_basemul) on [0, q) inputs —
tests/test_kyber.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..modmath import add_mod32, mont_mul32, mul32
from ..reference import KYBER_N, KYBER_Q, KYBER_ZETA, _br7

U32 = jnp.uint32
LANES = 128
#: polynomials per 128x128 MXU group (2 rows each: even + odd half)
POLYS_PER_GROUP = 64


def _gamma_table() -> list[int]:
    """gamma_i = zeta^(2*br7(i)+1) — the quadratic-slot moduli x^2 - gamma_i
    in FIPS-203 serialization order."""
    q = KYBER_Q
    return [pow(KYBER_ZETA, 2 * _br7(i) + 1, q) for i in range(LANES)]


def _fwd_matrix() -> np.ndarray:
    """M[j, i] = gamma_i^j: a_hat_half = a_half @ M (definitional form of
    FIPS-203 Algorithm 9 on each parity class; verified against the
    butterfly golden in tests)."""
    q = KYBER_Q
    out = np.empty((LANES, LANES), dtype=np.uint32)
    for i, g in enumerate(_gamma_table()):
        cur = 1
        for j in range(LANES):
            out[j, i] = cur
            cur = cur * g % q
    return out


def _inv_matrix() -> np.ndarray:
    """Minv[i, j] = 128^-1 * gamma_i^-j: a_half = a_hat_half @ Minv
    (Algorithm 10 semantics, the n/2^-1 scale folded in)."""
    q = KYBER_Q
    half_inv = pow(LANES, q - 2, q)
    out = np.empty((LANES, LANES), dtype=np.uint32)
    for i, g in enumerate(_gamma_table()):
        gi = pow(g, q - 2, q)
        cur = half_inv
        for j in range(LANES):
            out[i, j] = cur
            cur = cur * gi % q
    return out


class KyberPlan:
    """Host-side constants + Pallas kernels for the fixed ML-KEM ring
    (n = 256, q = 3329 — FIPS-203 leaves no parameter freedom here).

    Data layout: (B, 256) uint32 coefficient arrays in natural order;
    spectra in FIPS-203 NTT serialization order ((a_hat[2i], a_hat[2i+1])
    interleaved).  ``spectrum`` outputs live in the internal Montgomery
    domain (cacheable operand form, like MxuPlan.nwc_spectrum).
    """

    name = "pallas-kyber"
    pairs = False

    def __init__(self):
        q = KYBER_Q
        self.q = q
        r = (1 << 32) % q
        r2 = r * r % q
        self.q_prime = (-pow(q, -1, 1 << 32)) % (1 << 32)

        fwd = _fwd_matrix().astype(object)
        inv = _inv_matrix().astype(object)

        def w_limbs(m) -> jnp.ndarray:
            """(128,128) uint32 < q -> (2,128,128) int8 of UNSIGNED 6-bit
            limbs (both < 64 because q < 2^12: no zero-point needed)."""
            m = m.astype(np.uint32)
            return jnp.asarray(
                np.stack([m & 63, m >> 6]).astype(np.int8)
            )

        # forward, Montgomery out (fused pipelines / cached spectra):
        # REDC(x_plain * w*R^2) = x*w*R
        self.wf_mont = w_limbs(fwd * r2 % q)
        # forward, plain out (standalone FIPS ntt): REDC(x * w*R) = x*w
        self.wf_plain = w_limbs(fwd * r % q)
        # inverse consuming Montgomery spectra, plain out (fused):
        # REDC(x*R * w) = x*w
        self.wi_exit = w_limbs(inv)
        # inverse consuming PLAIN spectra, plain out (standalone intt)
        self.wi_plain = w_limbs(inv * r % q)

        # base-case gamma in Montgomery form, tiled to the top-half rows'
        # shape (every row identical; the kernel slices rows 0..63)
        gam_mont = np.array(
            [g * (1 << 32) % q for g in _gamma_table()], dtype=np.uint32
        )
        self.gam = jnp.asarray(np.tile(gam_mont, (LANES, 1)))

    # ------------------------------------------------------------------
    # In-kernel primitives
    # ------------------------------------------------------------------

    def _redc32(self, s):
        """REDC of a single-word total: s * R^-1 mod q, exact for
        s < q*R (here s < 128*q^2 < 2^31)."""
        m = s * U32(self.q_prime)
        mq_hi, _ = mul32(m, jnp.full_like(s, self.q))
        t = mq_hi + (s != 0).astype(U32)
        return jnp.where(t >= self.q, t - U32(self.q), t)

    def _mm(self, x, w):
        """REDC( x @ W ) via four unsigned 6-bit-limb int8 MXU dots.

        x: (128, 128) uint32 values < q (any domain); w: (2, 128, 128)
        int8 limb stack of W (< 64 each).  True total
        S = sum_j x_j * W_j < 128 * q^2 = 1.42e9 < 2^31, so the int32
        accumulations and the single-word recombination are exact."""
        i8, i32 = jnp.int8, jnp.int32
        x0 = (x & 63).astype(i32).astype(i8)
        x1 = (x >> 6).astype(i32).astype(i8)
        w0, w1 = w[0], w[1]
        d0 = jnp.dot(x0, w0, preferred_element_type=i32)
        dm = jnp.dot(x0, w1, preferred_element_type=i32) + jnp.dot(
            x1, w0, preferred_element_type=i32
        )
        d2 = jnp.dot(x1, w1, preferred_element_type=i32)
        s = d0.astype(U32) + (dm.astype(U32) << 6) + (d2.astype(U32) << 12)
        return self._redc32(s)

    def _basemul(self, a, b, gam):
        """128 independent products in Z_q[x]/(x^2 - gamma_i) on the pair
        layout (rows 0..63 = even halves, 64..127 = odd halves), all values
        Montgomery (FIPS-203 Algorithm 12 semantics):
          c_e = a_e*b_e + a_o*b_o*gamma ; c_o = a_e*b_o + a_o*b_e."""
        q, qp = self.q, self.q_prime
        mont = lambda x, y: mont_mul32(x, y, q, qp)
        h = LANES // 2
        ae, ao = a[:h], a[h:]
        be, bo = b[:h], b[h:]
        ce = add_mod32(mont(ae, be), mont(mont(ao, bo), gam[:h]), q)
        co = add_mod32(mont(ae, bo), mont(ao, be), q)
        return jnp.concatenate([ce, co], axis=0)

    # ------------------------------------------------------------------
    # Kernel bodies
    # ------------------------------------------------------------------

    def _poly_mult_kernel(self, a_ref, b_ref, wf, wi, gam_ref, out_ref):
        gam = gam_ref[...]
        for g in range(a_ref.shape[0]):
            fa = self._mm(a_ref[g], wf)
            fb = self._mm(b_ref[g], wf)
            out_ref[g] = self._mm(self._basemul(fa, fb, gam), wi)

    def _cached_kernel(self, a_ref, spec_ref, wf, wi, gam_ref, out_ref):
        gam = gam_ref[...]
        for g in range(a_ref.shape[0]):
            fa = self._mm(a_ref[g], wf)
            out_ref[g] = self._mm(self._basemul(fa, spec_ref[g], gam), wi)

    def _transform_kernel(self, x_ref, w, out_ref):
        for g in range(x_ref.shape[0]):
            out_ref[g] = self._mm(x_ref[g], w)

    def _make_dot_kernel(self, cached: bool):
        def kernel(a_ref, b_ref, wf, wi, gam_ref, out_ref):
            gam = gam_ref[...]
            for g in range(a_ref.shape[0]):
                acc = None
                for k in range(a_ref.shape[1]):
                    fb = b_ref[g, k] if cached else self._mm(b_ref[g, k], wf)
                    c = self._basemul(self._mm(a_ref[g, k], wf), fb, gam)
                    acc = c if acc is None else add_mod32(acc, c, self.q)
                out_ref[g] = self._mm(acc, wi)

        return kernel

    def _make_matvec_kernel(self, k: int, l: int):
        """A_hat o s_hat + INTT, the K-PKE matrix-vector shape (FIPS-203
        Algorithms 13-14: t_hat = A_hat o s_hat; u = INTT(A_hat^T o r_hat)):
        s transformed once, l + k transforms for k*l slot products."""

        def kernel(s_ref, a_ref, wf, wi, gam_ref, out_ref):
            gam = gam_ref[...]
            for g in range(s_ref.shape[0]):
                fs = [self._mm(s_ref[g, j], wf) for j in range(l)]
                for i in range(k):
                    acc = None
                    for j in range(l):
                        c = self._basemul(fs[j], a_ref[i, j], gam)
                        acc = c if acc is None else add_mod32(acc, c, self.q)
                    out_ref[g, i] = self._mm(acc, wi)

        return kernel

    # ------------------------------------------------------------------
    # Layout + pallas_call plumbing
    # ------------------------------------------------------------------

    groups_per_step = 8

    def _eff_gps(self, batch: int) -> int:
        groups = -(-batch // POLYS_PER_GROUP)
        return max(1, min(self.groups_per_step, groups))

    def _group(self, x):
        """(B, 256) uint32 -> ((G, 128, 128) groups, B): each group holds
        64 polys as [even halves; odd halves] row blocks."""
        b = x.shape[0]
        step = POLYS_PER_GROUP * self._eff_gps(b)
        pad = (-b) % step
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad, KYBER_N), U32)], axis=0)
        r = x.reshape(-1, LANES, 2)
        e = r[:, :, 0].reshape(-1, POLYS_PER_GROUP, LANES)
        o = r[:, :, 1].reshape(-1, POLYS_PER_GROUP, LANES)
        return jnp.concatenate([e, o], axis=1), b

    def _ungroup(self, g, bsz):
        e = g[:, :POLYS_PER_GROUP].reshape(-1, LANES)
        o = g[:, POLYS_PER_GROUP:].reshape(-1, LANES)
        return jnp.stack([e, o], axis=-1).reshape(-1, KYBER_N)[:bsz]

    def _call(self, kernel, data_args, table_args, interpret=False):
        gps = self._eff_gps(data_args[0].shape[0] * POLYS_PER_GROUP)
        g = data_args[0].shape[0]
        data_spec = pl.BlockSpec(
            (gps, LANES, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        w_spec = pl.BlockSpec(
            (2, LANES, LANES), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        )
        tbl_spec = pl.BlockSpec(
            (LANES, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        in_specs = [data_spec] * len(data_args) + [
            w_spec if a.dtype == jnp.int8 else tbl_spec for a in table_args
        ]
        return pl.pallas_call(
            kernel,
            grid=(g // gps,),
            out_shape=jax.ShapeDtypeStruct((g, LANES, LANES), U32),
            in_specs=in_specs,
            out_specs=data_spec,
            interpret=interpret,
        )(*data_args, *table_args)

    # ------------------------------------------------------------------
    # Public entry points ((B, 256) uint32 in FIPS coefficient/NTT order)
    # ------------------------------------------------------------------

    def poly_mult(self, a, b, interpret: bool = False):
        """Negacyclic product in Z_q[x]/(x^256 + 1) via the incomplete NTT:
        two forwards, 128 base-case products, one inverse — one kernel."""
        ga, bsz = self._group(a)
        gb, _ = self._group(b)
        out = self._call(
            self._poly_mult_kernel, (ga, gb),
            (self.wf_mont, self.wi_exit, self.gam), interpret=interpret,
        )
        return self._ungroup(out, bsz)

    def ntt(self, x, interpret: bool = False):
        """FIPS-203 Algorithm 9: plain spectrum in serialization order."""
        gx, bsz = self._group(x)
        out = self._call(
            self._transform_kernel, (gx,), (self.wf_plain,),
            interpret=interpret,
        )
        return self._ungroup(out, bsz)

    def intt(self, x, interpret: bool = False):
        """FIPS-203 Algorithm 10 (consumes plain serialization-order
        spectra, e.g. deserialized ML-KEM keys)."""
        gx, bsz = self._group(x)
        out = self._call(
            self._transform_kernel, (gx,), (self.wi_plain,),
            interpret=interpret,
        )
        return self._ungroup(out, bsz)

    def spectrum(self, x, interpret: bool = False):
        """Cacheable operand spectrum (internal Montgomery domain) for
        ``poly_mult_cached`` / ``dot_cached`` / ``matvec``."""
        gx, bsz = self._group(x)
        out = self._call(
            self._transform_kernel, (gx,), (self.wf_mont,),
            interpret=interpret,
        )
        return self._ungroup(out, bsz)

    def poly_mult_cached(self, a, spec, interpret: bool = False):
        """Product against a precomputed ``spectrum`` — one forward
        instead of two (fixed-operand workloads)."""
        ga, bsz = self._group(a)
        gs, _ = self._group(spec)
        out = self._call(
            self._cached_kernel, (ga, gs),
            (self.wf_mont, self.wi_exit, self.gam), interpret=interpret,
        )
        return self._ungroup(out, bsz)

    def _dot_call(self, a, b, cached: bool, interpret: bool):
        K = a.shape[0]
        if not 1 <= K <= 8:
            raise ValueError(f"dot supports 1 <= K <= 8 pairs, got {K}")

        def stack(x):
            gs, bsz = [], None
            for k in range(K):
                gk, bsz = self._group(x[k])
                gs.append(gk)
            return jnp.stack(gs, axis=1), bsz

        ga, bsz = stack(a)
        gb, _ = stack(b)
        g = ga.shape[0]
        gps = self._eff_gps(g * POLYS_PER_GROUP)
        data_spec = pl.BlockSpec(
            (gps, K, LANES, LANES), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_spec = pl.BlockSpec(
            (gps, LANES, LANES), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )
        w_spec = pl.BlockSpec(
            (2, LANES, LANES), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        )
        tbl_spec = pl.BlockSpec(
            (LANES, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            self._make_dot_kernel(cached),
            grid=(g // gps,),
            out_shape=jax.ShapeDtypeStruct((g, LANES, LANES), U32),
            in_specs=[data_spec] * 2 + [w_spec, w_spec, tbl_spec],
            out_specs=out_spec,
            interpret=interpret,
        )(ga, gb, self.wf_mont, self.wi_exit, self.gam)
        return self._ungroup(out, bsz)

    def dot(self, a, b, interpret: bool = False):
        """INTT(sum_k NTT(a_k) o NTT(b_k)) for (K, B, 256) stacks — the
        ML-KEM decrypt inner product shape (w = v - INTT(s_hat^T o u_hat)),
        one inverse per output."""
        return self._dot_call(a, b, cached=False, interpret=interpret)

    def dot_cached(self, a, spectra, interpret: bool = False):
        """Dot against precomputed Montgomery ``spectrum`` stacks: K
        forwards + one inverse (fixed key vectors)."""
        return self._dot_call(a, spectra, cached=True, interpret=interpret)

    def matvec_spectra(self, A, interpret: bool = False):
        """Spectra of a fixed (k, l, 256) poly matrix (the expanded ML-KEM
        matrix A_hat — which FIPS-203 samples DIRECTLY in the NTT domain;
        use ``ntt_domain_blocks`` when A_hat is already a spectrum), tiled
        to (k, l, 128, 128) group blocks for ``matvec``."""
        k, l = A.shape[0], A.shape[1]
        spec = self.spectrum(A.reshape(k * l, KYBER_N), interpret=interpret)
        return self._spec_blocks(spec.reshape(k, l, KYBER_N))

    def ntt_domain_blocks(self, A_hat):
        """(k, l, 256) PLAIN serialization-order spectra (e.g. the matrix
        FIPS-203 Algorithm 13 samples via SampleNTT) -> Montgomery group
        blocks for ``matvec``."""
        r = (1 << 32) % self.q
        # enter the Montgomery domain: one elementwise scale on host/XLA
        mont = _to_mont_xla(jnp.asarray(A_hat, dtype=U32), self.q,
                            self.q_prime, r)
        return self._spec_blocks(mont)

    def _spec_blocks(self, spec):
        k, l = spec.shape[0], spec.shape[1]
        r = spec.reshape(k, l, LANES, 2)
        e = jnp.tile(r[:, :, None, :, 0], (1, 1, POLYS_PER_GROUP, 1))
        o = jnp.tile(r[:, :, None, :, 1], (1, 1, POLYS_PER_GROUP, 1))
        return jnp.concatenate([e, o], axis=2)  # (k, l, 128, 128)

    def matvec(self, s, A_blocks, interpret: bool = False):
        """Fused A o s + INTT over R_q^(k x l): s is (l, B, 256)
        coefficients, A_blocks from ``matvec_spectra``/``ntt_domain_blocks``;
        returns (k, B, 256) with out[i] = INTT(sum_j A_hat[i,j] o NTT(s_j))
        — l + k transforms for k*l products (K-PKE key-gen/encrypt)."""
        k, l = A_blocks.shape[0], A_blocks.shape[1]
        if s.shape[0] != l:
            raise ValueError(f"s has {s.shape[0]} rows, A has l={l} columns")
        if not (1 <= l <= 8 and 1 <= k <= 8):
            raise ValueError(f"matvec supports 1 <= k, l <= 8, got {k=} {l=}")
        gs_list, bsz = [], None
        for j in range(l):
            gj, bsz = self._group(s[j])
            gs_list.append(gj)
        gs = jnp.stack(gs_list, axis=1)
        g = gs.shape[0]
        gps = self._eff_gps(g * POLYS_PER_GROUP)
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
        w_spec = pl.BlockSpec(
            (2, LANES, LANES), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        )
        tbl_spec = pl.BlockSpec(
            (LANES, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            self._make_matvec_kernel(k, l),
            grid=(g // gps,),
            out_shape=jax.ShapeDtypeStruct((g, k, LANES, LANES), U32),
            in_specs=[data_spec, a_spec, w_spec, w_spec, tbl_spec],
            out_specs=out_spec,
            interpret=interpret,
        )(gs, A_blocks, self.wf_mont, self.wi_exit, self.gam)
        outs = [self._ungroup(out[:, i], bsz) for i in range(k)]
        return jnp.stack(outs)


def _to_mont_xla(x, q, q_prime, r):
    """x * R mod q elementwise (XLA, outside kernels): mont_mul with R^2."""
    r2 = r * r % q
    return mont_mul32(x, jnp.full_like(x, r2), q, q_prime)
