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
* **Parity-in-matrix layout (v2, the default since round 5).**  The
  measured bound of the pair layout was never the compute: 61% of
  poly_mult's wall was the XLA-side even/odd LANE deinterleave building
  the pair blocks (0.361 ms end-to-end vs 0.139 ms kernel at B=16384 on
  chip).  v2 absorbs the parity split/merge into the transform matrices
  (256-contraction from the RAW natural layout — grouping becomes a pure
  reshape; MACs double on a ~9%-utilized MXU) and lifts poly_mult from
  45.4M to 99.3M/s, cached to 116.7M/s, matvec-768 to 145M eff
  slot-prod/s (BENCH_NOTES round 5).  ``parity_matrices = False``
  restores the pair path (ablation record); the standalone FIPS
  ntt/intt keep the pair path (serialization-order interop surface, not
  the hot loop).

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

        # ---- parity-in-matrix tables (round-5 layout redesign) -----------
        # The measured bound of this kernel was never the MXU: 61% of
        # poly_mult's time was the XLA-side even/odd LANE deinterleave
        # feeding the pair layout (0.361 ms end-to-end vs 0.139 ms kernel
        # at B=16384; the lane-granularity gather alone 0.108 ms —
        # BENCH_NOTES round 5).  Fix: absorb the parity SELECTION into
        # the transform matrices.  With X the raw natural (128-poly,
        # 256-lane) coefficient block — a pure reshape of the user
        # array, zero relayout — the even-half spectrum is
        # X @ We with We[2j, i] = M[j, i] (odd rows zero), the odd half
        # X @ Wo with the odd rows populated, and the inverse emits
        # natural order directly through the column-interleaved pair
        # (Ie[k, 2i] = Minv[k, i], Io[k, 2i+1] = Minv[k, i]) summed
        # BEFORE one REDC (S < 2*128*q^2 = 2.8e9 < 2^32: exact).  MACs
        # double (half of each 256-contraction is zeros) — the ~9%-busy
        # MXU absorbs that for free; the basemul now runs on full
        # 128-row tiles (was: half-slices of a 64-poly pair block).
        def parity_rows(m):
            out = np.zeros((2 * LANES, LANES), dtype=object)
            out[0::2], out[1::2] = m, 0 * m
            return out

        def parity_rows_odd(m):
            out = np.zeros((2 * LANES, LANES), dtype=object)
            out[1::2] = m
            return out

        def parity_cols(m):
            e = np.zeros((LANES, 2 * LANES), dtype=object)
            o = np.zeros((LANES, 2 * LANES), dtype=object)
            e[:, 0::2], o[:, 1::2] = m, m
            return e, o

        fwd_mont = fwd * r2 % q
        self.wfe_mont = w_limbs(parity_rows(fwd_mont))
        self.wfo_mont = w_limbs(parity_rows_odd(fwd_mont))
        ie, io = parity_cols(inv)
        self.wie_exit = w_limbs(ie)
        self.wio_exit = w_limbs(io)

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

    def _dots(self, x, w):
        """The four unsigned 6-bit-limb int8 MXU dots of x @ W, kept as
        int32 partials (shape-generic: (M, K) @ (2, K, N))."""
        i8, i32 = jnp.int8, jnp.int32
        x0 = (x & 63).astype(i32).astype(i8)
        x1 = (x >> 6).astype(i32).astype(i8)
        w0, w1 = w[0], w[1]
        d0 = jnp.dot(x0, w0, preferred_element_type=i32)
        dm = jnp.dot(x0, w1, preferred_element_type=i32) + jnp.dot(
            x1, w0, preferred_element_type=i32
        )
        d2 = jnp.dot(x1, w1, preferred_element_type=i32)
        return d0, dm, d2

    def _mm(self, x, w):
        """REDC( x @ W ) via four unsigned 6-bit-limb int8 MXU dots.

        x: (M, K) uint32 values < q (any domain); w: (2, K, N) int8 limb
        stack of W (< 64 each).  True total S = sum_j x_j * W_j
        <= 128 * q^2 = 1.42e9 < 2^31 for every matrix here (the K = 256
        parity matrices have half their rows zero), so the int32
        accumulations and the single-word recombination are exact."""
        d0, dm, d2 = self._dots(x, w)
        s = d0.astype(U32) + (dm.astype(U32) << 6) + (d2.astype(U32) << 12)
        return self._redc32(s)

    def _mm_sum2(self, xa, wa, xb, wb):
        """REDC( xa @ Wa + xb @ Wb ) — both products accumulated BEFORE
        one REDC (the v2 inverse: even + odd column-interleaved halves).
        True total <= 2 * 128 * q^2 = 2.8e9 < 2^32: recombination exact
        in uint32, REDC valid (S < q*R)."""
        a0, am, a2 = self._dots(xa, wa)
        b0, bm, b2 = self._dots(xb, wb)
        s = ((a0 + b0).astype(U32) + ((am + bm).astype(U32) << 6)
             + ((a2 + b2).astype(U32) << 12))
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

    def _basemul_v2(self, ae, ao, be, bo, gam):
        """128 slot products on full 128-row tiles (v2 layout: even and
        odd halves are separate tiles, no half-slicing)."""
        q, qp = self.q, self.q_prime
        mont = lambda x, y: mont_mul32(x, y, q, qp)
        ce = add_mod32(mont(ae, be), mont(mont(ao, bo), gam), q)
        co = add_mod32(mont(ae, bo), mont(ao, be), q)
        return ce, co

    def _poly_mult_kernel_v2(self, a_ref, b_ref, wfe, wfo, wie, wio,
                             gam_ref, out_ref):
        """Parity-in-matrix body: raw natural (128-poly, 256-lane) blocks
        in and out (grouping = reshape, zero relayout — see the table
        comment in __init__); the parity split/merge rides the matmul
        contractions, the basemul runs on full 128-row tiles."""
        gam = gam_ref[...]
        for g in range(a_ref.shape[0]):
            X, Y = a_ref[g], b_ref[g]
            ae, ao = self._mm(X, wfe), self._mm(X, wfo)
            be, bo = self._mm(Y, wfe), self._mm(Y, wfo)
            ce, co = self._basemul_v2(ae, ao, be, bo, gam)
            out_ref[g] = self._mm_sum2(ce, wie, co, wio)

    def _spectrum_kernel_v2(self, x_ref, wfe, wfo, wie, wio, gam_ref,
                            out_ref):
        """Cacheable v2 spectrum: lanes [a_e-hat (128) | a_o-hat (128)]
        per row (backend-internal layout, Montgomery domain)."""
        del wie, wio, gam_ref
        for g in range(x_ref.shape[0]):
            X = x_ref[g]
            out_ref[g] = jnp.concatenate(
                [self._mm(X, wfe), self._mm(X, wfo)], axis=-1)

    def _cached_kernel_v2(self, a_ref, spec_ref, wfe, wfo, wie, wio,
                          gam_ref, out_ref):
        gam = gam_ref[...]
        for g in range(a_ref.shape[0]):
            X, S = a_ref[g], spec_ref[g]
            ae, ao = self._mm(X, wfe), self._mm(X, wfo)
            ce, co = self._basemul_v2(ae, ao, S[:, :LANES], S[:, LANES:],
                                      gam)
            out_ref[g] = self._mm_sum2(ce, wie, co, wio)

    def _make_dot_kernel_v2(self, cached: bool):
        def kernel(a_ref, b_ref, wfe, wfo, wie, wio, gam_ref, out_ref):
            gam = gam_ref[...]
            q = self.q
            for g in range(a_ref.shape[0]):
                acc_e = acc_o = None
                for k in range(a_ref.shape[1]):
                    X = a_ref[g, k]
                    ae, ao = self._mm(X, wfe), self._mm(X, wfo)
                    if cached:
                        S = b_ref[g, k]
                        be, bo = S[:, :LANES], S[:, LANES:]
                    else:
                        Y = b_ref[g, k]
                        be, bo = self._mm(Y, wfe), self._mm(Y, wfo)
                    ce, co = self._basemul_v2(ae, ao, be, bo, gam)
                    if acc_e is None:
                        acc_e, acc_o = ce, co
                    else:
                        acc_e = add_mod32(acc_e, ce, q)
                        acc_o = add_mod32(acc_o, co, q)
                out_ref[g] = self._mm_sum2(acc_e, wie, acc_o, wio)

        return kernel

    def _make_matvec_kernel_v2(self, k: int, l: int):
        def kernel(s_ref, a_ref, wfe, wfo, wie, wio, gam_ref, out_ref):
            gam = gam_ref[...]
            q = self.q
            for g in range(s_ref.shape[0]):
                fs = [(self._mm(s_ref[g, j], wfe),
                       self._mm(s_ref[g, j], wfo)) for j in range(l)]
                for i in range(k):
                    acc_e = acc_o = None
                    for j in range(l):
                        S = a_ref[i, j]
                        ce, co = self._basemul_v2(
                            fs[j][0], fs[j][1], S[:, :LANES], S[:, LANES:],
                            gam)
                        if acc_e is None:
                            acc_e, acc_o = ce, co
                        else:
                            acc_e = add_mod32(acc_e, ce, q)
                            acc_o = add_mod32(acc_o, co, q)
                    out_ref[g, i] = self._mm_sum2(acc_e, wie, acc_o, wio)

        return kernel

    def _poly_mult_kernel_st(self, a_ref, b_ref, wf, wi, gam_ref, out_ref):
        """Super-tile variant (round-5 Kyber roofline A/B): the per-group
        (128, 128) @ (128, 128) matmuls are too SHORT to stream the
        systolic array — M = 128 barely covers the MXU pipeline latency
        and re-pays the weight-load per group (the hypothesized bound
        behind the 11.5%-of-peak roofline row, DESIGN.md §2.5b).  Here
        all gps groups' rows are collapsed into ONE (gps*128, 128) LHS
        per limb product (M = 1024 at gps=8), so each weight load is
        amortized 8x; the base-case products stay per-group (static
        contiguous row slices — elementwise VPU work gains nothing from
        batching)."""
        gam = gam_ref[...]
        G = a_ref.shape[0]
        af = a_ref[...].reshape(G * LANES, LANES)
        bf = b_ref[...].reshape(G * LANES, LANES)
        fa = self._mm(af, wf)
        fb = self._mm(bf, wf)
        c = jnp.concatenate(
            [self._basemul(fa[g * LANES:(g + 1) * LANES],
                           fb[g * LANES:(g + 1) * LANES], gam)
             for g in range(G)], axis=0)
        out_ref[...] = self._mm(c, wi).reshape(G, LANES, LANES)

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

    #: route poly_mult through the super-tile kernel body (M = gps*128
    #: matmuls instead of per-group M = 128) — measured +2.6% only: the
    #: MXU was never the bound (BENCH_NOTES round 5)
    supertile = False
    #: parity-in-matrix natural-layout body (the measured winner)
    parity_matrices = True

    def _eff_gps_v2(self, batch: int) -> int:
        groups = -(-batch // LANES)  # v2 groups hold 128 polys
        return max(1, min(self.groups_per_step, groups))

    def _group_v2(self, x):
        """(B, 256) -> (G, 128, 256) raw natural blocks: pure reshape."""
        b = x.shape[0]
        step = LANES * self._eff_gps_v2(b)
        pad = (-b) % step
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad, KYBER_N), U32)], axis=0)
        return x.reshape(-1, LANES, KYBER_N), b

    def _call_v2(self, kernel, data_args, interpret=False):
        gps = self._eff_gps_v2(data_args[0].shape[0] * LANES)
        g = data_args[0].shape[0]
        data_spec = pl.BlockSpec(
            (gps, LANES, KYBER_N), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )
        wf_spec = pl.BlockSpec(
            (2, KYBER_N, LANES), lambda i: (0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        wi_spec = pl.BlockSpec(
            (2, LANES, KYBER_N), lambda i: (0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        tbl_spec = pl.BlockSpec(
            (LANES, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            kernel,
            grid=(g // gps,),
            out_shape=jax.ShapeDtypeStruct((g, LANES, KYBER_N), U32),
            in_specs=[data_spec] * len(data_args)
            + [wf_spec, wf_spec, wi_spec, wi_spec, tbl_spec],
            out_specs=data_spec,
            interpret=interpret,
        )(*data_args, self.wfe_mont, self.wfo_mont, self.wie_exit,
          self.wio_exit, self.gam)

    def poly_mult(self, a, b, interpret: bool = False):
        """Negacyclic product in Z_q[x]/(x^256 + 1) via the incomplete NTT:
        two forwards, 128 base-case products, one inverse — one kernel."""
        if self.parity_matrices:
            ga, bsz = self._group_v2(a)
            gb, _ = self._group_v2(b)
            out = self._call_v2(self._poly_mult_kernel_v2, (ga, gb),
                                interpret=interpret)
            return out.reshape(-1, KYBER_N)[:bsz]
        ga, bsz = self._group(a)
        gb, _ = self._group(b)
        body = (self._poly_mult_kernel_st if self.supertile
                else self._poly_mult_kernel)
        out = self._call(
            body, (ga, gb),
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
        ``poly_mult_cached`` / ``dot_cached`` / ``matvec``.  Layout is
        BACKEND-INTERNAL (dispatch contract): v2 emits [e-hat | o-hat]
        lane-concatenated rows, the pair path FIPS-interleaved rows —
        always consume spectra with the same plan/flags."""
        if self.parity_matrices:
            gx, bsz = self._group_v2(x)
            out = self._call_v2(self._spectrum_kernel_v2, (gx,),
                                interpret=interpret)
            return out.reshape(-1, KYBER_N)[:bsz]
        gx, bsz = self._group(x)
        out = self._call(
            self._transform_kernel, (gx,), (self.wf_mont,),
            interpret=interpret,
        )
        return self._ungroup(out, bsz)

    def poly_mult_cached(self, a, spec, interpret: bool = False):
        """Product against a precomputed ``spectrum`` — one forward
        instead of two (fixed-operand workloads)."""
        if self.parity_matrices:
            ga, bsz = self._group_v2(a)
            gs, _ = self._group_v2(spec)
            out = self._call_v2(self._cached_kernel_v2, (ga, gs),
                                interpret=interpret)
            return out.reshape(-1, KYBER_N)[:bsz]
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
        if self.parity_matrices:
            def stack2(x):
                gs, bsz = [], None
                for k in range(K):
                    gk, bsz = self._group_v2(x[k])
                    gs.append(gk)
                return jnp.stack(gs, axis=1), bsz

            ga, bsz = stack2(a)
            gb, _ = stack2(b)
            g = ga.shape[0]
            gps = self._eff_gps_v2(g * LANES)
            data_spec = pl.BlockSpec(
                (gps, K, LANES, KYBER_N), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            out_spec = pl.BlockSpec(
                (gps, LANES, KYBER_N), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
            wf_spec = pl.BlockSpec(
                (2, KYBER_N, LANES), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            wi_spec = pl.BlockSpec(
                (2, LANES, KYBER_N), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            tbl_spec = pl.BlockSpec(
                (LANES, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
            )
            out = pl.pallas_call(
                self._make_dot_kernel_v2(cached),
                grid=(g // gps,),
                out_shape=jax.ShapeDtypeStruct((g, LANES, KYBER_N), U32),
                in_specs=[data_spec] * 2
                + [wf_spec, wf_spec, wi_spec, wi_spec, tbl_spec],
                out_specs=out_spec,
                interpret=interpret,
            )(ga, gb, self.wfe_mont, self.wfo_mont, self.wie_exit,
              self.wio_exit, self.gam)
            return out.reshape(-1, KYBER_N)[:bsz]

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
        if self.parity_matrices:
            return self._spec_blocks_v2(spec.reshape(k, l, KYBER_N))
        return self._spec_blocks(spec.reshape(k, l, KYBER_N))

    def ntt_domain_blocks(self, A_hat):
        """(k, l, 256) PLAIN serialization-order spectra (e.g. the matrix
        FIPS-203 Algorithm 13 samples via SampleNTT) -> Montgomery group
        blocks for ``matvec``."""
        r = (1 << 32) % self.q
        # enter the Montgomery domain: one elementwise scale on host/XLA
        mont = _to_mont_xla(jnp.asarray(A_hat, dtype=U32), self.q,
                            self.q_prime, r)
        if self.parity_matrices:
            # external serialization order -> the v2 [e|o] lane-concat
            # layout (one-time per key, XLA-side)
            k, l = mont.shape[0], mont.shape[1]
            rr = mont.reshape(k, l, LANES, 2)
            v2 = jnp.concatenate([rr[..., 0], rr[..., 1]], axis=-1)
            return self._spec_blocks_v2(v2)
        return self._spec_blocks(mont)

    def _spec_blocks_v2(self, spec):
        """(k, l, 256) v2-layout spectra -> (k, l, 128, 256) row-tiled
        blocks (each row identical: one fixed polynomial per matrix
        entry, broadcast over the 128 batch rows of a group)."""
        return jnp.tile(spec[:, :, None, :], (1, 1, LANES, 1))

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
        if self.parity_matrices:
            gs_list, bsz = [], None
            for j in range(l):
                gj, bsz = self._group_v2(s[j])
                gs_list.append(gj)
            gs = jnp.stack(gs_list, axis=1)
            g = gs.shape[0]
            gps = self._eff_gps_v2(g * LANES)
            data_spec = pl.BlockSpec(
                (gps, l, LANES, KYBER_N), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            a_spec = pl.BlockSpec(
                (k, l, LANES, KYBER_N), lambda i: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            out_spec = pl.BlockSpec(
                (gps, k, LANES, KYBER_N), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            wf_spec = pl.BlockSpec(
                (2, KYBER_N, LANES), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            wi_spec = pl.BlockSpec(
                (2, LANES, KYBER_N), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            tbl_spec = pl.BlockSpec(
                (LANES, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
            )
            out = pl.pallas_call(
                self._make_matvec_kernel_v2(k, l),
                grid=(g // gps,),
                out_shape=jax.ShapeDtypeStruct((g, k, LANES, KYBER_N),
                                               U32),
                in_specs=[data_spec, a_spec, wf_spec, wf_spec, wi_spec,
                          wi_spec, tbl_spec],
                out_specs=out_spec,
                interpret=interpret,
            )(gs, A_blocks, self.wfe_mont, self.wfo_mont, self.wie_exit,
              self.wio_exit, self.gam)
            return jnp.stack([out[:, i].reshape(-1, KYBER_N)[:bsz]
                              for i in range(k)])
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
