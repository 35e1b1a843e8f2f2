"""Mesh-sharded transforms: batch data-parallelism and distributed large-N NTT.

The reference accelerator has no multi-device story at all (SURVEY.md §2.8:
its only parallel axis is PARALLEL butterfly lanes, rtl/ntt_forward.sv:11).
Scaling N beyond one memory is named as future work via multi-dimensional
decomposition (reports/final-report.tex:1811).  This module is that future
work, done the TPU way:

* **Batch parallelism** — thousands of independent polynomials sharded over a
  mesh axis; no communication (each chip runs the fused single-chip pipeline).
* **Transform-internal sharding** — for N too large for one chip, the
  four-step (Bailey) decomposition N = n1*n2:

      view x (natural order) as the row-major matrix M[n1][n2]
      1. length-n1 NTTs along axis -2 (columns)     — local
      2. multiply by the twiddle matrix w_N^(k1*n2) — local
      3. all-to-all: reshard axis -1 -> axis -2     — one ICI/DCN collective
      4. length-n2 NTTs along axis -1 (rows)        — local

  The transform-domain layout is implicit — pointwise multiply is
  layout-agnostic and the inverse transform consumes the same layout — so a
  full negacyclic polynomial product costs exactly two all-to-alls per
  forward/inverse pair (4 total), each moving n/num_devices coefficients per
  device.  (FourStepPlan.spectrum_indices gives the index map for users who
  need natural spectrum order.)

Derivation of the decomposition (with w = w_N, n = n1*n2,
input index n1*n2dim + n2, output index k2*n1 + k1):

    X[k2*n1+k1] = sum_{n2} w^(n2*k1) * w_{n2dim}^(n2*k2)
                  * sum_{n1} M[n1][n2] * w_{n1dim}^(n1*k1)

Local sub-transforms use the no-gather DIF/DIT network
(ntt.ntt_fwd_nogather / ntt_inv_nogather — the fastest measured single-chip
formulation; the bit-reversed spectrum order it emits is absorbed into a
build-time permutation of the mid twiddle table, so no data gather or
permutation runs on device) with the sub-roots psi1 = psi^n2dim,
psi2 = psi^n1dim (both primitive 2*n1- / 2*n2-th roots because psi^n = -1).

The stage exchange is jax.lax.all_to_all by default; pass
``ShardedNtt(..., fused_exchange=True)`` to route it through the Pallas RDMA
all-to-all kernel instead (see _a2a_pallas_leaf).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import ntt as _ntt
from .modmath import make_ring
from .ntt import NttPlan
from .params import NttParams, Reduction

Elem = Any


def _tmap(f, *xs):
    return jax.tree.map(f, *xs)


# ---------------------------------------------------------------------------
# Batch data-parallelism
# ---------------------------------------------------------------------------


def shard_batch(mesh: Mesh, axis: str, x: Elem) -> Elem:
    """Place a batched ring element with its leading axis sharded over
    ``axis`` (every other axis replicated)."""
    def put(a):
        spec = P(axis, *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return _tmap(put, x)


def batch_pjit(plan: NttPlan, fn, mesh: Mesh, axis: str = "batch"):
    """jit ``fn(plan, *elems)`` with every argument/result sharded on its
    leading (batch) axis.  This is pure data parallelism: XLA inserts no
    collectives; each chip runs the full pipeline on its shard."""
    ndim_spec = lambda a: NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1))))

    def wrapped(*elems):
        return fn(plan, *elems)

    def shardings_like(tree):
        return _tmap(ndim_spec, tree)

    def run(*elems):
        jitted = jax.jit(
            wrapped,
            in_shardings=tuple(shardings_like(e) for e in elems),
            out_shardings=shardings_like(jax.eval_shape(wrapped, *elems)),
        )
        return jitted(*elems)

    return run


# ---------------------------------------------------------------------------
# Four-step decomposition plan
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class FourStepPlan:
    """Constants for the distributed four-step NTT of one parameter set.

    ``n = n1 * n2``; data layout is the row-major (..., n1, n2) matrix of the
    natural-order coefficient vector.  ``col_plan`` / ``row_plan`` are the
    single-chip plans for the length-n1 / length-n2 sub-transforms.
    """

    p: NttParams
    n1: int
    n2: int
    reduction: Reduction | None = None

    def __post_init__(self):
        p = self.p
        if self.n1 * self.n2 != p.n:
            raise ValueError(f"n1*n2 = {self.n1 * self.n2} != n = {p.n}")
        q = p.q
        # Sub-roots: psi^(n2) is a primitive 2*n1-th root (psi^(n1*n2) = -1).
        psi1 = pow(p.psi, self.n2, q)
        psi2 = pow(p.psi, self.n1, q)
        self.col_plan = NttPlan(
            NttParams(n=self.n1, q=q, psi=psi1, name=f"{p.name}_col"),
            self.reduction,
        )
        self.row_plan = NttPlan(
            NttParams(n=self.n2, q=q, psi=psi2, name=f"{p.name}_row"),
            self.reduction,
        )
        self.ring = self.col_plan.ring

        # Bit-reversal of the column index (used by the no-gather-locals
        # mid tables and spectrum_indices).
        log_n1 = self.n1.bit_length() - 1
        self.brv1 = np.array(
            [int(f"{i:0{log_n1}b}"[::-1], 2) for i in range(self.n1)]
            if log_n1 else [0],
            dtype=np.int64,
        )

    # -- tables (lazy: each is an O(n) host-side big-int build, seconds at
    # -- n = 2^20, and a given consumer needs only a subset — the XLA
    # -- no-gather locals use the _br mids + twist/untwist, the
    # -- kernel-locals subclass uses neither) ---------------------------------
    def _enc(self, t: np.ndarray):
        return _tmap(
            lambda a: a.reshape(self.n1, self.n2),
            self.ring.encode_tw([int(v) for v in t.reshape(-1)]),
        )

    def _mid_raw(self, root: int) -> np.ndarray:
        """Twiddle matrix root^(k1*m2), shape (n1, n2), object dtype."""
        q = self.p.q
        out = np.empty((self.n1, self.n2), dtype=object)
        for k1 in range(self.n1):
            w = pow(root, k1, q)
            cur = 1
            for m2 in range(self.n2):
                out[k1, m2] = cur
                cur = cur * w % q
        return out

    @functools.cached_property
    def _mid_fwd_raw(self) -> np.ndarray:
        return self._mid_raw(self.p.omega)

    @functools.cached_property
    def _mid_inv_raw(self) -> np.ndarray:
        return self._mid_raw(self.p.omega_inv)

    @functools.cached_property
    def mid_tw(self):
        return self._enc(self._mid_fwd_raw)

    @functools.cached_property
    def mid_tw_inv(self):
        return self._enc(self._mid_inv_raw)

    # Bit-reversed-row variants: the production no-gather DIF/DIT locals
    # (ntt.ntt_fwd_nogather) emit the column spectrum with k1 bit-reversed —
    # so the mid table rows are permuted by bitrev(n1) once at build time
    # instead of paying a data gather every transform (VERDICT.md round-1
    # missing #2: "merged/no-gather local transform (needs the
    # bit-reversed-k1 table permutation)").
    @functools.cached_property
    def mid_tw_br(self):
        return self._enc(self._mid_fwd_raw[self.brv1])

    @functools.cached_property
    def mid_tw_inv_br(self):
        return self._enc(self._mid_inv_raw[self.brv1])

    def _twist_raw(self, psi: int) -> np.ndarray:
        """Negacyclic twist table psi^(i1*n2 + i2) in natural (n1, n2)
        layout (the untwist passes psi_inv; n^-1 is already applied by the
        two sub-INTTs, so the untwist table is the plain psi^-i)."""
        q = self.p.q
        out = np.empty((self.n1, self.n2), dtype=object)
        for i1 in range(self.n1):
            a = pow(psi, i1 * self.n2, q)
            cur = a
            for i2 in range(self.n2):
                out[i1, i2] = cur
                cur = cur * psi % q
        return out

    @functools.cached_property
    def twist_tw(self):
        return self._enc(self._twist_raw(self.p.psi))

    @functools.cached_property
    def untwist_tw(self):
        return self._enc(self._twist_raw(self.p.psi_inv))

    # -- layout -------------------------------------------------------------
    def spectrum_indices(self) -> np.ndarray:
        """(n1, n2) int array: the NATURAL spectrum index held at transform-
        domain position [j1, j2].

        The four-step identity places X[k2*n1 + k1] at [k1, k2]; the
        no-gather locals additionally bit-reverse both sub-indices, so
        entry [j1, j2] holds X[brv_n2(j2)*n1 + brv_n1(j1)].  Pointwise
        multiplication is layout-agnostic and the inverse consumes exactly
        this layout, so a full product never materializes natural order
        in the transform domain.
        """
        log_n2 = self.n2.bit_length() - 1
        brv2 = np.array(
            [int(f"{i:0{log_n2}b}"[::-1], 2) for i in range(self.n2)]
            if log_n2 else [0],
            dtype=np.int64,
        )
        return brv2[None, :] * self.n1 + self.brv1[:, None]

    # -- host-side helpers --------------------------------------------------
    def encode(self, coeffs) -> Elem:
        """Natural-order Python/numpy coefficients -> (..., n1, n2) element."""
        arr = np.asarray(coeffs, dtype=object)
        shape = arr.shape[:-1] + (self.n1, self.n2)
        flat = self.ring.encode([int(v) for v in arr.reshape(-1)])
        return _tmap(lambda a: a.reshape(shape), flat)

    def decode(self, elem) -> np.ndarray:
        leaves = jax.tree.leaves(elem)
        shape = np.asarray(leaves[0]).shape
        vals = self.ring.decode(elem)
        out = np.array(vals, dtype=object).reshape(shape)
        return out.reshape(shape[:-2] + (self.p.n,))


def _along(axis_from_end: int, transform, x: Elem) -> Elem:
    """Apply a last-axis transform along axis ``-axis_from_end`` instead."""
    if axis_from_end == 1:
        return transform(x)
    mv = lambda a: jnp.moveaxis(a, -axis_from_end, -1)
    back = lambda a: jnp.moveaxis(a, -1, -axis_from_end)
    return _tmap(back, transform(_tmap(mv, x)))


# ---------------------------------------------------------------------------
# Local (single-device) four-step — also the building block inside shard_map
# ---------------------------------------------------------------------------


def fourstep_fwd_local(fs: FourStepPlan, x: Elem, mid_tw=None) -> Elem:
    """Forward four-step on one device: (..., n1, n2) natural layout ->
    (..., n1, n2) transform-domain layout (see
    FourStepPlan.spectrum_indices for the index map).

    Local sub-transforms are the no-gather DIF network
    (ntt.ntt_fwd_nogather); their bit-reversed output order is absorbed by
    the row-permuted mid table (mid_tw_br) — zero data permutations."""
    ring = fs.ring
    x = _along(2, lambda v: _ntt.ntt_fwd_nogather(fs.col_plan, v), x)
    tw = _tmap(jnp.asarray, fs.mid_tw_br if mid_tw is None else mid_tw)
    x = ring.mul_tw(x, tw)
    return _along(1, lambda v: _ntt.ntt_fwd_nogather(fs.row_plan, v), x)


def fourstep_inv_local(fs: FourStepPlan, x: Elem, mid_tw_inv=None) -> Elem:
    """Inverse of fourstep_fwd_local (back to natural layout)."""
    ring = fs.ring
    x = _along(1, lambda v: _ntt.ntt_inv_nogather(fs.row_plan, v), x)
    tw = _tmap(
        jnp.asarray, fs.mid_tw_inv_br if mid_tw_inv is None else mid_tw_inv
    )
    x = ring.mul_tw(x, tw)
    return _along(2, lambda v: _ntt.ntt_inv_nogather(fs.col_plan, v), x)


def fourstep_nwc_poly_mult_local(fs: FourStepPlan, a: Elem, b: Elem) -> Elem:
    """Single-device negacyclic product via the four-step path (oracle for
    the sharded version; also the large-N single-chip path)."""
    ring = fs.ring
    tw = _tmap(jnp.asarray, fs.twist_tw)
    untw = _tmap(jnp.asarray, fs.untwist_tw)
    fa = fourstep_fwd_local(fs, ring.mul_tw(a, tw))
    fb = fourstep_fwd_local(fs, ring.mul_tw(b, tw))
    c = fourstep_inv_local(fs, ring.mul(fa, fb))
    return ring.mul_tw(c, untw)


# ---------------------------------------------------------------------------
# Four-step with fused Pallas-kernel locals (large-N single-chip production)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class KernelFourStep(FourStepPlan):
    """Four-step plan whose local sub-transforms are the fused int8-MXU
    Pallas kernels (kernels.plan_for) instead of the XLA no-gather network.

    TPU-first rationale: above the fused kernels' flat window (n <= 65536)
    the sub-transforms ARE kernel-sized, so the large-N path should ride the
    same speed-of-light kernels as the flat sizes.  The composition lifts
    the kernels' own twist-folding factorization (mxu64.py w1_nwc/mid_nwc
    derivation) one level up:

      * column pass = col kernel's ``nwc_ntt_fwd`` along axis -2 — the
        outer twist factor psi^(i1*n2) = psi1^i1 IS the col sub-plan's
        negacyclic twist (psi1 = psi^n2), so it rides the left matmul;
      * the outer mid table carries omega^(k1*i2) * psi^(i2) — the residual
        twist factor is constant along each column, commutes with the
        column contraction, and folds into the mid multiply.  Like the flat
        kernels, the full product runs ZERO standalone twist/untwist
        elementwise passes;
      * row pass = row kernel's cyclic ``ntt_fwd`` along axis -1;
      * each kernel emits its four-step output order; the col order is
        absorbed by permuting the outer mid rows with
        argsort(fourstep_to_natural_perm) at build time (the same trick as
        mid_tw_br), and the row order is layout-internal (pointwise is
        layout-agnostic, the inverse consumes it);
      * inverse = exact mirror: row ``ntt_inv``, permuted inverse mid with
        psi^(-i2), col ``nwc_ntt_inv`` (untwist + n1^-1 folded).  The
        n^-1 = n1^-1 * n2^-1 scale is entirely inside the sub-kernels.

    Raises ValueError when either sub-size/width has no kernel coverage
    (the dispatch layer then falls back to the XLA locals).
    """

    #: run the kernels in Pallas interpret mode (CPU tests / non-TPU hosts)
    interpret: bool = False

    @staticmethod
    def supported(p: NttParams, n1: int, n2: int) -> bool:
        """Cheap coverage predicate (no table construction): True iff both
        sub-transforms have a fused kernel (kernels.covers).  The dispatch
        layer checks this before committing to a build, so a genuine
        construction error inside a covered width is never silently
        downgraded to the XLA locals."""
        from . import kernels as _kernels

        return (_kernels.covers(n1, p.q) is not None
                and _kernels.covers(n2, p.q) is not None)

    def __post_init__(self):
        # coverage check BEFORE any table work: rejection costs nothing
        if not self.supported(self.p, self.n1, self.n2):
            raise ValueError(
                f"no fused-kernel coverage for sub-transforms n1={self.n1}, "
                f"n2={self.n2} at width {self.p.width}"
            )
        super().__post_init__()
        from . import kernels as _kernels

        self.col_k = _kernels.plan_for(self.col_plan.p)
        self.row_k = _kernels.plan_for(self.row_plan.p)
        p, q = self.p, self.p.q
        # position j1 of the col kernel's output holds sub-spectrum index
        # pos_to_nat[j1]; permute the outer mid rows to match.
        pos_to_nat1 = np.argsort(self.col_k.fourstep_to_natural_perm())

        def mid(root, fold):
            """(n1, n2) table root^(k1*i2) * fold^(i2), k1 = pos_to_nat1[j1]
            — one geometric row per j1 (ratio root^k1 * fold)."""
            m = np.empty((self.n1, self.n2), dtype=object)
            for j1 in range(self.n1):
                rho = pow(root, int(pos_to_nat1[j1]), q) * fold % q
                cur = 1
                for i2 in range(self.n2):
                    m[j1, i2] = cur
                    cur = cur * rho % q
            return m

        enc = lambda t: _tmap(
            lambda a: a.reshape(self.n1, self.n2),
            self.ring.encode_tw([int(v) for v in t.reshape(-1)]),
        )
        self.kmid = enc(mid(p.omega, 1))
        self.kmid_inv = enc(mid(p.omega_inv, 1))
        # raw integer mids kept for the in-kernel fold (row_scales)
        self._kmid_nwc_raw = mid(p.omega, p.psi)
        self._kmid_inv_nwc_raw = mid(p.omega_inv, p.psi_inv)
        self.kmid_nwc = enc(self._kmid_nwc_raw)
        self.kmid_inv_nwc = enc(self._kmid_inv_nwc_raw)

    def spectrum_indices(self) -> np.ndarray:
        """(n1, n2) int array: the NATURAL spectrum index held at transform-
        domain position [j1, j2] — the kernel-locals layout (each sub-kernel
        emits its own four-step order, see fourstep_to_natural_perm), which
        differs from the base class's bit-reversed no-gather layout."""
        pos1 = np.argsort(self.col_k.fourstep_to_natural_perm())
        pos2 = np.argsort(self.row_k.fourstep_to_natural_perm())
        return pos2[None, :] * self.n1 + pos1[:, None]

    def _apply(self, kplan, meth, x: Elem, axis_from_end: int) -> Elem:
        """Run a kernel entry point (a last-axis (B, n_sub) transform) along
        axis ``-axis_from_end`` of a (..., n1, n2) element.  Ring elements
        and kernel layouts agree by construction of kernels.covers: width
        <= 24 pairs Ring32 with the single-word MxuPlan, widths 31..64 pair
        double-word rings with pairs kernels (width 25..30 has no kernel —
        the XLA locals serve it)."""
        def to2d(a):
            if axis_from_end == 2:
                a = jnp.moveaxis(a, -2, -1)
            return a.reshape(-1, a.shape[-1]), a.shape

        if kplan.pairs:
            hi, sh = to2d(x[0])
            lo, _ = to2d(x[1])
            out = meth((hi, lo), self.interpret)
            res = tuple(o.reshape(sh) for o in out)
        else:
            a2, sh = to2d(x)
            res = meth(a2, self.interpret).reshape(sh)
        if axis_from_end == 2:
            res = _tmap(lambda a: jnp.moveaxis(a, -1, -2), res)
        return res

    @functools.cached_property
    def row_scales(self):
        """Grouped entry/exit Shoup scale planes for the in-kernel outer
        mid fold (row_k.cyclic_poly_mult_scaled: pre = kmid_nwc, post =
        kmid_inv_nwc), or None when the fold does not apply (single-word
        kernel, non-Shoup ring, q >= 2^62, or group period misaligned).

        Plane layout mirrors MxuPlan64._group_batch: a data group packs
        t consecutive (batch, j1) polynomials into one (128, 128) tile,
        and since t | n1 the j1 pattern (hence the mid scale) repeats
        every P = n1/t groups — each plane is (P, 128, 128) and the
        kernel reads row G % P for data group G."""
        rk = self.row_k
        if (not rk.pairs or self.p.q >= 1 << 62
                or getattr(self.ring, "reduction", None)
                is not Reduction.SHOUP
                or self.n1 % rk.t or self.n1 // rk.t < 2):
            return None
        from .modmath import encode64

        q = self.p.q
        P = self.n1 // rk.t
        shp = (P, rk.rows, 128)

        def planes(table):
            flat = [int(v) for v in table.reshape(-1)]
            quot = [(v << 64) // q for v in flat]
            enc = lambda vals: tuple(
                a.reshape(shp) for a in encode64(vals))
            return (*enc(flat), *enc(quot))

        return (planes(self._kmid_nwc_raw),
                planes(self._kmid_inv_nwc_raw))

    def _apply2(self, kplan, meth, x: Elem, y: Elem,
                axis_from_end: int) -> Elem:
        """Two-operand variant of :meth:`_apply` (the fused cyclic row
        product): both operands get the same 2D layout, ``meth(x2, y2)``
        runs once."""
        def to2d(a):
            if axis_from_end == 2:
                a = jnp.moveaxis(a, -2, -1)
            return a.reshape(-1, a.shape[-1]), a.shape

        if kplan.pairs:
            xh, sh = to2d(x[0])
            xl, _ = to2d(x[1])
            yh, _ = to2d(y[0])
            yl, _ = to2d(y[1])
            out = meth((xh, xl), (yh, yl), self.interpret)
            res = tuple(o.reshape(sh) for o in out)
        else:
            x2, sh = to2d(x)
            y2, _ = to2d(y)
            res = meth(x2, y2, self.interpret).reshape(sh)
        if axis_from_end == 2:
            res = _tmap(lambda a: jnp.moveaxis(a, -1, -2), res)
        return res


def fourstep_fwd_kernel(fs: KernelFourStep, x: Elem,
                        nwc: bool = False) -> Elem:
    """Kernel-locals forward four-step: natural (..., n1, n2) in, transform
    layout out ([j1, j2] holds X[k2*n1 + k1] with k1/k2 in the col/row
    kernels' four-step orders).  ``nwc=True`` folds the outer psi-twist
    (col NWC forward + psi^(i2) in the mid table)."""
    meth = fs.col_k.nwc_ntt_fwd if nwc else fs.col_k.ntt_fwd
    x = fs._apply(fs.col_k, meth, x, 2)
    tw = _tmap(jnp.asarray, fs.kmid_nwc if nwc else fs.kmid)
    x = fs.ring.mul_tw(x, tw)
    return fs._apply(fs.row_k, fs.row_k.ntt_fwd, x, 1)


def fourstep_inv_kernel(fs: KernelFourStep, x: Elem,
                        nwc: bool = False) -> Elem:
    """Inverse of fourstep_fwd_kernel (back to natural layout); ``nwc=True``
    folds the outer untwist (psi^(-i2) mid + col NWC inverse)."""
    x = fs._apply(fs.row_k, fs.row_k.ntt_inv, x, 1)
    tw = _tmap(jnp.asarray, fs.kmid_inv_nwc if nwc else fs.kmid_inv)
    x = fs.ring.mul_tw(x, tw)
    meth = fs.col_k.nwc_ntt_inv if nwc else fs.col_k.ntt_inv
    return fs._apply(fs.col_k, meth, x, 2)


def fourstep_nwc_poly_mult_kernel(fs: KernelFourStep, a: Elem,
                                  b: Elem, fused_row: bool = True) -> Elem:
    """Negacyclic product via kernel-locals four-step — the large-N
    single-chip production path (dispatch routes n > 65536 here when the
    sub-transforms have kernel coverage).

    ``fused_row=True`` (default) collapses the whole row stage: by the
    convolution theorem, rowI(rowF(ma) . rowF(mb)) IS the length-n2
    cyclic convolution of the mid-multiplied column spectra, so ONE
    ``row_k.cyclic_poly_mult`` launch replaces two forward row kernels,
    the XLA pointwise pass (a multi-op VPU emulation for pair rings), and
    the inverse row kernel — removing three full-array HBM round trips
    per product and amortizing the row kernel's table loads once instead
    of three times (round-3 large-N attack, BENCH_NOTES.md; the identity
    is exact because both sides are bit-exact cyclic convolutions mod q).
    ``fused_row=False`` keeps the composed path as the A/B control."""
    if not fused_row:
        fa = fourstep_fwd_kernel(fs, a, nwc=True)
        fb = fourstep_fwd_kernel(fs, b, nwc=True)
        return fourstep_inv_kernel(fs, fs.ring.mul(fa, fb), nwc=True)
    ma = fs._apply(fs.col_k, fs.col_k.nwc_ntt_fwd, a, 2)
    mb = fs._apply(fs.col_k, fs.col_k.nwc_ntt_fwd, b, 2)
    scales = fs.row_scales
    if scales is not None:
        # outer mids folded INTO the row kernel (entry/exit Shoup): zero
        # XLA elementwise passes between the col and row stages
        pre, post = scales
        meth = lambda x, y, interp: fs.row_k.cyclic_poly_mult_scaled(
            x, y, pre, post, interp)
        c = fs._apply2(fs.row_k, meth, ma, mb, 1)
    else:  # e.g. Goldilocks (strict Shoup needs q < 2^62): XLA mids
        tw = _tmap(jnp.asarray, fs.kmid_nwc)
        ma, mb = fs.ring.mul_tw(ma, tw), fs.ring.mul_tw(mb, tw)
        c = fs._apply2(fs.row_k, fs.row_k.cyclic_poly_mult, ma, mb, 1)
        c = fs.ring.mul_tw(c, _tmap(jnp.asarray, fs.kmid_inv_nwc))
    return fs._apply(fs.col_k, fs.col_k.nwc_ntt_inv, c, 2)


# ---------------------------------------------------------------------------
# Fused stage exchange: Pallas RDMA all-to-all (flag-guarded)
# ---------------------------------------------------------------------------
#
# TPU-native equivalent of the four-step stage-boundary exchange as ONE
# Pallas kernel issuing direct chip-to-chip DMAs (pltpu.make_async_remote_copy
# — the SNIPPETS.md:99-131 collective idiom; SURVEY.md §2.8/§5 names this as
# the fused-communication variant of the XLA all_to_all).  Behind the
# ``ShardedNtt(fused_exchange=True)`` flag because this 1-chip environment
# cannot measure it against XLA's all_to_all on real ICI — correctness is
# proven on the CPU mesh via Pallas TPU-interpret mode (which simulates
# remote DMAs and semaphores); treat the performance choice as open until a
# multi-chip run decides it.


def _a2a_pallas_leaf(x, *, mesh_axes, exchange_axis, d, split_from_end,
                     interpret):
    """Tiled all-to-all of one uint32 leaf as a single RDMA kernel.

    split_from_end=2: split rows (axis -2), concatenate columns (axis -1)
    — the forward-transform exchange; split_from_end=1 is the inverse.
    Equivalent to jax.lax.all_to_all(..., tiled=True) over
    ``exchange_axis``; must be called inside shard_map.
    """
    shape = x.shape
    rows, cols = shape[-2], shape[-1]
    b = int(np.prod(shape[:-2], dtype=np.int64)) if len(shape) > 2 else 1
    x3 = x.reshape(b, rows, cols)
    if split_from_end == 2:
        blk_r, blk_c = rows // d, cols
        out_shape = (b, rows // d, cols * d)
    else:
        blk_r, blk_c = rows, cols // d
        out_shape = (b, rows * d, cols // d)
    if not interpret and (blk_c % 128 or blk_r % 8):
        # Mosaic DMA slices must respect the (8, 128) uint32 tiling; every
        # production shape (n1, n2 >= 1024 with <= 8-way sharding) is
        # aligned — only toy shapes hit this.
        raise ValueError(
            f"fused exchange needs 128 | cols-per-block ({blk_c}) and "
            f"8 | rows-per-block ({blk_r}) on hardware; use the XLA "
            "all_to_all (fused_exchange=False) for this shape"
        )

    def kernel(x_ref, o_ref, send_sem, recv_sem):
        # Coordinates of this device on every mesh axis; peers differ only
        # on the exchange axis.
        coords = {ax: jax.lax.axis_index(ax) for ax in mesh_axes}
        me = coords[exchange_axis]
        # axis_index values carry varying-manual-axes metadata; the
        # interpret-mode evaluator needs constants promoted to 'varying'
        # before multiplying, but Mosaic has no lowering for that cast —
        # on real hardware the plain constant works.
        if interpret:
            _c = lambda v: jax.lax.pcast(
                jnp.int32(v), (exchange_axis,), to="varying"
            )
        else:
            _c = jnp.int32
        off_r = me * _c(blk_r)
        off_c = me * _c(blk_c)

        # Barrier: every peer signals every peer once, so no RDMA lands
        # before all participants' kernels (and scratch semaphores) exist.
        barrier = pltpu.get_barrier_semaphore()
        for t in range(d):
            peer = tuple(
                t if ax == exchange_axis else coords[ax] for ax in mesh_axes
            )
            pltpu.semaphore_signal(
                barrier, inc=1, device_id=peer,
                device_id_type=pltpu.DeviceIdType.MESH,
            )
        pltpu.semaphore_wait(barrier, d)

        copies = []
        for t in range(d):
            peer = tuple(
                t if ax == exchange_axis else coords[ax] for ax in mesh_axes
            )
            if split_from_end == 2:
                src = x_ref.at[:, pl.ds(t * blk_r, blk_r), :]
                dst = o_ref.at[:, :, pl.ds(off_c, blk_c)]
            else:
                src = x_ref.at[:, :, pl.ds(t * blk_c, blk_c)]
                dst = o_ref.at[:, pl.ds(off_r, blk_r), :]
            rdma = pltpu.make_async_remote_copy(
                src_ref=src, dst_ref=dst,
                send_sem=send_sem, recv_sem=recv_sem,
                device_id=peer, device_id_type=pltpu.DeviceIdType.MESH,
            )
            rdma.start()
            copies.append(rdma)
        # Uniform block sizes: each wait consumes exactly one copy's bytes,
        # so d send-waits + d recv-waits drain all traffic regardless of
        # arrival order.
        for rdma in copies:
            rdma.wait_send()
        for rdma in copies:
            rdma.wait_recv()

    # Output varies over the same mesh axes as the input (shard_map
    # check_vma needs the annotation on pallas outputs).
    vma = getattr(jax.typeof(x), "vma", frozenset())
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype, vma=vma),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=0
        ),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(x3)
    return out.reshape(shape[:-2] + out.shape[-2:])


# ---------------------------------------------------------------------------
# Mesh-sharded four-step
# ---------------------------------------------------------------------------


class ShardedNtt:
    """Distributed NTT / negacyclic polynomial multiplication on a mesh.

    Layout contract:
      * natural-layout elements are (..., n1, n2) with the **last** axis
        sharded over ``coeff_axis`` (and the leading batch axis, if any,
        sharded over ``batch_axis`` when given);
      * four-step-layout (transform-domain) elements are (..., n1, n2) with
        axis **-2** sharded over ``coeff_axis``.

    One ``jax.lax.all_to_all`` per transform moves each device's
    n/D-coefficient slice over ICI/DCN; everything else is local compute —
    the XLA no-gather network for a plain ``FourStepPlan``, or the fused
    Pallas kernels when ``fs`` is a ``KernelFourStep`` (the production
    shape: kernel locals + one collective per transform, with the twist
    folding and permuted mid tables shared with the single-chip
    kernel-fourstep backend).
    """

    def __init__(
        self,
        fs: FourStepPlan,
        mesh: Mesh,
        coeff_axis: str = "coeff",
        batch_axis: str | None = None,
        fused_exchange: bool = False,
    ):
        self.fs = fs
        self.mesh = mesh
        self.coeff_axis = coeff_axis
        self.batch_axis = batch_axis
        #: route the stage exchange through the Pallas RDMA all-to-all
        #: kernel instead of jax.lax.all_to_all (see _a2a_pallas_leaf for
        #: why this is flag-guarded).
        self.fused_exchange = fused_exchange
        #: passing a KernelFourStep plan runs the local sub-transforms AS
        #: the fused Pallas kernels (same composition as the single-chip
        #: kernel-fourstep dispatch backend: outer twist folded into the
        #: column kernel + permuted mid tables, zero elementwise
        #: twist/untwist passes even in the distributed product).
        self.kernel_locals = isinstance(fs, KernelFourStep)
        self.d = mesh.shape[coeff_axis]
        if fs.n2 % self.d or fs.n1 % self.d:
            raise ValueError(
                f"n1={fs.n1} and n2={fs.n2} must be divisible by mesh "
                f"axis size {self.d}"
            )

    # -- specs ---------------------------------------------------------------
    def _spec(self, batched: bool, shard_from_end: int,
              stacked: bool = False) -> P:
        lead = ((None,) if stacked else ())
        lead += (self.batch_axis,) if batched else ()
        tail = [None, None]
        tail[2 - shard_from_end] = self.coeff_axis
        return P(*lead, *tail)

    def spec_natural(self, batched: bool = True, stacked: bool = False) -> P:
        return self._spec(batched, 1, stacked)

    def spec_fourstep(self, batched: bool = True,
                      stacked: bool = False) -> P:
        return self._spec(batched, 2, stacked)

    def put_natural(self, x: Elem, batched: bool = True,
                    stacked: bool = False) -> Elem:
        s = NamedSharding(self.mesh, self.spec_natural(batched, stacked))
        return _tmap(lambda a: jax.device_put(a, s), x)

    # -- collective layout moves --------------------------------------------
    def _a2a(self, x: Elem, split_from_end: int, concat_from_end: int) -> Elem:
        ax = self.coeff_axis
        if self.fused_exchange:
            interp = jax.devices()[0].platform != "tpu"
            return _tmap(
                lambda a: _a2a_pallas_leaf(
                    a,
                    mesh_axes=tuple(self.mesh.axis_names),
                    exchange_axis=ax,
                    d=self.d,
                    split_from_end=split_from_end,
                    interpret=interp,
                ),
                x,
            )
        return _tmap(
            lambda a: jax.lax.all_to_all(
                a,
                ax,
                split_axis=a.ndim - split_from_end,
                concat_axis=a.ndim - concat_from_end,
                tiled=True,
            ),
            x,
        )

    # -- shard_map bodies ----------------------------------------------------
    def _fwd_body(self, x: Elem, mid_tw: Elem) -> Elem:
        fs, ring = self.fs, self.fs.ring
        # 1. column NTTs (length n1) — local: axis -2 is unsharded.  The
        # no-gather DIF network emits bit-reversed k1; the mid table passed
        # in is the row-permuted mid_tw_br, which absorbs that order.
        x = _along(2, lambda v: _ntt.ntt_fwd_nogather(fs.col_plan, v), x)
        # 2+3. all-to-all to give each device full rows, then twiddle + row
        # NTTs.  The mid twiddle w^(brv(j1)*n2) is passed sharded on n2 and
        # must be applied *before* the reshard (it is indexed by global n2)
        # — so apply it while n2 is still the sharded axis.
        x = ring.mul_tw(x, mid_tw)
        x = self._a2a(x, split_from_end=2, concat_from_end=1)
        # 4. row NTTs (length n2) — local now.
        return _along(1, lambda v: _ntt.ntt_fwd_nogather(fs.row_plan, v), x)

    def _inv_body(self, x: Elem, mid_tw_inv: Elem) -> Elem:
        fs, ring = self.fs, self.fs.ring
        x = _along(1, lambda v: _ntt.ntt_inv_nogather(fs.row_plan, v), x)
        x = self._a2a(x, split_from_end=1, concat_from_end=2)
        x = ring.mul_tw(x, mid_tw_inv)
        return _along(2, lambda v: _ntt.ntt_inv_nogather(fs.col_plan, v), x)

    def _fwd_body_kernel(self, x: Elem, mid: Elem, nwc: bool = False) -> Elem:
        """Forward body with fused-kernel locals (fs is a KernelFourStep).

        Same schedule as _fwd_body — col pass and mid multiply while n2 is
        the sharded axis (mid is indexed by global n2), ONE all-to-all, row
        pass local — but the passes are the Pallas kernels and the col
        kernel's four-step output order is absorbed by the plan's permuted
        kmid tables.  ``nwc=True`` folds the outer psi-twist (col NWC
        forward + psi^(i2) in the mid), so the distributed product runs
        zero standalone twist passes, like the flat kernels."""
        fs = self.fs
        meth = fs.col_k.nwc_ntt_fwd if nwc else fs.col_k.ntt_fwd
        x = fs._apply(fs.col_k, meth, x, 2)
        x = fs.ring.mul_tw(x, mid)
        x = self._a2a(x, split_from_end=2, concat_from_end=1)
        return fs._apply(fs.row_k, fs.row_k.ntt_fwd, x, 1)

    def _inv_body_kernel(self, x: Elem, mid_inv: Elem,
                         nwc: bool = False) -> Elem:
        fs = self.fs
        x = fs._apply(fs.row_k, fs.row_k.ntt_inv, x, 1)
        x = self._a2a(x, split_from_end=1, concat_from_end=2)
        x = fs.ring.mul_tw(x, mid_inv)
        meth = fs.col_k.nwc_ntt_inv if nwc else fs.col_k.ntt_inv
        return fs._apply(fs.col_k, meth, x, 2)

    def _shard_map(self, body, in_specs, out_specs):
        return jax.shard_map(
            body, mesh=self.mesh, in_specs=in_specs, out_specs=out_specs,
            # pallas_call does not annotate varying-mesh-axes metadata yet
            **({"check_vma": False} if self.kernel_locals else {}),
        )

    def _jitted(self, name: str, batched: bool):
        """Build (once) the jitted shard_map closure for a public transform.

        Everything runs under jit: an eager shard_map would dispatch every
        jnp op as its own multi-device program, which is orders of magnitude
        slower and never what we want.
        """
        key = (name, batched)
        cache = self.__dict__.setdefault("_jit_cache", {})
        if key in cache:
            return cache[key]
        fs, ring = self.fs, self.fs.ring
        sn = self.spec_natural(batched)
        sf = self.spec_fourstep(batched)
        ts = self.spec_natural(False)
        kl = self.kernel_locals
        fwd_body = self._fwd_body_kernel if kl else self._fwd_body
        inv_body = self._inv_body_kernel if kl else self._inv_body

        if kl:
            def spec_body(x, mid):
                return self._fwd_body_kernel(x, mid, nwc=True)

            def inv_nwc_body(x, mid_inv):
                return self._inv_body_kernel(x, mid_inv, nwc=True)

            spec_tables = (_tmap(jnp.asarray, fs.kmid_nwc),)
            inv_nwc_tables = (_tmap(jnp.asarray, fs.kmid_inv_nwc),)
        else:
            def spec_body(x, twist_tw, mid):
                return self._fwd_body(ring.mul_tw(x, twist_tw), mid)

            def inv_nwc_body(x, untwist_tw, mid_inv):
                return ring.mul_tw(self._inv_body(x, mid_inv), untwist_tw)

            spec_tables = tuple(
                _tmap(jnp.asarray, t) for t in (fs.twist_tw, fs.mid_tw_br))
            inv_nwc_tables = tuple(
                _tmap(jnp.asarray, t)
                for t in (fs.untwist_tw, fs.mid_tw_inv_br))

        if name == "fwd":
            fn = self._shard_map(fwd_body, (sn, ts), sf)
            tables = (_tmap(jnp.asarray, fs.kmid if kl else fs.mid_tw_br),)
        elif name == "inv":
            fn = self._shard_map(inv_body, (sf, ts), sn)
            tables = (
                _tmap(jnp.asarray, fs.kmid_inv if kl else fs.mid_tw_inv_br),
            )
        elif name == "spectrum":
            nt = len(spec_tables)
            fn = self._shard_map(spec_body, (sn, *([ts] * nt)), sf)
            tables = spec_tables
        elif name == "cached":
            nt = len(spec_tables) + len(inv_nwc_tables)

            def body(a, s, *tws):
                fa = spec_body(a, *tws[:len(spec_tables)])
                return inv_nwc_body(ring.mul(fa, s),
                                    *tws[len(spec_tables):])

            fn = self._shard_map(body, (sn, sf, *([ts] * nt)), sn)
            tables = spec_tables + inv_nwc_tables
        elif name == "cyclic":

            def body(a, b, mid, mid_inv):
                fa = fwd_body(a, mid)
                fb = fwd_body(b, mid)
                return inv_body(ring.mul(fa, fb), mid_inv)

            fn = self._shard_map(body, (sn, sn, ts, ts), sn)
            tables = tuple(
                _tmap(jnp.asarray, t)
                for t in ((fs.kmid, fs.kmid_inv) if kl
                          else (fs.mid_tw_br, fs.mid_tw_inv_br))
            )
        elif name in ("dot", "dot_cached"):
            # fused inner product Σ_k a_k ⊛ b_k: spectrum-domain
            # accumulate under ONE shard_map, one inverse (and one
            # inverse-side all-to-all) per output instead of K.  The
            # cached form consumes per-k nwc_spectrum stacks: K + 1
            # all-to-alls total.
            cached = name == "dot_cached"
            ns = len(spec_tables)

            def body(a, b, *tws):
                K = jax.tree.leaves(a)[0].shape[0]
                pick = lambda x, k: _tmap(lambda v: v[k], x)
                acc = None
                for k in range(K):
                    fa = spec_body(pick(a, k), *tws[:ns])
                    fb = (pick(b, k) if cached
                          else spec_body(pick(b, k), *tws[:ns]))
                    c = ring.mul(fa, fb)
                    acc = c if acc is None else ring.add(acc, c)
                return inv_nwc_body(acc, *tws[ns:])

            nt = len(spec_tables) + len(inv_nwc_tables)
            snk = self.spec_natural(batched, stacked=True)
            sfk = self.spec_fourstep(batched, stacked=True)
            fn = self._shard_map(
                body, (snk, sfk if cached else snk, *([ts] * nt)), sn)
            tables = spec_tables + inv_nwc_tables
        else:  # nwc

            def body(a, b, *tws):
                fa = spec_body(a, *tws[:len(spec_tables)])
                fb = spec_body(b, *tws[:len(spec_tables)])
                return inv_nwc_body(ring.mul(fa, fb),
                                    *tws[len(spec_tables):])

            nt = len(spec_tables) + len(inv_nwc_tables)
            fn = self._shard_map(body, (sn, sn, *([ts] * nt)), sn)
            tables = spec_tables + inv_nwc_tables
        jfn = jax.jit(lambda *data: fn(*data, *tables))
        cache[key] = jfn
        return jfn

    # -- public transforms ---------------------------------------------------
    def ntt_fwd(self, x: Elem, batched: bool = True) -> Elem:
        """Sharded forward NTT: natural layout -> four-step layout."""
        return self._jitted("fwd", batched)(x)

    def ntt_inv(self, x: Elem, batched: bool = True) -> Elem:
        """Sharded inverse NTT: four-step layout -> natural layout."""
        return self._jitted("inv", batched)(x)

    def nwc_poly_mult(self, a: Elem, b: Elem, batched: bool = True) -> Elem:
        """Sharded negacyclic product, natural layout in and out.

        Four all-to-alls total; twist/untwist/pointwise are local.
        """
        return self._jitted("nwc", batched)(a, b)

    def cyclic_poly_mult(self, a: Elem, b: Elem, batched: bool = True) -> Elem:
        """Sharded cyclic product INTT(NTT(a) . NTT(b)) — the RTL top-level
        pipeline semantics (rtl/ntt_poly_mult.sv), distributed."""
        return self._jitted("cyclic", batched)(a, b)

    def nwc_spectrum(self, x: Elem, batched: bool = True) -> Elem:
        """Cacheable NWC operand spectrum (four-step layout, twist folded):
        the sharded analog of the flat ``nwc_spectrum`` — stage long-lived
        operands (e.g. keys) once, then multiply many times with
        ``nwc_poly_mult_cached`` for one forward + one inverse per
        product."""
        return self._jitted("spectrum", batched)(x)

    def nwc_poly_mult_cached(self, a: Elem, spectrum: Elem,
                             batched: bool = True) -> Elem:
        """Sharded negacyclic product against a cached ``nwc_spectrum``
        (two all-to-alls instead of four)."""
        return self._jitted("cached", batched)(a, spectrum)

    def nwc_dot(self, a: Elem, b: Elem, batched: bool = True) -> Elem:
        """Sharded fused inner product INTT(Σ_k NTT(a_k)·NTT(b_k)): a, b
        are K-stacked natural-layout elements (K, [B,] n1, n2); returns
        the ([B,] n1, n2) sum of negacyclic products.  One inverse (and
        one inverse-side all-to-all) per output instead of K — the
        distributed lattice A@s / key-switching inner product."""
        return self._jitted("dot", batched)(a, b)

    def nwc_dot_cached(self, a: Elem, spectra: Elem,
                       batched: bool = True) -> Elem:
        """Sharded fused dot against K-stacked cached ``nwc_spectrum``
        outputs (four-step layout): K forwards + one inverse, K + 1
        all-to-alls total — the fixed-key shape, distributed."""
        return self._jitted("dot_cached", batched)(a, spectra)

    def jit_nwc_poly_mult(self, batched: bool = True):
        """Jitted closure of the sharded product (tables embedded)."""
        return functools.partial(self.nwc_poly_mult, batched=batched)


def default_split(n: int) -> tuple[int, int]:
    """Balanced n = n1 * n2 split (n1 >= n2, both powers of two).

    For odd log2(n) the LARGER factor goes to n1 (the column pass):
    measured +11% on the kernel-locals four-step at n = 2^17
    (512x256 7,580 vs 256x512 6,811 nwc/s, w60 B=32 on v5e — fewer,
    larger kernel calls on the transposed axis); even splits and n = 2^20
    are insensitive (BENCH_NOTES.md round-2 split sweep)."""
    log_n = n.bit_length() - 1
    n1 = 1 << (log_n - log_n // 2)
    return n1, n // n1
