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

  The true spectrum is X[k2*n1 + k1] = result[k1][k2]; we keep that
  "four-step layout" implicit — pointwise multiply is layout-agnostic and the
  inverse transform consumes the same layout — so a full negacyclic
  polynomial product costs exactly two all-to-alls per forward/inverse pair
  (4 total), each moving n/num_devices coefficients per device.

Derivation of the decomposition (with w = w_N, n = n1*n2,
input index n1*n2dim + n2, output index k2*n1 + k1):

    X[k2*n1+k1] = sum_{n2} w^(n2*k1) * w_{n2dim}^(n2*k2)
                  * sum_{n1} M[n1][n2] * w_{n1dim}^(n1*k1)

All local transforms reuse the single-chip constant-geometry network (ntt.py)
with the sub-roots psi1 = psi^n2dim, psi2 = psi^n1dim (both are primitive
2*n1- / 2*n2-th roots because psi^n = -1).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
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

        # Twiddle matrices w_N^(k1*n2) / w_N^(-k1*n2), shape (n1, n2).
        omega, omega_inv = p.omega, p.omega_inv
        fwd = np.empty((self.n1, self.n2), dtype=object)
        inv = np.empty((self.n1, self.n2), dtype=object)
        for k1 in range(self.n1):
            wf = pow(omega, k1, q)
            wi = pow(omega_inv, k1, q)
            cf = ci = 1
            for m2 in range(self.n2):
                fwd[k1, m2] = cf
                inv[k1, m2] = ci
                cf = cf * wf % q
                ci = ci * wi % q
        enc = lambda t: _tmap(
            lambda a: a.reshape(self.n1, self.n2),
            self.ring.encode_tw([int(v) for v in t.reshape(-1)]),
        )
        self.mid_tw = enc(fwd)
        self.mid_tw_inv = enc(inv)

        # Negacyclic twist tables psi^(n1*n2dim + n2) (natural layout) and
        # the scaled untwist psi^-(i) (n^-1 is already applied by the two
        # sub-INTTs, so the untwist table is the plain psi^-i).
        tw = np.empty((self.n1, self.n2), dtype=object)
        untw = np.empty((self.n1, self.n2), dtype=object)
        psi, psi_inv = p.psi, p.psi_inv
        for i1 in range(self.n1):
            a = pow(psi, i1 * self.n2, q)
            b = pow(psi_inv, i1 * self.n2, q)
            for i2 in range(self.n2):
                tw[i1, i2] = a * pow(psi, i2, q) % q
                untw[i1, i2] = b * pow(psi_inv, i2, q) % q
        self.twist_tw = enc(tw)
        self.untwist_tw = enc(untw)

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
    (..., n1, n2) four-step layout (entry [k1, k2] holds X[k2*n1 + k1])."""
    ring = fs.ring
    x = _along(2, lambda v: _ntt.ntt_fwd(fs.col_plan, v), x)
    tw = _tmap(jnp.asarray, fs.mid_tw if mid_tw is None else mid_tw)
    x = ring.mul_tw(x, tw)
    return _along(1, lambda v: _ntt.ntt_fwd(fs.row_plan, v), x)


def fourstep_inv_local(fs: FourStepPlan, x: Elem, mid_tw_inv=None) -> Elem:
    """Inverse of fourstep_fwd_local (back to natural layout)."""
    ring = fs.ring
    x = _along(1, lambda v: _ntt.ntt_inv(fs.row_plan, v), x)
    tw = _tmap(jnp.asarray, fs.mid_tw_inv if mid_tw_inv is None else mid_tw_inv)
    x = ring.mul_tw(x, tw)
    return _along(2, lambda v: _ntt.ntt_inv(fs.col_plan, v), x)


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
    n/D-coefficient slice over ICI/DCN; everything else is local compute on
    the single-chip constant-geometry network.
    """

    def __init__(
        self,
        fs: FourStepPlan,
        mesh: Mesh,
        coeff_axis: str = "coeff",
        batch_axis: str | None = None,
    ):
        self.fs = fs
        self.mesh = mesh
        self.coeff_axis = coeff_axis
        self.batch_axis = batch_axis
        self.d = mesh.shape[coeff_axis]
        if fs.n2 % self.d or fs.n1 % self.d:
            raise ValueError(
                f"n1={fs.n1} and n2={fs.n2} must be divisible by mesh "
                f"axis size {self.d}"
            )

    # -- specs ---------------------------------------------------------------
    def _spec(self, batched: bool, shard_from_end: int) -> P:
        lead = (self.batch_axis,) if batched else ()
        tail = [None, None]
        tail[2 - shard_from_end] = self.coeff_axis
        return P(*lead, *tail)

    def spec_natural(self, batched: bool = True) -> P:
        return self._spec(batched, 1)

    def spec_fourstep(self, batched: bool = True) -> P:
        return self._spec(batched, 2)

    def put_natural(self, x: Elem, batched: bool = True) -> Elem:
        s = NamedSharding(self.mesh, self.spec_natural(batched))
        return _tmap(lambda a: jax.device_put(a, s), x)

    # -- collective layout moves --------------------------------------------
    def _a2a(self, x: Elem, split_from_end: int, concat_from_end: int) -> Elem:
        ax = self.coeff_axis
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
        # 1. column NTTs (length n1) — local: axis -2 is unsharded.
        x = _along(2, lambda v: _ntt.ntt_fwd(fs.col_plan, v), x)
        # 2+3. all-to-all to give each device full rows, then twiddle + row
        # NTTs.  The mid twiddle w^(k1*n2) is passed sharded on n2 and must be
        # applied *before* the reshard (it is indexed by global n2) — so apply
        # it while n2 is still the sharded axis.
        x = ring.mul_tw(x, mid_tw)
        x = self._a2a(x, split_from_end=2, concat_from_end=1)
        # 4. row NTTs (length n2) — local now.
        return _along(1, lambda v: _ntt.ntt_fwd(fs.row_plan, v), x)

    def _inv_body(self, x: Elem, mid_tw_inv: Elem) -> Elem:
        fs, ring = self.fs, self.fs.ring
        x = _along(1, lambda v: _ntt.ntt_inv(fs.row_plan, v), x)
        x = self._a2a(x, split_from_end=1, concat_from_end=2)
        x = ring.mul_tw(x, mid_tw_inv)
        return _along(2, lambda v: _ntt.ntt_inv(fs.col_plan, v), x)

    def _shard_map(self, body, in_specs, out_specs):
        return jax.shard_map(
            body, mesh=self.mesh, in_specs=in_specs, out_specs=out_specs
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

        if name == "fwd":
            fn = self._shard_map(self._fwd_body, (sn, ts), sf)
            tables = (_tmap(jnp.asarray, fs.mid_tw),)
        elif name == "inv":
            fn = self._shard_map(self._inv_body, (sf, ts), sn)
            tables = (_tmap(jnp.asarray, fs.mid_tw_inv),)
        else:  # nwc

            def body(a, b, twist_tw, untwist_tw, mid, mid_inv):
                at = ring.mul_tw(a, twist_tw)
                bt = ring.mul_tw(b, twist_tw)
                fa = self._fwd_body(at, mid)
                fb = self._fwd_body(bt, mid)
                c = self._inv_body(ring.mul(fa, fb), mid_inv)
                return ring.mul_tw(c, untwist_tw)

            fn = self._shard_map(body, (sn, sn, ts, ts, ts, ts), sn)
            tables = tuple(
                _tmap(jnp.asarray, t)
                for t in (fs.twist_tw, fs.untwist_tw, fs.mid_tw, fs.mid_tw_inv)
            )
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

    def jit_nwc_poly_mult(self, batched: bool = True):
        """Jitted closure of the sharded product (tables embedded)."""
        return functools.partial(self.nwc_poly_mult, batched=batched)


def default_split(n: int) -> tuple[int, int]:
    """Balanced n = n1 * n2 split (n1 <= n2, both powers of two)."""
    log_n = n.bit_length() - 1
    n1 = 1 << (log_n // 2)
    return n1, n // n1
