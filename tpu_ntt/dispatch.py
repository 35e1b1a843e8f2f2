"""Implementation dispatch: pick the fastest measured path per workload.

Single source of truth for "which backend runs this operation on this
parameter set" — the TPU-native analog of the reference's REDUCTION_TYPE /
PARALLEL configuration mux (rtl/mod_mult.v:21-128 selects the arithmetic
backend; here the selection spans whole pipeline implementations).  The
benchmark harness (bench.py) and users both consume this policy, so there is
exactly one copy of it.

    mult = tpu_ntt.dispatch.best_nwc_poly_mult(params)
    out = mult(a, b)        # (B, n) uint arrays in, same out

Selection policy (measured on TPU v5e; CLAUDE.md performance ledger and
docs/DESIGN.md §2):
  * q < 2^24, 256 <= n <= 16384, n % 128 == 0  ->  fused int8-MXU Pallas
    kernel (kernels/mxu.py), every operation.
  * q = 2^64 - 2^32 + 1 with 256 <= n <= 65536  ->  Goldilocks phi-fold
    int8-MXU kernel (kernels/gl64.py) — the special form is the only
    fused path above the generic kernel's q < 2^62 ceiling.
  * 2^24 <= q < 2^62 with 256 <= n <= 65536     ->  double-word int8-MXU
    kernel (kernels/mxu64.py), every operation (VMEM-resident: unlike the
    XLA path it stays flat in throughput as batch grows).  24-bit moduli
    at 16384 < n <= 65536 also take this path (multi-tile left matmuls).
  * n > 65536 (any q)                           ->  single-chip four-step
    decomposition (sharded.FourStepPlan locals) — O(n) tables instead of
    the flat path's O(n log n); demonstrated to n = 2^20 on one chip.
  * otherwise                                   ->  XLA merged-psi + Shoup
    (ntt.py), single- or double-word by q (Goldilocks gets its dedicated
    XLA ring outside the kernel n-window).

All backends are bit-identical; the returned callables are jitted and
accept/return plain numpy/JAX uint arrays ((B, n) uint32 for q < 2^31,
(hi, lo) uint32 pairs — or a (B, n) uint64 array, auto-split — otherwise).

Layout note: ``best_ntt_fwd`` / ``best_nwc_ntt_fwd`` return the spectrum in
the selected backend's transform layout (four-step order for the kernels,
bit-reversed order for the XLA merged path).  The matching ``best_ntt_inv``
consumes exactly that layout, and ``best_nwc_poly_mult_cached`` consumes
spectra from ``best_nwc_spectrum`` of the same params — pairs always come
from one backend, so layouts compose; only cross-backend mixing would not.
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from . import ntt as _ntt
from .modmath import GOLDILOCKS_Q as _GOLDILOCKS_Q
from .ntt import NttPlan
from .params import NttParams

#: operations the dispatch layer routes (mirrors the public entry points)
OPS = (
    "nwc",        # negacyclic poly-mult, natural order in/out
    "cyclic",     # INTT(NTT . NTT), the RTL top-level semantics
    "fwd",        # cyclic forward NTT
    "inv",        # cyclic inverse NTT (consumes fwd's layout)
    "nwc_fwd",    # psi-twist + forward NTT (the benchmarked forward)
    "spectrum",   # cacheable NWC operand spectrum
    "cached",     # product against a cached spectrum
)

#: n window for the single-word kernel (one (128,128) tile per group)
_KERNEL_N_OK = lambda p: p.n % 128 == 0 and 256 <= p.n <= 16384
#: n window for the double-word kernel (multi-tile left matmuls above 16384)
_KERNEL64_N_OK = lambda p: p.n % 128 == 0 and 256 <= p.n <= 65536
#: above this n the local four-step path replaces the flat formulations
_FOURSTEP_MIN_N = 65536


def _split_u64(x):
    if isinstance(x, (tuple, list)):  # already a (hi, lo) pair
        return tuple(x)
    if getattr(x, "dtype", None) == np.uint64:
        x = np.asarray(x)
        return ((x >> np.uint64(32)).astype(np.uint32),
                (x & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    return x


def _wrap(fn, nargs, split):
    """jit fn; optionally auto-split uint64 inputs into (hi, lo) pairs."""
    jitted = jax.jit(fn)
    if not split:
        return jitted
    if nargs == 1:
        return lambda a: jitted(_split_u64(a))
    return lambda a, b: jitted(_split_u64(a), _split_u64(b))


def _fourstep_backend(p: NttParams):
    """Single-chip large-N backend: the local four-step decomposition.

    Above the fused kernels' n <= 65536 window the flat merged-psi path is
    pathological — its per-stage tables are O(n log n) host-built bigints
    (~160 MB embedded at n = 2^20) — while the four-step factorization
    (sharded.FourStepPlan, the same plan the distributed path shards) needs
    only the O(n) mid/twist matrices plus two tiny sub-transform plans.
    This is the TPU answer to the reference's scale ceiling: the RTL tops
    out at N=4096 by BRAM budget (SURVEY §2.5) and defers multi-level
    decomposition to future work (reports/final-report.tex:1811); here one
    chip runs n = 2^20 by reshaping the coefficient vector to (n1, n2) and
    riding the MXU-friendly batched sub-transforms.

    Spectrum layout is the four-step transform-domain order
    (FourStepPlan.spectrum_indices) — self-consistent across fwd/inv/
    spectrum/cached, per the module docstring's layout contract.
    """
    from . import sharded as _sh

    n1, n2 = _sh.default_split(p.n)
    fs = _sh.FourStepPlan(p, n1, n2)
    ring = fs.ring
    split = ring.nlimbs == 2
    tmap = _sh._tmap

    def _mat(x):
        return tmap(lambda a: a.reshape(a.shape[:-1] + (n1, n2)), x)

    def _flat(x):
        return tmap(lambda a: a.reshape(a.shape[:-2] + (p.n,)), x)

    def fwd(x):
        return _flat(_sh.fourstep_fwd_local(fs, _mat(x)))

    def inv(x):
        return _flat(_sh.fourstep_inv_local(fs, _mat(x)))

    def nwc(a, b):
        return _flat(_sh.fourstep_nwc_poly_mult_local(fs, _mat(a), _mat(b)))

    def cyclic(a, b):
        fa = _sh.fourstep_fwd_local(fs, _mat(a))
        fb = _sh.fourstep_fwd_local(fs, _mat(b))
        return _flat(_sh.fourstep_inv_local(fs, ring.mul(fa, fb)))

    def nwc_fwd(x):
        return _flat(
            _sh.fourstep_fwd_local(fs, ring.mul_tw(_mat(x), fs.twist_tw))
        )

    def cached(a, s):
        fa = _sh.fourstep_fwd_local(fs, ring.mul_tw(_mat(a), fs.twist_tw))
        c = _sh.fourstep_inv_local(fs, ring.mul(fa, _mat(s)))
        return _flat(ring.mul_tw(c, fs.untwist_tw))

    ops = {
        "nwc": _wrap(nwc, 2, split),
        "cyclic": _wrap(cyclic, 2, split),
        "fwd": _wrap(fwd, 1, split),
        "inv": _wrap(inv, 1, split),
        "nwc_fwd": _wrap(nwc_fwd, 1, split),
        "spectrum": _wrap(nwc_fwd, 1, split),
        "cached": _wrap(cached, 2, split),
    }
    return ("xla-fourstep-64" if split else "xla-fourstep"), ops, split


@functools.lru_cache(maxsize=None)
def _backend(p: NttParams):
    """(name, {op: callable}, takes_pairs) — the single policy table."""
    if p.n > _FOURSTEP_MIN_N:
        return _fourstep_backend(p)

    if _KERNEL_N_OK(p) and p.width <= 24:
        from .kernels.mxu import MxuPlan

        mp = MxuPlan(p)
        # Pallas compiles only on TPU; on CPU backends fall back to the
        # interpreter so the dispatch layer works everywhere.
        interp = jax.devices()[0].platform != "tpu"
        ops = {
            "nwc": _wrap(lambda a, b: mp.nwc_poly_mult(a, b, interp), 2, False),
            "cyclic": _wrap(
                lambda a, b: mp.cyclic_poly_mult(a, b, interp), 2, False
            ),
            "fwd": _wrap(lambda x: mp.ntt_fwd(x, interp), 1, False),
            "inv": _wrap(lambda x: mp.ntt_inv(x, interp), 1, False),
            "nwc_fwd": _wrap(lambda x: mp.nwc_ntt_fwd(x, interp), 1, False),
            "spectrum": _wrap(lambda x: mp.nwc_spectrum(x, interp), 1, False),
            "cached": _wrap(
                lambda a, s: mp.nwc_poly_mult_cached(a, s, interp), 2, False
            ),
        }
        return "pallas-mxu", ops, False

    if _KERNEL64_N_OK(p) and p.q == _GOLDILOCKS_Q:
        # width-64 special form: 9-digit phi-fold kernel (gl64.py) — the
        # only fused path above the generic kernel's q < 2^62 ceiling
        from .kernels.gl64 import GoldilocksPlan64

        mp = GoldilocksPlan64(p)
        interp = jax.devices()[0].platform != "tpu"
        ops = {
            "nwc": _wrap(lambda a, b: mp.nwc_poly_mult(a, b, interp), 2, True),
            "cyclic": _wrap(
                lambda a, b: mp.cyclic_poly_mult(a, b, interp), 2, True
            ),
            "fwd": _wrap(lambda x: mp.ntt_fwd(x, interp), 1, True),
            "inv": _wrap(lambda x: mp.ntt_inv(x, interp), 1, True),
            "nwc_fwd": _wrap(lambda x: mp.nwc_ntt_fwd(x, interp), 1, True),
            "spectrum": _wrap(lambda x: mp.nwc_spectrum(x, interp), 1, True),
            "cached": _wrap(
                lambda a, s: mp.nwc_poly_mult_cached(a, s, interp), 2, True
            ),
        }
        return "pallas-gl64", ops, True

    if _KERNEL64_N_OK(p) and p.width <= 62 and not (
        _KERNEL_N_OK(p) and p.width <= 24
    ):
        # q < 2^62 at any kernel-supported n — including 24-bit moduli at
        # n > 16384, where the single-word kernel's one-tile group layout
        # does not reach but the multi-tile double-word kernel does.
        from .kernels.mxu64 import MxuPlan64

        mp = MxuPlan64(p)
        interp = jax.devices()[0].platform != "tpu"
        ops = {
            "nwc": _wrap(lambda a, b: mp.nwc_poly_mult(a, b, interp), 2, True),
            "cyclic": _wrap(
                lambda a, b: mp.cyclic_poly_mult(a, b, interp), 2, True
            ),
            "fwd": _wrap(lambda x: mp.ntt_fwd(x, interp), 1, True),
            "inv": _wrap(lambda x: mp.ntt_inv(x, interp), 1, True),
            "nwc_fwd": _wrap(lambda x: mp.nwc_ntt_fwd(x, interp), 1, True),
            "spectrum": _wrap(lambda x: mp.nwc_spectrum(x, interp), 1, True),
            "cached": _wrap(
                lambda a, s: mp.nwc_poly_mult_cached(a, s, interp), 2, True
            ),
        }
        return "pallas-mxu64", ops, True

    plan = NttPlan(p)
    split = plan.ring.nlimbs == 2
    name = "xla-merged-64" if split else "xla-merged"

    def cached(a, s):
        fa = _ntt.nwc_fwd_merged(plan, a)
        return _ntt.nwc_inv_merged(plan, plan.ring.mul(fa, s))

    ops = {
        "nwc": _wrap(lambda a, b: _ntt.nwc_poly_mult_merged(plan, a, b), 2,
                     split),
        "cyclic": _wrap(lambda a, b: _ntt.cyclic_poly_mult(plan, a, b), 2,
                        split),
        "fwd": _wrap(lambda x: _ntt.ntt_fwd(plan, x), 1, split),
        "inv": _wrap(lambda x: _ntt.ntt_inv(plan, x), 1, split),
        "nwc_fwd": _wrap(lambda x: _ntt.nwc_fwd_merged(plan, x), 1, split),
        "spectrum": _wrap(lambda x: _ntt.nwc_fwd_merged(plan, x), 1, split),
        "cached": _wrap(cached, 2, split),
    }
    return name, ops, split


def takes_pairs(p: NttParams) -> bool:
    """True if the selected backend consumes/produces (hi, lo) uint32 word
    pairs (double-word rings); False for plain (B, n) uint32 arrays."""
    return _backend(p)[2]


def best(p: NttParams, op: str):
    """Fastest implementation of ``op`` for this parameter set (jitted)."""
    if op not in OPS:
        raise ValueError(f"op must be one of {OPS}, got {op!r}")
    return _backend(p)[1][op]


def best_nwc_poly_mult(p: NttParams):
    """Fastest negacyclic poly-mult for this parameter set (jitted)."""
    return best(p, "nwc")


def best_cyclic_poly_mult(p: NttParams):
    return best(p, "cyclic")


def best_ntt_fwd(p: NttParams):
    return best(p, "fwd")


def best_ntt_inv(p: NttParams):
    return best(p, "inv")


def best_nwc_ntt_fwd(p: NttParams):
    return best(p, "nwc_fwd")


def best_nwc_spectrum(p: NttParams):
    return best(p, "spectrum")


def best_nwc_poly_mult_cached(p: NttParams):
    return best(p, "cached")


def impl_name(p: NttParams, op: str = "nwc") -> str:
    """Which backend the policy selects (for logging/tests)."""
    if op not in OPS:
        raise ValueError(f"op must be one of {OPS}, got {op!r}")
    return _backend(p)[0]
