"""Implementation dispatch: pick the fastest measured path per workload.

Single source of truth for "which backend runs this operation on this
parameter set" — the TPU-native analog of the reference's REDUCTION_TYPE /
PARALLEL configuration mux (rtl/mod_mult.v:21-128 selects the arithmetic
backend; here the selection spans whole pipeline implementations).  The
benchmark harness (bench.py) and users both consume this policy, so there is
exactly one copy of it.

    mult = tpu_ntt.dispatch.best_nwc_poly_mult(params)
    out = mult(a, b)        # (B, n) uint arrays in, same out

Selection policy (measured on TPU v5e; CLAUDE.md performance ledger,
docs/DESIGN.md §2 and the BENCH_NOTES.md round-2 width-band A/B; the
kernel-eligibility half lives in kernels.plan_for):
  * q < 2^24, 256 <= n <= 16384, n % 128 == 0  ->  fused int8-MXU Pallas
    kernel (kernels/mxu.py), every operation.
  * q = 2^64 - 2^32 + 1 with 256 <= n <= 32768  ->  Goldilocks phi-fold
    int8-MXU kernel (kernels/gl64.py) — the special form is the only
    fused path above the generic kernel's q < 2^62 ceiling.
  * 2^30 < q < 2^62 with 256 <= n <= 32768      ->  double-word int8-MXU
    kernel (kernels/mxu64.py), every operation (VMEM-resident: unlike the
    XLA path it stays flat in throughput as batch grows).
  * 2^24 <= q <= 2^30 (any n), and q < 2^24 at 16384 < n <= 65536  ->
    XLA merged-psi single-word (Ring32 + Shoup): measured ~2.1x FASTER
    than the double-word kernel wherever the single-word ring exists
    (974k vs 469k nwc/s at n=4096 B=2048).
  * n > 65536 (any q), and n = 65536 for width > 30  ->  single-chip
    four-step decomposition — O(n) tables instead of the flat path's
    O(n log n); demonstrated to n = 2^20 on one chip.  (At n = 65536 the
    flat double-word kernel cannot compile — its per-step temporaries
    exceed the 16 MB scoped VMEM — and the kernel-locals four-step beats
    the flat XLA path 3.8-3.9x.)  For 30 < width <= 62 the nwc product
    AND the standalone nwc fwd/inv pair are overridden back onto the
    FLAT split-radix kernels up to n = 2^19 (the split left transforms
    make them compile and win — see the in-branch note).  Local
    sub-transforms follow the same
    plan_for policy: fused Pallas kernels where they win
    (sharded.KernelFourStep, "kernel-fourstep[-64]": width <= 24 and
    31..62 and Goldilocks — 1.6-2.2x over XLA locals on chip), else the
    XLA no-gather network ("xla-fourstep[-64]": width 25..30, where XLA
    locals win 2.4x).
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
import jax.numpy as jnp
import numpy as np

from . import ntt as _ntt
from .ntt import NttPlan
from .params import NttParams

#: operations the dispatch layer routes (mirrors the public entry points)
OPS = (
    "nwc",        # negacyclic poly-mult, natural order in/out
    "cyclic",     # INTT(NTT . NTT), the RTL top-level semantics
    "fwd",        # cyclic forward NTT
    "inv",        # cyclic inverse NTT (consumes fwd's layout)
    "nwc_fwd",    # psi-twist + forward NTT (the benchmarked forward)
    "nwc_inv",    # inverse + untwist + n^-1 (consumes nwc_fwd's layout)
    "spectrum",   # cacheable NWC operand spectrum
    "cached",     # product against a cached spectrum
    "dot",        # INTT(sum_k NTT(a_k).NTT(b_k)): (K, B, n) inputs — the
                  # lattice A@s inner product, one inverse per output
    "dot_cached",  # dot against a (K, B, n) stack of cached spectra:
                   # K forwards + 1 inverse (fixed keys / public A rows)
    "matvec_spectra",  # precompute spectra of a fixed (k, l, n) poly matrix
    "matvec",     # A @ s: (l, B, n) against matvec_spectra output ->
                  # (k, B, n); l + k transforms for k*l products
)

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


@functools.lru_cache(maxsize=None)
def fourstep_plan(p: NttParams):
    """The large-N four-step plan the policy would run: a
    ``sharded.KernelFourStep`` where the fused kernels cover both
    sub-transforms (explicit coverage predicate, not try/except — a
    genuine construction error inside a covered width must surface, not
    silently downgrade to the 2-4x-slower XLA locals), else the XLA
    ``FourStepPlan``.  Shared by ``_fourstep_backend`` and consumers
    that need the transform-domain LAYOUT (``spectrum_indices``), e.g.
    the STARK LDE's fused-kernel order at N > the flat window
    (stark.LdePlan)."""
    from . import sharded as _sh

    n1, n2 = _sh.default_split(p.n)
    interp = jax.devices()[0].platform != "tpu"
    fs = (_sh.KernelFourStep(p, n1, n2, interpret=interp)
          if _sh.KernelFourStep.supported(p, n1, n2) else None)
    return fs if fs is not None else _sh.FourStepPlan(p, n1, n2)


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

    When BOTH sub-transforms have fused-kernel coverage (kernels.plan_for)
    the local passes are the Pallas kernels themselves
    (sharded.KernelFourStep — "kernel-fourstep[-64]"), with the outer
    psi-twist folded into the column kernel and mid table exactly like the
    flat kernels fold theirs; otherwise the XLA no-gather locals run
    ("xla-fourstep[-64]", e.g. non-Goldilocks q >= 2^62).

    Spectrum layout is the selected backend's transform-domain order —
    self-consistent across fwd/inv/spectrum/cached, per the module
    docstring's layout contract.
    """
    from . import sharded as _sh

    ring_fs = fourstep_plan(p)
    fs = ring_fs if isinstance(ring_fs, _sh.KernelFourStep) else None
    n1, n2 = ring_fs.n1, ring_fs.n2
    ring = ring_fs.ring
    split = ring.nlimbs == 2
    tmap = _sh._tmap

    def _mat(x):
        return tmap(lambda a: a.reshape(a.shape[:-1] + (n1, n2)), x)

    def _flat(x):
        return tmap(lambda a: a.reshape(a.shape[:-2] + (p.n,)), x)

    if fs is not None:
        def fwd(x):
            return _flat(_sh.fourstep_fwd_kernel(fs, _mat(x)))

        def inv(x):
            return _flat(_sh.fourstep_inv_kernel(fs, _mat(x)))

        def nwc(a, b):
            return _flat(
                _sh.fourstep_nwc_poly_mult_kernel(fs, _mat(a), _mat(b))
            )

        def cyclic(a, b):
            fa = _sh.fourstep_fwd_kernel(fs, _mat(a))
            fb = _sh.fourstep_fwd_kernel(fs, _mat(b))
            return _flat(_sh.fourstep_inv_kernel(fs, ring.mul(fa, fb)))

        def nwc_fwd(x):
            return _flat(_sh.fourstep_fwd_kernel(fs, _mat(x), nwc=True))

        def nwc_inv(x):
            return _flat(_sh.fourstep_inv_kernel(fs, _mat(x), nwc=True))

        def cached(a, s):
            fa = _sh.fourstep_fwd_kernel(fs, _mat(a), nwc=True)
            return _flat(
                _sh.fourstep_inv_kernel(fs, ring.mul(fa, _mat(s)), nwc=True)
            )

        name = "kernel-fourstep-64" if split else "kernel-fourstep"
    else:
        fsx = ring_fs

        def fwd(x):
            return _flat(_sh.fourstep_fwd_local(fsx, _mat(x)))

        def inv(x):
            return _flat(_sh.fourstep_inv_local(fsx, _mat(x)))

        def nwc(a, b):
            return _flat(
                _sh.fourstep_nwc_poly_mult_local(fsx, _mat(a), _mat(b))
            )

        def cyclic(a, b):
            fa = _sh.fourstep_fwd_local(fsx, _mat(a))
            fb = _sh.fourstep_fwd_local(fsx, _mat(b))
            return _flat(_sh.fourstep_inv_local(fsx, ring.mul(fa, fb)))

        def nwc_fwd(x):
            return _flat(
                _sh.fourstep_fwd_local(fsx, ring.mul_tw(_mat(x),
                                                        fsx.twist_tw))
            )

        def nwc_inv(x):
            c = _sh.fourstep_inv_local(fsx, _mat(x))
            return _flat(ring.mul_tw(c, fsx.untwist_tw))

        def cached(a, s):
            fa = _sh.fourstep_fwd_local(fsx, ring.mul_tw(_mat(a),
                                                         fsx.twist_tw))
            c = _sh.fourstep_inv_local(fsx, ring.mul(fa, _mat(s)))
            return _flat(ring.mul_tw(c, fsx.untwist_tw))

        name = "xla-fourstep-64" if split else "xla-fourstep"

    def dot(a, b):
        # K forward passes + spectrum-domain accumulate + ONE inverse
        K = (a[0] if split else a).shape[0]
        pick = ((lambda x, k: tmap(lambda v: v[k], x)) if split
                else (lambda x, k: x[k]))
        acc = None
        for k in range(K):
            c = ring.mul(nwc_fwd(pick(a, k)), nwc_fwd(pick(b, k)))
            acc = c if acc is None else ring.add(acc, c)
        return nwc_inv(acc)

    def dot_cached(a, s):
        # the b-side spectra are precomputed ("spectrum" op per k):
        # K forwards + 1 inverse total
        K = (a[0] if split else a).shape[0]
        pick = ((lambda x, k: tmap(lambda v: v[k], x)) if split
                else (lambda x, k: x[k]))
        acc = None
        for k in range(K):
            c = ring.mul(nwc_fwd(pick(a, k)), pick(s, k))
            acc = c if acc is None else ring.add(acc, c)
        return nwc_inv(acc)

    def matvec_spectra(A):
        kk, ll = (A[0] if split else A).shape[:2]
        flat = tmap(lambda v: v.reshape(kk * ll, v.shape[-1]), A)
        return tmap(lambda v: v.reshape(kk, ll, v.shape[-1]),
                    nwc_fwd(flat))

    def matvec(s, spec):
        # l forwards + k inverses for k*l products; spectra broadcast
        # over the batch dim via the elementwise ring ops
        ll = (s[0] if split else s).shape[0]
        kk = (spec[0] if split else spec).shape[0]
        pick = lambda x, *idx: tmap(lambda v: v[idx], x)
        fs = [nwc_fwd(pick(s, j)) for j in range(ll)]
        outs = []
        for i in range(kk):
            acc = None
            for j in range(ll):
                c = ring.mul(fs[j], pick(spec, i, j))
                acc = c if acc is None else ring.add(acc, c)
            outs.append(nwc_inv(acc))
        if split:
            return (jnp.stack([o[0] for o in outs]),
                    jnp.stack([o[1] for o in outs]))
        return jnp.stack(outs)

    ops = {
        "nwc": _wrap(nwc, 2, split),
        "cyclic": _wrap(cyclic, 2, split),
        "fwd": _wrap(fwd, 1, split),
        "inv": _wrap(inv, 1, split),
        "nwc_fwd": _wrap(nwc_fwd, 1, split),
        "nwc_inv": _wrap(nwc_inv, 1, split),
        "spectrum": _wrap(nwc_fwd, 1, split),
        "cached": _wrap(cached, 2, split),
        "dot": _wrap(dot, 2, split),
        "dot_cached": _wrap(dot_cached, 2, split),
        "matvec_spectra": _wrap(matvec_spectra, 1, split),
        "matvec": _wrap(matvec, 2, split),
    }
    return name, ops, split


@functools.lru_cache(maxsize=None)
def flat_split_plan(p: NttParams):
    """The FLAT split-radix kernel plan serving ops above the four-step
    threshold (n = 2^16..2^19, 30 < width <= 62, depth-2..5 left
    transforms — DESIGN.md §2.5c), or None where the window doesn't
    apply.  Shared by ``_backend``'s op overrides and consumers that
    need the transform LAYOUT (stark.LdePlan's kernel order rides
    ``nwc_fourstep_to_natural_perm`` of this plan)."""
    if not (p.n in (_FOURSTEP_MIN_N, 2 * _FOURSTEP_MIN_N,
                    4 * _FOURSTEP_MIN_N, 8 * _FOURSTEP_MIN_N)
            and 30 < p.width <= 62):
        return None
    from .kernels.mxu64 import MxuPlan64
    from .kernels.sol64 import SolinasPlan64

    cls = (SolinasPlan64 if SolinasPlan64.covers_q(p.q, p.n)
           else MxuPlan64)
    return cls(p)


@functools.lru_cache(maxsize=None)
def _backend(p: NttParams):
    """(name, {op: callable}, takes_pairs) — the single policy table."""
    if p.n > _FOURSTEP_MIN_N or (p.n == _FOURSTEP_MIN_N and p.width > 30):
        # n = 65536 double-word: the DENSE flat kernel cannot compile
        # (scoped VMEM, see kernels.plan_for) and the kernel-locals
        # four-step beats the flat XLA path 3.8-3.9x (BENCH_NOTES.md
        # round 2), so the four-step window opens one size earlier for
        # width > 30 — EXCEPT the nwc product for q < 2^62, where the
        # depth-2 (n = 65536) / depth-3 (n = 2^17) / depth-4 (n = 2^18)
        # split-radix left transform (mxu64.py) shrinks the left
        # matrices 4x/8x/16x and the flat fused kernel both compiles and
        # beats the four-step: 24.3k vs 13.1k nwc/s at 65536 (w60 B=32),
        # 9.2k vs 6.5k at 2^17 (B=8; depth-3/4 also need the lifted
        # Mosaic VMEM cap — see _call), 4.3k vs 3.0k at 2^18 (B=32),
        # 2.0k vs 1.6k at 2^19 (depth-5, 112 MiB cap);
        # BENCH_NOTES.md rounds 3-4.  Round-5 session 2 extends the
        # override to the standalone fwd/inv pair: the flat split
        # kernels serve nwc_ntt_fwd/inv too and nearly DOUBLE the
        # four-step there (72.1k vs 37.2k fwd, 76.3k vs 38.3k inv at
        # n=65536 w60 B=32 on chip).  spectrum/cached/dot/matvec keep
        # the four-step backend so their layouts stay matched with
        # dot_cached/matvec consumers (no flat dot kernel exists at
        # these sizes — the dense left matrices blow scoped VMEM).
        name, ops, split = _fourstep_backend(p)
        mp = flat_split_plan(p)
        if mp is not None:
            interp = jax.devices()[0].platform != "tpu"
            ops = dict(ops)
            ops["nwc"] = _wrap(
                lambda a, b: mp.nwc_poly_mult(a, b, interp), 2, mp.pairs)
            ops["nwc_fwd"] = _wrap(
                lambda x: mp.nwc_ntt_fwd(x, interp), 1, mp.pairs)
            ops["nwc_inv"] = _wrap(
                lambda x: mp.nwc_ntt_inv(x, interp), 1, mp.pairs)
            depth = {1: 2, 2: 3, 4: 4, 8: 5}[p.n // _FOURSTEP_MIN_N]
            name = name + f"+flat-split{depth}-nwc"
        return name, ops, split

    from . import kernels as _kernels

    mp = _kernels.plan_for(p)
    if mp is not None:
        # Pallas compiles only on TPU; on CPU backends fall back to the
        # interpreter so the dispatch layer works everywhere.
        interp = jax.devices()[0].platform != "tpu"
        pr = mp.pairs
        ops = {
            "nwc": _wrap(lambda a, b: mp.nwc_poly_mult(a, b, interp), 2, pr),
            "cyclic": _wrap(
                lambda a, b: mp.cyclic_poly_mult(a, b, interp), 2, pr
            ),
            "fwd": _wrap(lambda x: mp.ntt_fwd(x, interp), 1, pr),
            "inv": _wrap(lambda x: mp.ntt_inv(x, interp), 1, pr),
            "nwc_fwd": _wrap(lambda x: mp.nwc_ntt_fwd(x, interp), 1, pr),
            "nwc_inv": _wrap(lambda x: mp.nwc_ntt_inv(x, interp), 1, pr),
            "spectrum": _wrap(lambda x: mp.nwc_spectrum(x, interp), 1, pr),
            "cached": _wrap(
                lambda a, s: mp.nwc_poly_mult_cached(a, s, interp), 2, pr
            ),
            "dot": _wrap(lambda a, b: mp.nwc_dot(a, b, interp), 2, pr),
            "dot_cached": _wrap(
                lambda a, s: mp.nwc_dot_cached(a, s, interp), 2, pr
            ),
            "matvec_spectra": _wrap(
                lambda A: mp.nwc_matvec_spectra(A, interp), 1, pr
            ),
            "matvec": _wrap(
                lambda s, blk: mp.nwc_matvec_cached(s, blk, interp), 2, pr
            ),
        }
        return mp.name, ops, pr

    plan = NttPlan(p)
    split = plan.ring.nlimbs == 2
    name = "xla-merged-64" if split else "xla-merged"

    def cached(a, s):
        fa = _ntt.nwc_fwd_merged(plan, a)
        return _ntt.nwc_inv_merged(plan, plan.ring.mul(fa, s))

    def dot(a, b):
        K = (a[0] if split else a).shape[0]
        pick = ((lambda x, k: (x[0][k], x[1][k])) if split
                else (lambda x, k: x[k]))
        acc = None
        for k in range(K):
            c = plan.ring.mul(_ntt.nwc_fwd_merged(plan, pick(a, k)),
                              _ntt.nwc_fwd_merged(plan, pick(b, k)))
            acc = c if acc is None else plan.ring.add(acc, c)
        return _ntt.nwc_inv_merged(plan, acc)

    def dot_cached(a, s):
        K = (a[0] if split else a).shape[0]
        pick = ((lambda x, k: (x[0][k], x[1][k])) if split
                else (lambda x, k: x[k]))
        acc = None
        for k in range(K):
            c = plan.ring.mul(_ntt.nwc_fwd_merged(plan, pick(a, k)),
                              pick(s, k))
            acc = c if acc is None else plan.ring.add(acc, c)
        return _ntt.nwc_inv_merged(plan, acc)

    tmapx = jax.tree.map

    def matvec_spectra(A):
        kk, ll = (A[0] if split else A).shape[:2]
        flat = tmapx(lambda v: v.reshape(kk * ll, v.shape[-1]), A)
        return tmapx(lambda v: v.reshape(kk, ll, v.shape[-1]),
                     _ntt.nwc_fwd_merged(plan, flat))

    def matvec(s, spec):
        ll = (s[0] if split else s).shape[0]
        kk = (spec[0] if split else spec).shape[0]
        pick = lambda x, *idx: tmapx(lambda v: v[idx], x)
        fs = [_ntt.nwc_fwd_merged(plan, pick(s, j)) for j in range(ll)]
        outs = []
        for i in range(kk):
            acc = None
            for j in range(ll):
                c = plan.ring.mul(fs[j], pick(spec, i, j))
                acc = c if acc is None else plan.ring.add(acc, c)
            outs.append(_ntt.nwc_inv_merged(plan, acc))
        if split:
            return (jnp.stack([o[0] for o in outs]),
                    jnp.stack([o[1] for o in outs]))
        return jnp.stack(outs)

    ops = {
        "nwc": _wrap(lambda a, b: _ntt.nwc_poly_mult_merged(plan, a, b), 2,
                     split),
        "cyclic": _wrap(lambda a, b: _ntt.cyclic_poly_mult(plan, a, b), 2,
                        split),
        "fwd": _wrap(lambda x: _ntt.ntt_fwd(plan, x), 1, split),
        "inv": _wrap(lambda x: _ntt.ntt_inv(plan, x), 1, split),
        "nwc_fwd": _wrap(lambda x: _ntt.nwc_fwd_merged(plan, x), 1, split),
        "nwc_inv": _wrap(lambda x: _ntt.nwc_inv_merged(plan, x), 1, split),
        "spectrum": _wrap(lambda x: _ntt.nwc_fwd_merged(plan, x), 1, split),
        "cached": _wrap(cached, 2, split),
        "dot": _wrap(dot, 2, split),
        "dot_cached": _wrap(dot_cached, 2, split),
        "matvec_spectra": _wrap(matvec_spectra, 1, split),
        "matvec": _wrap(matvec, 2, split),
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


def best_nwc_ntt_inv(p: NttParams):
    return best(p, "nwc_inv")


def best_nwc_spectrum(p: NttParams):
    return best(p, "spectrum")


def best_nwc_poly_mult_cached(p: NttParams):
    return best(p, "cached")


def best_nwc_dot(p: NttParams):
    """Fastest fused inner product INTT(Σ_k NTT(a_k)·NTT(b_k)) for
    (K, B, n) operand stacks — one inverse transform per output (the
    lattice A@s shape; see examples/spectrum_accumulate.py for the
    staged-spectrum route when operands repeat across products)."""
    return best(p, "dot")


def best_nwc_dot_cached(p: NttParams):
    """Fastest fused inner product against a (K, B, n) stack of CACHED
    spectra (each produced by ``best_nwc_spectrum``): K forwards + one
    inverse instead of 2K+1 transforms — the key-switching /
    fixed-operand shape (keys or public A rows transformed once)."""
    return best(p, "dot_cached")


def best_nwc_matvec_spectra(p: NttParams):
    """Precompute backend-layout spectra of a fixed (k, l, n) polynomial
    matrix for ``best_nwc_matvec`` (transform A once at key setup)."""
    return best(p, "matvec_spectra")


def best_nwc_matvec(p: NttParams):
    """Fastest fused A @ s over the polynomial ring: s is (l, B, n),
    the second argument is ``best_nwc_matvec_spectra``'s output for the
    same params; returns (k, B, n) with out[i] = Σ_j A[i,j] ⊛ s[j].
    Pays l + k transforms for k·l products (the Dilithium signing /
    verify matrix product; the reference would stage k·l full FSM
    pipelines, chipyard/ntt-test.c)."""
    return best(p, "matvec")


def impl_name(p: NttParams, op: str = "nwc") -> str:
    """Which backend the policy selects (for logging/tests)."""
    if op not in OPS:
        raise ValueError(f"op must be one of {OPS}, got {op!r}")
    return _backend(p)[0]
