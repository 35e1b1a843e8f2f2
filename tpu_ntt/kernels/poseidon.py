"""Fused Poseidon2-GL permutation as ONE Pallas kernel.

Why: the XLA scan form of the permutation (poseidon.py) is HBM-bound —
every elementwise Goldilocks op in the round body streams the (8, B)
state through HBM, and the measured unroll sweep is flat at ~14.6M
permutations/s (BENCH_NOTES round 4): the ceiling lever is keeping the
state RESIDENT for all 30 rounds, which is exactly what a Pallas kernel
buys.  One grid step loads the state tile, applies the full 4+22+4 round
schedule, and writes it back: HBM traffic is one read + one write of the
state per permutation instead of one per op.  Every Goldilocks multiply
is modmath.goldilocks_mul — the same VPU-exact 32-bit-pair primitive the
gl64 NTT kernel uses in its elementwise steps.

Layout (the measured-iteration design):
* Each of the W=8 state lanes carries its batch slice FOLDED INTO THE
  SUBLANES: lane i of a Bt-lane block is an (8, Bt/8) tile, so every
  per-lane op runs at full 8-sublane VPU occupancy.  (v1 kept lanes as
  (1, Bt) rows — bit-exact but only 12.5% sublane utilization, measured
  11.3M perm/s, SLOWER than the XLA path.)
* The kernel input is (16*W, Bt/8): rows [8i, 8i+8) are lane i's hi
  words, rows [8W + 8i, ...) its lo words; the host-side fold/unfold is
  a free reshape outside the kernel.
* The 8 FULL rounds are unrolled (per-lane immediate constants); the 22
  PARTIAL rounds run as one lax.fori_loop whose constants live in
  (rp, Bt/8) VMEM tables, dynamically row-selected off the REF with
  pl.dslice (value-side dynamic_slice has no Mosaic lowering) and
  sublane-broadcast.  Lanes stay SEPARATE values all the way (no
  per-round stack/concat; one concatenate at the final store).

Round structure and constants come from the SAME Poseidon2GL instance,
so kernel output is bit-identical to the XLA path and to the
pure-big-int reference model (asserted on chip; CPU-side interpret-mode
tests are deliberately absent — the interpreted program's XLA-CPU
compile runs >9 minutes, a recorded dead end, while the Mosaic compile
takes seconds).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..modmath import GOLDILOCKS_Q as Q

U32 = jnp.uint32

#: sublane fold factor: each lane's batch slice becomes (FOLD, Bt/FOLD)
FOLD = 8


def _permute_rounds(hasher, lanes, cph_ref, cpl_ref, part_unroll):
    """The full 4+22+4 round schedule over a list of W lane pairs (each
    an (F, cols) tile) — shared by the permutation kernel and the fused
    sponge kernel."""
    from jax.experimental import pallas as pl

    W = hasher.width
    add = hasher._add
    sbox = hasher._sbox
    mul = hasher._mul

    def ext(lanes):
        blocks = [hasher._m4_block(lanes[o:o + 4])
                  for o in range(0, W, 4)]
        s = blocks[0]
        for b in blocks[1:]:
            s = [add(si, bi) for si, bi in zip(s, b)]
        return [add(b[i], s[i]) for b in blocks for i in range(4)]

    def lane_const(lane, c):
        return (jnp.full_like(lane[0], c >> 32),
                jnp.full_like(lane[1], c & 0xFFFFFFFF))

    dm1 = [(d - 1) % Q for d in hasher.diag]
    half = hasher.rf // 2
    rc_full = [rc for rc in hasher.rcs if len(rc) == W]

    def full_round(lanes, rc):
        lanes = [sbox(add(lane, lane_const(lane, rc[i])))
                 for i, lane in enumerate(lanes)]
        return ext(lanes)

    def part_round(i, carry):
        lanes = [(carry[2 * j], carry[2 * j + 1]) for j in range(W)]
        rch = jnp.broadcast_to(cph_ref[pl.dslice(i, 1), :],
                               lanes[0][0].shape)
        rcl = jnp.broadcast_to(cpl_ref[pl.dslice(i, 1), :],
                               lanes[0][1].shape)
        x0 = sbox(add(lanes[0], (rch, rcl)))
        lanes = [x0] + lanes[1:]
        s = lanes[0]
        for j in range(1, W):
            s = add(s, lanes[j])
        out = [add(mul(lane, lane_const(lane, dm1[j])), s)
               for j, lane in enumerate(lanes)]
        return tuple(v for lane in out for v in lane)

    lanes = ext(lanes)
    for rc in rc_full[:half]:
        lanes = full_round(lanes, rc)
    carry = jax.lax.fori_loop(
        0, hasher.rp, part_round,
        tuple(v for lane in lanes for v in lane),
        unroll=hasher.rp if part_unroll else 1)
    lanes = [(carry[2 * j], carry[2 * j + 1]) for j in range(W)]
    for rc in rc_full[half:]:
        lanes = full_round(lanes, rc)
    return lanes


def _kernel_body(hasher, part_unroll, cph_ref, cpl_ref, x_ref, o_ref):
    """x/o: (2*W*FOLD, Bt) uint32; cph/cpl: (rp, Bt) partial-round
    constants (each row one constant across lanes)."""
    x = x_ref[...]
    W = hasher.width
    F = FOLD
    lanes = [(x[F * i:F * (i + 1)], x[F * (W + i):F * (W + i + 1)])
             for i in range(W)]
    lanes = _permute_rounds(hasher, lanes, cph_ref, cpl_ref, part_unroll)
    o_ref[...] = jnp.concatenate([lane[0] for lane in lanes] +
                                 [lane[1] for lane in lanes])


def _sponge_body(hasher, L, part_unroll, cph_ref, cpl_ref,
                 rh_ref, rl_ref, o_ref):
    """Fused rate-4 sponge over rows of L elements: rh/rl are
    (L4*FOLD, cols) with element j of each batch lane in sublane rows
    [j*FOLD, (j+1)*FOLD) (L4 = L padded to a multiple of 4 with zeros —
    absorbing zero is the identity, bit-compatible with the reference
    model's partial last chunk); o is the (2*4*FOLD, cols) digest.  The
    state stays in VMEM across ALL ceil(L/4) permutations instead of
    round-tripping HBM between chunk calls."""
    from jax.experimental import pallas as pl

    W = hasher.width
    F = FOLD
    add = hasher._add
    cols = rh_ref.shape[1]
    zero = jnp.zeros((F, cols), jnp.uint32)
    state = [(zero, zero)] * W
    # length-in-capacity domain separation (true L, not the padded L4)
    state[4] = (jnp.full((F, cols), L >> 32, jnp.uint32),
                jnp.full((F, cols), L & 0xFFFFFFFF, jnp.uint32))
    chunks = (L + 3) // 4

    def chunk_body(i, carry):
        lanes = [(carry[2 * j], carry[2 * j + 1]) for j in range(W)]
        for j in range(4):
            rh = rh_ref[pl.dslice((i * 4 + j) * F, F), :]
            rl = rl_ref[pl.dslice((i * 4 + j) * F, F), :]
            lanes[j] = add(lanes[j], (rh, rl))
        lanes = _permute_rounds(hasher, lanes, cph_ref, cpl_ref,
                                part_unroll)
        return tuple(v for lane in lanes for v in lane)

    carry = jax.lax.fori_loop(
        0, chunks, chunk_body,
        tuple(v for lane in state for v in lane))
    lanes = [(carry[2 * j], carry[2 * j + 1]) for j in range(4)]
    o_ref[...] = jnp.concatenate([lane[0] for lane in lanes] +
                                 [lane[1] for lane in lanes])


_HASHERS: dict = {}


def _hasher_key(hasher):
    """Content key over the FULL parameterization (width, round counts,
    round constants, internal diagonal) — identical-parameter hashers
    share one compiled kernel set, and the cache growth is bounded by
    the number of DISTINCT parameterizations (the id()-keyed form pinned
    every instance forever; ADVICE round 4)."""
    key = getattr(hasher, "_kernel_cache_key", None)
    if key is None:
        import hashlib

        blob = repr((hasher.width, hasher.rf, hasher.rp,
                     tuple(tuple(int(c) for c in rc) for rc in hasher.rcs),
                     tuple(int(d) for d in hasher.diag))).encode()
        key = hasher._kernel_cache_key = (
            hasher.width, hasher.rf, hasher.rp,
            hashlib.sha256(blob).hexdigest()[:16])
    # first instance with these constants serves all of them (kernels
    # depend only on the parameterization, which the key now captures)
    _HASHERS.setdefault(key, hasher)
    return key


@functools.lru_cache(maxsize=None)
def _compiled(hasher_key, batch: int, block: int, interpret: bool,
              part_unroll: bool):
    from jax.experimental import pallas as pl

    hasher = _HASHERS[hasher_key]
    W = hasher.width
    rp = hasher.rp
    cols = block // FOLD
    grid = (batch // block,)
    return pl.pallas_call(
        functools.partial(_kernel_body, hasher, part_unroll),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rp, cols), lambda i: (0, 0)),
            pl.BlockSpec((rp, cols), lambda i: (0, 0)),
            pl.BlockSpec((2 * W * FOLD, cols), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((2 * W * FOLD, cols), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((2 * W * FOLD, batch // FOLD),
                                       jnp.uint32),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _compiled_sponge(hasher_key, L: int, batch: int, block: int,
                     interpret: bool, part_unroll: bool):
    from jax.experimental import pallas as pl

    hasher = _HASHERS[hasher_key]
    rp = hasher.rp
    cols = block // FOLD
    L4 = ((L + 3) // 4) * 4
    grid = (batch // block,)
    return pl.pallas_call(
        functools.partial(_sponge_body, hasher, L, part_unroll),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rp, cols), lambda i: (0, 0)),
            pl.BlockSpec((rp, cols), lambda i: (0, 0)),
            pl.BlockSpec((L4 * FOLD, cols), lambda i: (0, i)),
            pl.BlockSpec((L4 * FOLD, cols), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((8 * FOLD, cols), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((8 * FOLD, batch // FOLD),
                                       jnp.uint32),
        interpret=interpret,
    )


def hash_rows_kernel(hasher, rows, block: int = 2048,
                     interpret: bool = False, part_unroll: bool = False):
    """Fused-sponge form of ``hasher.hash_rows`` for (B, L) rows: ONE
    kernel runs all ceil(L/4) absorb+permute chunks with the state
    VMEM-resident; rows are zero-padded to a rate multiple (identity
    under absorption) and the batch to the block multiple."""
    if block % (FOLD * 128):
        raise ValueError(f"block must be a multiple of {FOLD * 128}")
    key = _hasher_key(hasher)
    hi = jnp.asarray(rows[0])
    lo = jnp.asarray(rows[1])
    if hi.ndim != 2:
        raise ValueError("hash_rows_kernel expects (B, L) rows")
    B, L = hi.shape
    L4 = ((L + 3) // 4) * 4
    Bp = max(block, ((B + block - 1) // block) * block)
    pad = ((0, Bp - B), (0, L4 - L))
    hi = jnp.pad(hi, pad)
    lo = jnp.pad(lo, pad)
    # (Bp, L4) -> (L4, Bp) -> sublane fold (L4*FOLD, Bp/FOLD): element j
    # of batch lane b sits at [j*FOLD + b // (Bp/FOLD), b % (Bp/FOLD)] —
    # the same fold the permutation kernel uses for its state lanes
    hi = hi.T.reshape(L4 * FOLD, Bp // FOLD)
    lo = lo.T.reshape(L4 * FOLD, Bp // FOLD)
    cph, cpl = _part_tables(key, block // FOLD)
    out = _compiled_sponge(key, L, Bp, block, interpret, part_unroll)(
        jnp.asarray(cph), jnp.asarray(cpl), hi, lo)
    oh = out[:4 * FOLD].reshape(4, Bp)
    ol = out[4 * FOLD:].reshape(4, Bp)
    return [(oh[i, :B], ol[i, :B]) for i in range(4)]


@functools.lru_cache(maxsize=None)
def _part_tables(hasher_key, cols: int):
    hasher = _HASHERS[hasher_key]
    rc_part = [rc[0] for rc in hasher.rcs if len(rc) == 1]
    hi = np.repeat(np.array([[c >> 32] for c in rc_part],
                            dtype=np.uint32), cols, axis=1)
    lo = np.repeat(np.array([[c & 0xFFFFFFFF] for c in rc_part],
                            dtype=np.uint32), cols, axis=1)
    return hi, lo


class HostRef:
    """Minimal Ref adapter so the EXACT kernel bodies (_kernel_body /
    _sponge_body / _permute_rounds — the code that ships to Mosaic) can
    execute as plain XLA on CPU for regression testing.  Supports the
    two access patterns the bodies use: ``ref[...]`` full reads/writes
    and ``ref[pl.dslice(i, k), :]`` dynamic row slices (lowered to
    lax.dynamic_slice_in_dim, the same semantics Mosaic gives them).

    Why this exists: every compiled route to running this body on CPU is
    pathological (all measured round 5) — interpret-mode Pallas >9 min
    full / >8 min even at RF=2/RP=2 with 17 GB RSS; direct jit of the
    body compiles at --xla_backend_optimization_level=0 but the
    executable then spins >5 minutes.  Under ``jax.disable_jit()`` the
    FULL 30-round body executes eagerly in ~7 s (fori_loops become
    Python loops, each op a tiny cached kernel), covering every
    arithmetic/indexing regression; the pallas_call plumbing
    (BlockSpecs, sublane fold) is shape-level and stays pinned by the
    eval_shape tests + the on-chip drivers."""

    def __init__(self, arr):
        self.arr = jnp.asarray(arr)
        self.shape = self.arr.shape

    def __getitem__(self, idx):
        if idx is Ellipsis:
            return self.arr
        rows = idx[0] if isinstance(idx, tuple) else idx
        if hasattr(rows, "start"):  # pl.Slice
            return jax.lax.dynamic_slice_in_dim(self.arr, rows.start,
                                                rows.size, axis=0)
        return self.arr[idx]

    def __setitem__(self, idx, val):
        if idx is not Ellipsis:
            raise NotImplementedError("kernel bodies only store ref[...]")
        self.arr = jnp.asarray(val)


def permute_kernel(hasher, state, block: int = 2048,
                   interpret: bool = False, part_unroll: bool = False):
    """Drop-in kernel form of ``hasher.permute``: state is a list of
    width (hi, lo) pairs over a common 1-D batch; returns the same
    structure.  Batch is zero-padded to the block multiple (the
    permutation is elementwise across lanes, so padding lanes never
    contaminate real ones)."""
    if block % (FOLD * 128):
        raise ValueError(f"block must be a multiple of {FOLD * 128}")
    key = _hasher_key(hasher)
    W = hasher.width
    h = jnp.stack([jnp.asarray(s[0]) for s in state])
    l = jnp.stack([jnp.asarray(s[1]) for s in state])
    if h.ndim != 2:
        raise ValueError("permute_kernel expects a 1-D batch")
    B = h.shape[1]
    Bp = max(block, ((B + block - 1) // block) * block)
    if Bp != B:
        pad = ((0, 0), (0, Bp - B))
        h = jnp.pad(h, pad)
        l = jnp.pad(l, pad)
    # fold each lane's batch into sublanes: (W, Bp) -> (W*FOLD, Bp/FOLD)
    # with lane i occupying rows [FOLD*i, FOLD*(i+1))
    h = h.reshape(W * FOLD, Bp // FOLD)
    l = l.reshape(W * FOLD, Bp // FOLD)
    cph, cpl = _part_tables(key, block // FOLD)
    out = _compiled(key, Bp, block, interpret, part_unroll)(
        jnp.asarray(cph), jnp.asarray(cpl), jnp.concatenate([h, l]))
    oh = out[:W * FOLD].reshape(W, Bp)
    ol = out[W * FOLD:].reshape(W, Bp)
    return [(oh[i, :B], ol[i, :B]) for i in range(W)]
