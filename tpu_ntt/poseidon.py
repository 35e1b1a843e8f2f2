"""Poseidon2-style algebraic sponge over the Goldilocks field, batched for
the VPU, plus on-device Merkle commitment — the hashing half of a STARK
prover.

Why it belongs here: the reference accelerates the STARK-prover transform
(its cyclic pipeline, rtl/ntt_forward.v; stark.py exposes the coset LDE at
5.05B eval points/s) but a commitment needs the OTHER half too — hashing
every extended-trace row into a Merkle tree over the same field.  STARK
ecosystems standardized on arithmetic-friendly permutations (Poseidon /
Poseidon2) precisely so this half also runs on field arithmetic — which is
exactly what this framework accelerates.  All hashing below is Goldilocks
ring arithmetic (modmath.goldilocks_mul / add64 pairs), batched over rows
so the VPU sees wide elementwise lanes.

Construction (Poseidon2, Grassi–Khovratovich–Schofnegger 2023): width-W
state, x^7 S-box (gcd(7, q-1) = 1 for Goldilocks), RF=8 full rounds split
4+4 around RP=22 partial rounds (the papers' round numbers for W in
{8, 12} at alpha=7, 128-bit level), external linear layer built from the
4x4 matrix M4 = circ-like [[5,7,1,3],[4,6,1,1],[1,3,5,7],[1,1,4,6]]
applied blockwise then block-summed, internal layer 1 + diag(mu_i - 1)
(all-ones matrix plus a diagonal).

Round constants and internal diagonal are derived here from SHA-256
counter streams (rejection-sampled below q) — a documented
nothing-up-my-sleeve derivation, NOT the Plonky3 constant set (no network
access to replicate theirs); pass ``constants=`` to interoperate with an
external parameterization.  Every structural claim is tested against an
independent pure-Python big-int model (tests/test_poseidon.py), and the
M4 addition schedule is asserted against the explicit matrix product.

Sponge: rate 4 / capacity 4 at W=8 (digests are 4 field elements =
256 bits); fixed-length inputs use the standard length-in-capacity domain
separation.  Merkle trees hash sibling digest pairs through one W=8
permutation per node (the 2-to-1 compression every STARK stack uses);
levels run as batched device calls, log2(N) launches per tree.
"""

from __future__ import annotations

import functools
import hashlib

import numpy as np

from .modmath import GOLDILOCKS_Q as Q
from .modmath import goldilocks_mul

# ---------------------------------------------------------------------------
# parameter derivation (deterministic, documented)
# ---------------------------------------------------------------------------


def _sha_field_stream(tag: str, count: int) -> list[int]:
    """``count`` field elements from SHA-256(tag || counter), rejection
    sampling 8-byte big-endian words below q (acceptance ~1 - 2^-32)."""
    out: list[int] = []
    ctr = 0
    while len(out) < count:
        h = hashlib.sha256(f"{tag}|{ctr}".encode()).digest()
        ctr += 1
        for off in range(0, 32, 8):
            v = int.from_bytes(h[off:off + 8], "big")
            if v < Q:
                out.append(v)
                if len(out) == count:
                    break
    return out


# M4 from the Poseidon2 paper (§5.1); the external layer for W = 4k is
# block-circulant [[2*M4, M4, ...], [M4, 2*M4, ...], ...].
M4 = np.array([[5, 7, 1, 3],
               [4, 6, 1, 1],
               [1, 3, 5, 7],
               [1, 1, 4, 6]], dtype=np.int64)


def _internal_matrix_det(diag: list[int]) -> int:
    """det(J + diag(mu_i - 1)) mod Q for the all-ones matrix J, by the
    matrix determinant lemma applied exactly: with d_i = mu_i - 1,
    det = prod(d_i) * (1 + sum 1/d_i) when all d_i != 0; any d_i == 0
    falls back to modular Gaussian elimination (Q prime)."""
    W = len(diag)
    d = [(mu - 1) % Q for mu in diag]
    if all(d):
        prod = 1
        for v in d:
            prod = prod * v % Q
        s = sum(pow(v, -1, Q) for v in d) % Q
        return prod * (1 + s) % Q
    m = [[(1 + (d[i] if i == j else 0)) % Q for j in range(W)]
         for i in range(W)]
    det = 1
    for c in range(W):
        piv = next((r for r in range(c, W) if m[r][c]), None)
        if piv is None:
            return 0
        if piv != c:
            m[c], m[piv] = m[piv], m[c]
            det = Q - det
        det = det * m[c][c] % Q
        inv = pow(m[c][c], -1, Q)
        for r in range(c + 1, W):
            f = m[r][c] * inv % Q
            for j in range(c, W):
                m[r][j] = (m[r][j] - f * m[c][j]) % Q
    return det


@functools.lru_cache(maxsize=None)
def default_constants(width: int, rf: int, rp: int):
    """(round_constants, internal_diag): rc[r] is a width-vector for the
    rf full rounds and a single element for each partial round (only lane
    0 is shifted there); diag mu_i for the internal matrix."""
    rc_full = _sha_field_stream(f"tpu_ntt.poseidon2.gl.w{width}.rc", rf * width)
    rc_part = _sha_field_stream(f"tpu_ntt.poseidon2.gl.w{width}.rp", rp)
    # internal diagonal: mu_i must keep 1 + diag(mu_i - 1) invertible;
    # random field elements satisfy this with overwhelming probability
    # (Poseidon2 §5.3 samples theirs the same way, then checks).  The
    # cheap derivation-time checks are PERFORMED here (ADVICE round 4):
    # every mu_i != 0 and det(internal matrix) != 0, re-sampling from
    # the continuation of the same SHA stream on failure (the first
    # draw passes for the shipped widths, so published digests are
    # unchanged; the check guards custom widths/streams).
    attempt = 0
    while True:
        tag = (f"tpu_ntt.poseidon2.gl.w{width}.diag"
               + (f".retry{attempt}" if attempt else ""))
        diag = _sha_field_stream(tag, width)
        if all(diag) and _internal_matrix_det(diag) != 0:
            break
        attempt += 1
    half = rf // 2
    rcs = [rc_full[r * width:(r + 1) * width] for r in range(half)]
    rcs += [[c] for c in rc_part]
    rcs += [rc_full[r * width:(r + 1) * width] for r in range(half, rf)]
    return rcs, diag


# ---------------------------------------------------------------------------
# pure-Python reference model (oracle for the device path + FRI verifier)
# ---------------------------------------------------------------------------


class PoseidonRef:
    """Big-int model of the exact same permutation (slow, independent)."""

    def __init__(self, width: int = 8, rf: int = 8, rp: int = 22,
                 constants=None):
        self.width, self.rf, self.rp = width, rf, rp
        self.rcs, self.diag = constants or default_constants(width, rf, rp)

    def _m4(self, x):
        return [sum(int(M4[i][j]) * x[j] for j in range(4)) % Q
                for i in range(4)]

    def _external(self, x):
        blocks = [self._m4(x[o:o + 4]) for o in range(0, self.width, 4)]
        if self.width == 4:
            # W=4 external layer is 2*M4 (paper §5.1)
            return [2 * v % Q for v in blocks[0]]
        s = [sum(b[i] for b in blocks) % Q for i in range(4)]
        return [(b[i] + s[i]) % Q for b in blocks for i in range(4)]

    def _internal(self, x):
        s = sum(x) % Q
        return [(s + (self.diag[i] - 1) * x[i]) % Q
                for i in range(self.width)]

    @staticmethod
    def _sbox(v):
        v2 = v * v % Q
        v4 = v2 * v2 % Q
        return v4 * v2 % Q * v % Q

    def permute(self, state):
        x = [int(v) % Q for v in state]
        assert len(x) == self.width
        half = self.rf // 2
        x = self._external(x)
        for r, rc in enumerate(self.rcs):
            if len(rc) == self.width:  # full round
                x = [(v + c) % Q for v, c in zip(x, rc)]
                x = [self._sbox(v) for v in x]
                x = self._external(x)
            else:  # partial round
                x[0] = self._sbox((x[0] + rc[0]) % Q)
                x = self._internal(x)
        return x

    def hash_elements(self, values, rate: int = 4) -> list[int]:
        vals = [int(v) % Q for v in values]
        cap = self.width - rate
        state = [0] * self.width
        state[rate] = len(vals) % Q  # length domain separation
        for off in range(0, max(len(vals), 1), rate):
            chunk = vals[off:off + rate]
            for i, v in enumerate(chunk):
                state[i] = (state[i] + v) % Q
            state = self.permute(state)
        return state[:rate]

    def compress(self, left, right) -> list[int]:
        return self.permute([int(v) % Q for v in left] +
                            [int(v) % Q for v in right])[:4]


# ---------------------------------------------------------------------------
# batched device permutation
# ---------------------------------------------------------------------------


class Poseidon2GL:
    """Device Poseidon2 over (hi, lo) uint32 pair lanes.

    State is a list of ``width`` pairs; every op is elementwise over the
    arbitrary common batch shape, so hashing N rows runs the whole
    permutation as ~350 vectorized Goldilocks multiplies across N lanes —
    the shape the VPU wants (no cross-lane traffic except the static
    width-8 linear layers, which are adds)."""

    def __init__(self, width: int = 8, rf: int = 8, rp: int = 22,
                 constants=None, unroll: tuple[int, int] = (4, 2),
                 backend: str = "xla", interpret: bool = False):
        import jax

        if width % 4:
            raise ValueError("width must be a multiple of 4")
        if backend not in ("xla", "kernel"):
            raise ValueError("backend must be 'xla' or 'kernel'")
        self.width, self.rf, self.rp = width, rf, rp
        self.unroll = unroll  # (full-round, partial-round) scan unroll
        self.backend = backend  # 'kernel': fused Pallas permutation for
        # 1-D batches (kernels/poseidon.py, 58M perm/s vs 14.6M on chip);
        # N-D batches and CPU tests use the XLA scan form either way
        self.interpret = interpret
        self.rcs, self.diag = constants or default_constants(width, rf, rp)
        self.ref = PoseidonRef(width, rf, rp, (self.rcs, self.diag))
        # jitted entry points, cached per input shape: one permutation is
        # a ~2k-op XLA program that compiles in seconds; Merkle/FRI call
        # these per level so nothing ever builds a giant unrolled graph
        # (a single-jit 2^15-leaf tree is a 250k-op program whose remote
        # compile ran >10 minutes over the tunnel — measured dead end)
        self.permute_j = jax.jit(self._permute_impl)
        self.compress_j = jax.jit(self.compress)
        self.hash_rows_j = jax.jit(self.hash_rows)

    # -- Goldilocks pair helpers (free functions; no params needed) --------
    @staticmethod
    def _add(a, b):
        import jax.numpy as jnp

        from .modmath import add64, const64, ge64, select64, sub64

        s = add64(a, b)
        carried = (s[0] < a[0]) | ((s[0] == a[0]) & (s[1] < a[1]))
        qq = const64(Q, a[1])
        over = carried | ge64(s, qq)
        return select64(over, sub64(s, qq), s)

    @staticmethod
    def _const(v, like):
        from .modmath import const64

        return const64(v % Q, like)

    def _add_const(self, a, c: int):
        return self._add(a, self._const(c, a[1]))

    @staticmethod
    def _mul(a, b):
        return goldilocks_mul(a, b)

    def _mul_const(self, a, c: int):
        return goldilocks_mul(a, self._const(c, a[1]))

    def _sbox(self, v):
        v2 = self._mul(v, v)
        v4 = self._mul(v2, v2)
        return self._mul(self._mul(v4, v2), v)

    def _m4_block(self, x):
        """M4 @ x via the addition schedule (verified against the matrix
        in tests): 8 adds + 4 doublings, no multiplies."""
        add = self._add
        x0, x1, x2, x3 = x
        t0 = add(x0, x1)
        t1 = add(x2, x3)
        t2 = add(add(x1, x1), t1)          # 2*x1 + x2 + x3
        t3 = add(add(x3, x3), t0)          # 2*x3 + x0 + x1
        t4 = add(add(add(t1, t1), add(t1, t1)), t3)  # 4*t1 + t3
        t5 = add(add(add(t0, t0), add(t0, t0)), t2)  # 4*t0 + t2
        t6 = add(t3, t5)
        t7 = add(t2, t4)
        return [t6, t5, t7, t4]

    def _external_stacked(self, hl):
        """External linear layer on the (W, ...) lane-stacked state."""
        import jax.numpy as jnp

        W = self.width
        h, l = hl
        rows = [(h[i], l[i]) for i in range(W)]
        blocks = [self._m4_block(rows[o:o + 4]) for o in range(0, W, 4)]
        if W == 4:
            out = [self._add(v, v) for v in blocks[0]]
        else:
            s = blocks[0]
            for b in blocks[1:]:
                s = [self._add(si, bi) for si, bi in zip(s, b)]
            out = [self._add(b[i], s[i]) for b in blocks for i in range(4)]
        return (jnp.stack([o[0] for o in out]),
                jnp.stack([o[1] for o in out]))

    def permute(self, state):
        """state: list of width (hi, lo) pairs, any common batch shape.

        Round structure runs as three lax.scan's (4 full / 22 partial /
        4 full) over a LANE-STACKED (W, ...) state, with the full-round
        S-box vectorized across all W lanes: the traced program is ~2k
        primitive ops instead of ~35k fully unrolled — the difference
        between seconds and many minutes of XLA compile per batch shape
        (measured; the Merkle/FRI paths compile one such program per
        level shape)."""
        import jax.numpy as jnp
        from jax import lax

        W = self.width
        h = jnp.stack([jnp.asarray(s[0]) for s in state])
        l = jnp.stack([jnp.asarray(s[1]) for s in state])
        nb = h.ndim - 1
        shape = h.shape

        def bcast(arr32):
            """(k,) or (k, W) host uint32 -> scan xs broadcastable over
            the batch dims."""
            a = jnp.asarray(arr32)
            return a.reshape(a.shape + (1,) * nb)

        rc_full = [rc for rc in self.rcs if len(rc) == W]
        rc_part = [rc[0] for rc in self.rcs if len(rc) == 1]
        fh = np.array([[c >> 32 for c in rc] for rc in rc_full],
                      dtype=np.uint32)
        fl = np.array([[c & 0xFFFFFFFF for c in rc] for rc in rc_full],
                      dtype=np.uint32)
        ph = np.array([c >> 32 for c in rc_part], dtype=np.uint32)
        pl = np.array([c & 0xFFFFFFFF for c in rc_part], dtype=np.uint32)
        dm1 = [(d - 1) % Q for d in self.diag]
        dgh = bcast(np.array([c >> 32 for c in dm1], dtype=np.uint32))
        dgl = bcast(np.array([c & 0xFFFFFFFF for c in dm1],
                             dtype=np.uint32))

        def full_body(carry, rc):
            rch, rcl = rc
            x = self._add(carry, (jnp.broadcast_to(rch, shape),
                                  jnp.broadcast_to(rcl, shape)))
            return self._external_stacked(self._sbox(x)), None

        def part_body(carry, rc):
            ch, cl = carry
            rch, rcl = rc  # scalars
            x0 = self._add((ch[0], cl[0]),
                           (jnp.broadcast_to(rch, ch[0].shape),
                            jnp.broadcast_to(rcl, cl[0].shape)))
            x0 = self._sbox(x0)
            ch = ch.at[0].set(x0[0])
            cl = cl.at[0].set(x0[1])
            s = (ch[0], cl[0])
            for i in range(1, W):
                s = self._add(s, (ch[i], cl[i]))
            prod = self._mul((ch, cl), (jnp.broadcast_to(dgh, shape),
                                        jnp.broadcast_to(dgl, shape)))
            out = self._add(prod, (jnp.broadcast_to(s[0][None], shape),
                                   jnp.broadcast_to(s[1][None], shape)))
            return out, None

        half = self.rf // 2
        uf, up = self.unroll
        c = self._external_stacked((h, l))
        c, _ = lax.scan(full_body, c,
                        (bcast(fh[:half]), bcast(fl[:half])), unroll=uf)
        c, _ = lax.scan(part_body, c, (jnp.asarray(ph), jnp.asarray(pl)),
                        unroll=up)
        c, _ = lax.scan(full_body, c,
                        (bcast(fh[half:]), bcast(fl[half:])), unroll=uf)
        return [(c[0][i], c[1][i]) for i in range(W)]

    def _permute_impl(self, state):
        """Backend mux: the fused Pallas kernel where it applies (1-D
        batch, kernel backend), the XLA scan form otherwise."""
        import numpy as _np

        if self.backend == "kernel" and _np.ndim(state[0][0]) == 1:
            from .kernels.poseidon import permute_kernel

            # small batches (deep Merkle levels) pad to one block; use
            # the smallest legal block there so padding work is halved
            B = _np.shape(state[0][0])[0]
            block = 1024 if B <= 1024 else 2048
            return permute_kernel(self, state, block=block,
                                  interpret=self.interpret)
        return self.permute(state)

    # -- sponge / Merkle ----------------------------------------------------
    def hash_rows(self, rows):
        """(…, L) pair -> digest: 4 pairs of shape (…,).  Rows are
        absorbed rate-4; the row length sits in the first capacity lane
        (fixed-length domain separation, mirrored by the reference
        model)."""
        import jax.numpy as jnp

        hi, lo = rows
        hi = jnp.asarray(hi)
        lo = jnp.asarray(lo)
        if self.backend == "kernel" and hi.ndim == 2:
            from .kernels.poseidon import hash_rows_kernel

            return hash_rows_kernel(self, (hi, lo),
                                    interpret=self.interpret)
        L = hi.shape[-1]
        batch = hi.shape[:-1]
        rate = 4
        zero = (jnp.zeros(batch, jnp.uint32), jnp.zeros(batch, jnp.uint32))
        state = [zero] * self.width
        state[rate] = self._const(L, zero[1])
        for off in range(0, max(L, 1), rate):
            for i in range(min(rate, L - off)):
                lane = (hi[..., off + i], lo[..., off + i])
                state[i] = self._add(state[i], lane)
            state = self._permute_impl(state)
        return state[:4]

    def compress(self, left, right):
        """Two 4-lane digests -> one (2-to-1 Merkle node)."""
        return self._permute_impl(list(left) + list(right))[:4]


def merkle_levels(hasher: Poseidon2GL, leaves, jit: bool = True,
                  group: int = 1):
    """leaves: 4 pairs of shape (N,) -> list of levels, root last (each
    level 4 pairs of shape (N/2^k,)).  Batched compress calls through
    the per-shape jit cache (levels of equal size — across trees or FRI
    layers — reuse the same compiled program).  Pass ``jit=False`` only
    when the caller is already inside a jit trace.

    ``group > 1`` computes up to that many SUCCESSIVE levels per jitted
    call (one program containing `group` chained compress bodies,
    returning every intermediate level).  On a tunneled backend each
    device call is a ~25-100 ms RPC, so a 2^21-leaf tree's 21
    sequential calls are latency- not compute-bound; group=6 cuts the
    call count ~6x (the production-N FRI prover's dominant cost,
    BENCH_NOTES round 5).  Whole-TREE jitting is the recorded round-4
    dead end (compile explodes); bounded groups keep each program at
    ~group x 2k ops."""
    levels = [list(leaves)]
    cur = list(leaves)
    n = int(np.shape(cur[0][0])[0])
    if n & (n - 1) or n < 1:
        raise ValueError(f"leaf count must be a power of two, got {n}")
    if group > 1 and jit:
        import jax

        fn = getattr(hasher, "_grouped_levels_j", None)
        if fn is None:
            def impl(cur, steps):
                outs = []
                for _ in range(steps):
                    left = [(h[0::2], l[0::2]) for h, l in cur]
                    right = [(h[1::2], l[1::2]) for h, l in cur]
                    cur = hasher.compress(left, right)
                    outs.append(cur)
                return outs

            fn = hasher._grouped_levels_j = jax.jit(
                impl, static_argnums=1)
        while n > 1:
            steps = min(group, n.bit_length() - 1)
            outs = fn(cur, steps)
            levels.extend(list(lvl) for lvl in outs)
            cur = list(outs[-1])
            n >>= steps
        return levels
    compress = hasher.compress_j if jit else hasher.compress
    while n > 1:
        left = [(h[0::2], l[0::2]) for h, l in cur]
        right = [(h[1::2], l[1::2]) for h, l in cur]
        cur = compress(left, right)
        levels.append(cur)
        n //= 2
    return levels


def merkle_root(hasher: Poseidon2GL, leaves):
    return merkle_levels(hasher, leaves)[-1]


def merkle_open(levels, index: int) -> list[list[int]]:
    """Authentication path for leaf ``index`` from ``merkle_levels``
    output: the sibling digest at every level, leaf-adjacent first."""
    path = []
    node = index
    for lvl in levels[:-1]:
        sib = node ^ 1
        path.append([int(from_pairs((np.asarray(d[0])[sib],
                                     np.asarray(d[1])[sib])))
                     for d in lvl])
        node >>= 1
    return path


def merkle_verify(ref: PoseidonRef, root: list[int], index: int,
                  leaf: list[int], path: list[list[int]]) -> bool:
    """Host-side path check against the independent reference model."""
    dig = [int(v) % Q for v in leaf]
    node = index
    for sib in path:
        dig = ref.compress(sib, dig) if node & 1 else ref.compress(dig, sib)
        node >>= 1
    return dig == [int(v) % Q for v in root]


# -- host-side helpers -------------------------------------------------------

def to_pairs(values) -> tuple:
    """uint64-ish host array -> (hi, lo) uint32 pair."""
    a = np.asarray(values, dtype=np.uint64)
    return ((a >> np.uint64(32)).astype(np.uint32),
            (a & np.uint64(0xFFFFFFFF)).astype(np.uint32))


def from_pairs(pair) -> np.ndarray:
    hi = np.asarray(pair[0], dtype=np.uint64)
    lo = np.asarray(pair[1], dtype=np.uint64)
    return (hi << np.uint64(32)) | lo


def digest_ints(digest) -> list[int]:
    """4-lane device digest -> 4 Python ints."""
    return [int(from_pairs(d)) for d in digest]
