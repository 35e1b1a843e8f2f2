"""Twiddle-factor tables and hex serialization.

Replaces the reference's constant toolchain (scripts/generate_twiddles.py,
scripts/generate_inverse_twiddles.py, test/refs/generate_twiddle_hex.py) and
its BRAM hex images (rtl/twiddle_forward*.hex, rtl/twiddle_inverse*.hex).

Conventions (SURVEY.md §0, reference: scripts/generate_twiddles.py:29-41):
* forward table[k] = psi^k mod q for k = 0..n-1
* inverse table[k] = psi^(-k) mod q
* hex lines are uppercase, zero-padded to ceil(width/4) digits
  (6 digits for 24-bit, 15 for 60-bit, e.g. rtl/twiddle_forward_4096_60bit.hex).

The plain CG network only ever reads even exponents 2*k*(i div k) of psi —
equal to the omega-exponents of the cyclic NTT (rtl/ntt_cg_address_gen.v:
96-100; discussion reports/final-report.tex:513-530) — so a psi-indexed table
plus that addressing reproduces the cyclic transform; we precompute the
per-stage omega powers directly instead of re-deriving them per butterfly.
"""

from __future__ import annotations

import functools as _functools
from typing import List, Sequence

import numpy as np

from .params import NttParams


def psi_powers(p: NttParams) -> List[int]:
    """Forward twiddle table: psi^k for k = 0..n-1."""
    out, cur = [], 1
    for _ in range(p.n):
        out.append(cur)
        cur = cur * p.psi % p.q
    return out


def psi_inv_powers(p: NttParams) -> List[int]:
    """Inverse twiddle table: psi^-k for k = 0..n-1."""
    out, cur = [], 1
    for _ in range(p.n):
        out.append(cur)
        cur = cur * p.psi_inv % p.q
    return out


def stage_twiddles(n: int, omega: int, q: int) -> np.ndarray:
    """Per-stage butterfly twiddles for the plain CG network, as Python ints.

    Returns an object-dtype array of shape (log2(n), n//2):
    ``tw[s-1][i] = omega^(k * (i // k))`` with ``k = n >> s`` — the factor
    applied to the odd input of butterfly i at stage s
    (reference semantics: new_reference/cg_ntt.py:49-59).
    """
    log_n = n.bit_length() - 1
    out = np.empty((log_n, n // 2), dtype=object)
    for s in range(1, log_n + 1):
        k = n >> s
        omega_s = pow(omega, k, q)
        w = 1
        for i in range(n // 2):
            if i and i % k == 0:
                w = w * omega_s % q
            out[s - 1, i] = w
    return out


def device_psi_powers(p: NttParams, inverse: bool = False):
    """On-device twiddle generation seeded with the single root.

    The TPU analog of the reference's on-the-fly generator
    ``ntt_twiddle_table`` (rtl/ntt_twiddle_table.v:3-120): at reset that
    module fills an n-entry register table by n SERIAL ``mod_mult``
    launches (serial-mult state machine at rtl/ntt_twiddle_table.v:81-118,
    per-entry generate write block at :58-79), trading ROM images for
    generation latency.  Here the table materializes on
    device in log2(n) DOUBLING steps — ``arr <- concat(arr, arr * s)``
    with the stride scalar squared each step (``s: psi^1, psi^2, psi^4,
    ...``) — so only the scalar seed crosses the host boundary: no O(n)
    host big-int loop and no n-entry constant baked into the jit
    program.  Useful when tables must be (re)built at runtime from
    ``(psi, q)`` or at config-5 sizes (n = 2^20) where the host loop is
    seconds and the device scan is log-depth.

    Returns the same table as :func:`psi_powers` (:func:`psi_inv_powers`
    when ``inverse``) as device array(s): uint32 for width <= 30, a
    (hi, lo) uint32 pair otherwise.  Bit-exact vs the host tables
    (tests/test_tables.py::test_device_psi_powers_*).
    """
    import jax
    import jax.numpy as jnp

    from .modmath import make_ring

    ring = make_ring(p)
    seed = ring.encode([p.psi_inv if inverse else p.psi])
    one = ring.encode([1])
    log_n = p.n.bit_length() - 1

    def _limbs(e):
        return e if isinstance(e, tuple) else (e,)

    @jax.jit
    def gen(seed, one):
        arr, stride = one, seed
        for i in range(log_n):
            nxt = ring.mul(arr, stride)  # stride (1,) broadcasts over arr
            cat = tuple(jnp.concatenate([x, y])
                        for x, y in zip(_limbs(arr), _limbs(nxt)))
            arr = cat if isinstance(arr, tuple) else cat[0]
            if i < log_n - 1:  # the final stride is never consumed
                stride = ring.mul(stride, stride)
        return arr

    return gen(seed, one)


def _power_ladder(ring, seed, one, log_c: int):
    """Traceable log-doubling ladder: 2^log_c powers of the seed scalar
    (``arr <- concat(arr, arr * stride)``, stride squared each step)."""
    import jax.numpy as jnp

    def _limbs(e):
        return e if isinstance(e, tuple) else (e,)

    arr, stride = one, seed
    for i in range(log_c):
        nxt = ring.mul(arr, stride)
        cat = tuple(jnp.concatenate([x, y], axis=-1)
                    for x, y in zip(_limbs(arr), _limbs(nxt)))
        arr = cat if isinstance(arr, tuple) else cat[0]
        if i < log_c - 1:
            stride = ring.mul(stride, stride)
    return arr


def device_powers(base: int, count: int, p: NttParams):
    """count powers of ``base`` mod q generated on device by log-doubling
    (the device_psi_powers idiom with an arbitrary seed); count must be a
    power of two.  Returns ring-layout device array(s)."""
    import jax

    from .modmath import make_ring

    if count & (count - 1):
        raise ValueError("count must be a power of two")
    ring = make_ring(p)
    seed = ring.encode([base % p.q])
    one = ring.encode([1])
    log_c = count.bit_length() - 1

    @jax.jit
    def gen(seed, one):
        return _power_ladder(ring, seed, one, log_c)

    return gen(seed, one)


def _device_shoup32(w, q, m_hi, m_lo):
    """Traceable core of :func:`device_shoup32`; q, m_hi, m_lo may be
    Python ints or traced uint32 scalars (the q-generic builder passes
    traced values so one compiled program serves a whole prime tower)."""
    import jax.numpy as jnp

    from .modmath import mul32

    t_est = w * jnp.uint32(m_hi) + mul32(w, jnp.full_like(w, m_lo))[0]
    # r = w*2^32 - t_est*q (true value < 2q < 2^32: low word suffices)
    r = jnp.uint32(0) - mul32(t_est, jnp.full_like(w, q))[1]
    return t_est + (r >= q).astype(jnp.uint32)


def device_shoup32(w, q: int):
    """floor(w * 2^32 / q) computed ON DEVICE for uint32 w < q < 2^31 —
    the Shoup quotient table without any host big-int division.

    Uses the precomputed scalar M = floor(2^64 / q):
    t_est = floor(w*M / 2^32) = w*M_hi + hi32(w*M_lo)  (exact: no cross
    terms, and both addends are < 2^32 because the true quotient is).
    The estimate is off by at most 1 (error w*(2^64 - M q)/(q 2^32)
    < q/2^32 < 1), fixed exactly by one remainder comparison."""
    M = (1 << 64) // q
    return _device_shoup32(w, q, M >> 32, M & 0xFFFFFFFF)


def device_stage_tables(p: NttParams, reduction=None):
    """Every per-stage table an XLA-path NttPlan needs, built ON DEVICE —
    no O(n log n) host big-int work (reference counterpart: the constants-
    for-any-(n,q)-on-demand toolchain, scripts/generate_twiddles.py:29-41).

    Single-word rings only (q < 2^30): that is exactly the width band the
    dispatch policy routes to the XLA merged path at runtime (dispatch.py
    policy: 25..30-bit any n, <= 24-bit above the kernel n-cap); wider
    moduli ship on fused kernels whose tables are O(n) host builds.

    The O(n) device generators are the log-doubling power ladders; every
    per-stage table is then a static slice / gather / repeat of those.
    Twiddle encodings match ``ring.encode_tw`` per reduction backend:
    Shoup quotients come from :func:`device_shoup32`, Montgomery domain
    entry is one Barrett scale by R mod q, Barrett is the raw residue.
    The whole build is traced as ONE jitted program whose inputs are the
    four scalar root seeds plus the q-dependent scalars (q, Barrett mu,
    n^-1, the Shoup-divisor words, R mod q) — q enters at RUN time, so the
    compiled program is SHARED by every modulus of the same bit length at
    a given n (``_stage_table_builder`` is cached on (n, barrett_k,
    reduction)).  Building an RNS tower of same-width primes therefore
    pays one trace/compile and then one fast device launch per prime.
    Returns a dict consumed by ``NttPlan(p, device_tables=True)``;
    bit-exact vs the host builds (tests/test_tables.py)."""
    import jax.numpy as jnp

    from .modmath import encode32
    from .params import Reduction

    if p.width > 30:
        raise ValueError(
            "device_stage_tables covers single-word rings (q < 2^30); "
            "wider moduli take the fused-kernel paths whose tables are "
            "O(n) host builds"
        )
    reduction = reduction or Reduction.SHOUP  # make_ring's default
    q = p.q
    M = (1 << 64) // q  # Shoup-divisor words (host O(1) big-int)
    consts = {
        "q": jnp.uint32(q),
        "mu": jnp.uint32(p.barrett_mu),
        "n_inv": jnp.uint32(p.n_inv),
        "m_hi": jnp.uint32(M >> 32),
        "m_lo": jnp.uint32(M & 0xFFFFFFFF),
        "r_mod_q": jnp.uint32((1 << 32) % q),
    }
    seeds = encode32([p.psi, p.psi_inv, p.omega, p.omega_inv]).reshape(4, 1)
    ones = encode32([1, 1, 1, 1]).reshape(4, 1)
    build = _stage_table_builder(p.n, p.barrett_k, reduction)
    return build(consts, seeds, ones)


@_functools.lru_cache(maxsize=64)
def _stage_table_builder(n: int, k: int, reduction):
    """The jitted q-generic table-build program for (n, bitlen(q) = k,
    reduction).  Cached so repeat builds (and every same-width prime of an
    RNS tower) reuse one compiled executable; only ``k`` must be static
    because Barrett's shifts are static-amount word shifts (modmath.shr64)."""
    import jax
    import jax.numpy as jnp

    from .modmath import barrett_mul32
    from .params import Reduction

    log_n = n.bit_length() - 1

    # bit-reversal permutation ON DEVICE, constant-free: reshape the vector
    # to (2,)*log_n, reverse the axes, flatten — pure data movement instead
    # of an n-entry gather-index literal baked into the program.
    def bitrev(x):
        return x.reshape((2,) * log_n).transpose(
            tuple(reversed(range(log_n)))).reshape(n)

    # Shoup quotients and Montgomery entry are ELEMENTWISE in the residue,
    # so the four ladders are encoded ONCE and every per-stage table is a
    # pure slice/repeat of the encoded arrays — ~10x fewer traced ops than
    # encoding each of the ~6*log_n stage tables separately.
    def m(f, e):  # map over encoding limbs (residue[, quotient])
        return tuple(f(x) for x in e) if isinstance(e, tuple) else f(e)

    @jax.jit
    def build(c, seeds, ones):
        q, mu = c["q"], c["mu"]

        def bmul(a, b):
            return barrett_mul32(a, b, q, k, mu)

        def scale(w, s):  # w * s mod q, s a traced uint32 scalar
            return bmul(w, jnp.full_like(w, s))

        if reduction is Reduction.SHOUP:
            enc = lambda w: (w, _device_shoup32(w, q, c["m_hi"], c["m_lo"]))
        elif reduction is Reduction.MONTGOMERY:
            enc = lambda w: scale(w, c["r_mod_q"])  # to_mont on device
        else:
            enc = lambda w: w

        class _R:  # ladder ring view: standard-domain Barrett products
            mul = staticmethod(bmul)

        # ONE batched ladder grows all four power tables (rows: psi,
        # psi^-1, omega, omega^-1) and ONE batched encode covers them.
        ladders = _power_ladder(_R, seeds, ones, log_n)  # (4, n)
        e_all = enc(ladders)
        row = lambda i: m(lambda x: x[i], e_all)
        e_psi, e_psi_inv, e_om, e_omi = (row(i) for i in range(4))
        psi_inv = ladders[1]  # raw residues
        e_brv = m(bitrev, e_psi)
        e_brv_inv = m(bitrev, e_psi_inv)
        return {
            "psi_pows": e_psi,
            "psi_inv_pows": e_psi_inv,
            "n_inv_tw": enc(jnp.full((1,), c["n_inv"], dtype=jnp.uint32)),
            # psi^-i * n^-1 folded untwist (the fused-kernel exit table)
            "psi_inv_n_inv": enc(scale(psi_inv, c["n_inv"])),
            # merged-psi stage tables: bit-reversed psi powers, sliced [m:2m)
            "merged_tw": [m(lambda x, mm=1 << s: x[mm:2 * mm], e_brv)
                          for s in range(log_n)],
            "merged_tw_inv": [m(lambda x, h=1 << s: x[h:2 * h], e_brv_inv)
                              for s in range(log_n)],
            # plain-CG stage tables: tw[s-1][i] = omega^(g * (i // g)),
            # g = n >> s — a strided slice of the omega ladder repeated g
            "stage_tw": [
                m(lambda x, g=n >> s: jnp.repeat(x[0:n // 2:g], g), e_om)
                for s in range(1, log_n + 1)
            ],
            "stage_tw_inv": [
                m(lambda x, g=n >> s: jnp.repeat(x[0:n // 2:g], g), e_omi)
                for s in range(1, log_n + 1)
            ],
            # no-gather DIF/DIT tables: strided slices of the ladders
            "dif_tw": [
                m(lambda x, s=s: x[0:n // 2:(1 << s)][: n >> (s + 1)], e_om)
                for s in range(log_n)
            ],
            "dit_tw_inv": [
                m(lambda x, s=s: x[0:n // 2:(1 << s)][: n >> (s + 1)], e_omi)
                for s in range(log_n)
            ],
        }

    return build


def hex_digits(width: int) -> int:
    return (width + 3) // 4


def dump_hex(values: Sequence[int], width: int) -> str:
    """Serialize a table in the reference's $readmemh format."""
    d = hex_digits(width)
    return "\n".join(f"{int(v):0{d}X}" for v in values) + "\n"


def load_hex(text: str) -> List[int]:
    return [int(line, 16) for line in text.split() if line.strip()]


def dump_twiddle_hex(p: NttParams, inverse: bool = False) -> str:
    table = psi_inv_powers(p) if inverse else psi_powers(p)
    return dump_hex(table, p.width)
