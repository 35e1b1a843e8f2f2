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
