"""Property-based modular-arithmetic tests (hypothesis).

Randomized adversarial coverage of the exact-arithmetic primitives beyond
the fixed vectors of test_modmath.py — any mismatch against Python big-int
arithmetic is a soundness bug.
"""

import numpy as np
import pytest

try:
    from hypothesis import given, settings, strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from tpu_ntt import DILITHIUM_256, P60_4096, Reduction
from tpu_ntt.modmath import (
    Ring32, Ring64, barrett_mul32, encode32, encode64, mont_mul32,
    mul32, mul64_full, shoup_mul32, shoup_mul64,
)

u32s = st.integers(min_value=0, max_value=2**32 - 1)
u64s = st.integers(min_value=0, max_value=2**64 - 1)
QS = DILITHIUM_256
Q64 = P60_4096

SET = settings(max_examples=200, deadline=None)


@SET
@given(a=u32s, b=u32s)
def test_mul32_exact(a, b):
    hi, lo = mul32(encode32([a]), encode32([b]))
    assert (int(hi[0]) << 32 | int(lo[0])) == a * b


@SET
@given(a=u64s, b=u64s)
def test_mul64_full_exact(a, b):
    ea, eb = encode64([a]), encode64([b])
    w3, w2, w1, w0 = mul64_full((ea[0], ea[1]), (eb[0], eb[1]))
    got = sum(int(w[0]) << (32 * i) for i, w in enumerate((w0, w1, w2, w3)))
    assert got == a * b


@SET
@given(data=st.data())
def test_barrett_mont_shoup32_agree(data):
    q = QS.q
    a = data.draw(st.integers(0, q - 1))
    w = data.draw(st.integers(0, q - 1))
    ea, ew = encode32([a]), encode32([w])
    want = a * w % q
    assert int(barrett_mul32(ea, ew, q, QS.barrett_k, QS.barrett_mu)[0]) == want
    wm = encode32([w * QS.mont_r % q])
    assert int(mont_mul32(ea, wm, q, QS.mont_q_prime)[0]) == want
    ws = encode32([(w << 32) // q])
    assert int(shoup_mul32(ea, ew, ws, q)[0]) == want


@SET
@given(data=st.data())
def test_ring64_backends_agree(data):
    q = Q64.q
    a = data.draw(st.integers(0, q - 1))
    w = data.draw(st.integers(0, q - 1))
    want = a * w % q
    ea = encode64([a])
    for red in (Reduction.BARRETT, Reduction.MONTGOMERY, Reduction.SHOUP):
        ring = Ring64(Q64, red)
        tw = ring.encode_tw([w])
        got_hi, got_lo = ring.mul_tw((ea[0], ea[1]), tw)
        assert (int(got_hi[0]) << 32 | int(got_lo[0])) == want, red


@SET
@given(data=st.data())
def test_ring_add_sub_inverse(data):
    q = QS.q
    a = data.draw(st.integers(0, q - 1))
    b = data.draw(st.integers(0, q - 1))
    ring = Ring32(QS)
    ea, eb = encode32([a]), encode32([b])
    s = ring.add(ea, eb)
    assert int(ring.sub(s, eb)[0]) == a
    assert int(s[0]) == (a + b) % q
