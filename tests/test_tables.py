"""Twiddle-table and hex-vector parity tests (SURVEY.md §4 tier (c)).

BASELINE.json requires the on-host twiddle generator to reproduce the
reference's shipped BRAM images (rtl/twiddle_forward*.hex,
rtl/twiddle_inverse*.hex) bit-exactly.  The hex files are read directly from
the read-only reference mount when present; the serialization tests are
self-contained either way.
"""

import os

import pytest

from tpu_ntt import tables
from tpu_ntt.params import DILITHIUM_256, P24_1024, P24_4096, P60_4096

from conftest import reference_hex_path

HEX_CASES = [
    (DILITHIUM_256, "twiddle_forward.hex", False),
    (DILITHIUM_256, "twiddle_inverse.hex", True),
    (P24_1024, "twiddle_forward_1024.hex", False),
    (P24_1024, "twiddle_inverse_1024.hex", True),
    (P24_4096, "twiddle_forward_4096.hex", False),
    (P24_4096, "twiddle_inverse_4096.hex", True),
    (P60_4096, "twiddle_forward_4096_60bit.hex", False),
    (P60_4096, "twiddle_inverse_4096_60bit.hex", True),
]


def test_psi_powers_properties():
    p = DILITHIUM_256
    fwd = tables.psi_powers(p)
    inv = tables.psi_inv_powers(p)
    assert fwd[0] == 1 and inv[0] == 1
    assert fwd[1] == p.psi and inv[1] == p.psi_inv
    # psi^(n) = -1 (half-point property, cf. test_twiddle_rom.py checks)
    assert fwd[p.n // 2] * fwd[p.n // 2] % p.q == p.q - 1
    for k in range(0, p.n, 37):
        assert fwd[k] * inv[k] % p.q == 1


def test_stage_twiddles_match_definition():
    p = DILITHIUM_256
    tw = tables.stage_twiddles(p.n, p.omega, p.q)
    n = p.n
    for s in range(1, p.log_n + 1):
        k = n >> s
        omega_s = pow(p.omega, k, p.q)
        for i in range(0, n // 2, 17):
            assert tw[s - 1, i] == pow(omega_s, i // k, p.q)


def test_hex_roundtrip():
    p = DILITHIUM_256
    text = tables.dump_twiddle_hex(p)
    vals = tables.load_hex(text)
    assert vals == tables.psi_powers(p)
    assert len(text.splitlines()[0]) == 6  # 24-bit -> 6 hex digits


def test_hex_digits_width():
    assert tables.hex_digits(24) == 6
    assert tables.hex_digits(23) == 6
    assert tables.hex_digits(60) == 15


@pytest.mark.parametrize(
    "p,fname,inverse", HEX_CASES, ids=[c[1] for c in HEX_CASES]
)
def test_hex_parity_vs_reference_rtl(p, fname, inverse):
    """Bit-exact parity with the shipped BRAM hex images."""
    path = reference_hex_path(fname)
    if path is None:
        pytest.skip(f"reference hex {fname} not mounted")
    with open(path) as f:
        shipped = tables.load_hex(f.read())
    ours = tables.psi_inv_powers(p) if inverse else tables.psi_powers(p)
    assert len(shipped) == p.n
    assert ours == shipped


@pytest.mark.parametrize(
    "p,fname,inverse", HEX_CASES[:2], ids=["fwd_text", "inv_text"]
)
def test_hex_text_parity_exact(p, fname, inverse):
    """Also byte-compare the serialized text (format parity, not just values)."""
    path = reference_hex_path(fname)
    if path is None:
        pytest.skip("reference hex not mounted")
    with open(path) as f:
        shipped = [l.strip() for l in f.read().split() if l.strip()]
    ours = tables.dump_twiddle_hex(p, inverse=inverse).split()
    assert ours == shipped


@pytest.mark.parametrize("inverse", [False, True], ids=["fwd", "inv"])
@pytest.mark.parametrize(
    "p", [DILITHIUM_256, P24_4096, P60_4096], ids=lambda p: p.name
)
def test_device_psi_powers_match_host(p, inverse):
    """On-device generation (ntt_twiddle_table analog) is bit-exact vs the
    host big-int tables for every ring family."""
    from tpu_ntt.modmath import make_ring

    dev = tables.device_psi_powers(p, inverse=inverse)
    got = make_ring(p).decode(dev)
    want = tables.psi_inv_powers(p) if inverse else tables.psi_powers(p)
    assert got == want


def test_device_psi_powers_goldilocks():
    from tpu_ntt.modmath import GOLDILOCKS_Q, make_ring
    from tpu_ntt.params import make_params

    p = make_params(256, GOLDILOCKS_Q)
    got = make_ring(p).decode(tables.device_psi_powers(p))
    assert got == tables.psi_powers(p)
