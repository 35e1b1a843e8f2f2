"""Twiddle-table and hex-vector parity tests (SURVEY.md §4 tier (c)).

BASELINE.json requires the on-host twiddle generator to reproduce the
reference's shipped BRAM images (rtl/twiddle_forward*.hex,
rtl/twiddle_inverse*.hex) bit-exactly.  The hex files are read directly from
the read-only reference mount when present; the serialization tests are
self-contained either way.
"""

import os

import numpy as np
import pytest

from tpu_ntt import tables
from tpu_ntt.params import (DILITHIUM_256, P24_1024, P24_4096, P60_4096,
                            Reduction)

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


# ---------------------------------------------------------------------------
# device_stage_tables: full runtime-(n, q) plan tables built on device
# ---------------------------------------------------------------------------


def _flat(v):
    import jax

    return [np.asarray(x) for x in jax.tree.leaves(v)]


def _tables_equal(a, b):
    fa, fb = _flat(a), _flat(b)
    assert len(fa) == len(fb)
    return all((np.asarray(x) == np.asarray(y)).all() for x, y in zip(fa, fb))


@pytest.mark.parametrize("reduction", list(Reduction))
def test_device_stage_tables_match_host_plan(reduction):
    """Every table NttPlan(device_tables=True) carries is bit-exact vs the
    host big-int build, for each reduction backend's twiddle encoding."""
    from tpu_ntt.ntt import NttPlan
    from tpu_ntt.params import make_params

    p = make_params(512, DILITHIUM_256.q)
    host = NttPlan(p, reduction)
    dev = NttPlan(p, reduction, device_tables=True)
    for name in ("psi_pows", "psi_inv_pows", "n_inv_tw", "psi_inv_n_inv"):
        assert _tables_equal(getattr(host, name), getattr(dev, name)), name
    for name in ("stage_tw", "stage_tw_inv", "merged_tw", "merged_tw_inv",
                 "dif_tw", "dit_tw_inv"):
        hs, ds = getattr(host, name), getattr(dev, name)
        assert len(hs) == len(ds) == p.log_n
        for s in range(p.log_n):
            assert _tables_equal(hs[s], ds[s]), f"{name}[{s}]"


def test_device_shoup32_exact_incl_edges():
    """floor(w * 2^32 / q) on device == host big-int division, including
    w = 0, 1, q-1 and a q close to the 2^30 width cap."""
    import jax.numpy as jnp

    for q in (DILITHIUM_256.q, 786433, (1 << 30) - 35):  # last: 30-bit prime
        ws = [0, 1, 2, q // 3, q // 2, q - 2, q - 1]
        got = tables.device_shoup32(jnp.asarray(ws, dtype=jnp.uint32), q)
        want = [(w << 32) // q for w in ws]
        assert [int(v) for v in np.asarray(got)] == want, q


def test_device_tables_plan_transforms_bit_exact():
    """A device-tables plan produces bit-identical transforms/products to
    the host-tables plan (merged, CG, and no-gather paths)."""
    import random

    from tpu_ntt import ntt
    from tpu_ntt.params import make_params

    rng = random.Random(50)
    p = make_params(256, 786433)  # a NON-preset (n, q): the runtime case
    host = ntt.NttPlan(p)
    dev = ntt.NttPlan(p, device_tables=True)
    a = [rng.randrange(p.q) for _ in range(p.n)]
    b = [rng.randrange(p.q) for _ in range(p.n)]
    a[:3] = [0, 1, p.q - 1]
    ea, eb = host.encode(a), host.encode(b)
    for fn in (ntt.nwc_poly_mult_merged, ntt.nwc_poly_mult,
               ntt.cyclic_poly_mult):
        want = host.decode(fn(host, ea, eb))
        got = dev.decode(fn(dev, ea, eb))
        assert (want == got).all(), fn.__name__
    want = host.decode(ntt.ntt_inv_nogather(host, ntt.ntt_fwd_nogather(host, ea)))
    got = dev.decode(ntt.ntt_inv_nogather(dev, ntt.ntt_fwd_nogather(dev, ea)))
    assert (want == got).all()


def test_device_stage_tables_rejects_wide_modulus():
    from tpu_ntt.params import make_params

    with pytest.raises(ValueError, match="single-word"):
        tables.device_stage_tables(make_params(256, P60_4096.q))
