"""Parameter-set and constant-derivation tests.

Oracle tier 1 of SURVEY.md §4: constants must reproduce the reference's
shipped values bit-exactly (scripts/precompute_constants.py outputs,
test/Makefile:268-304 parameter bundles, rtl/ntt_poly_mult.sv:18-24).
"""

import pytest

from tpu_ntt.params import (
    DILITHIUM_256,
    P24_1024,
    P24_4096,
    P60_4096,
    PRESETS,
    NttParams,
    Reduction,
    find_psi,
    make_params,
)


def test_dilithium_constants():
    p = DILITHIUM_256
    assert (p.n, p.q, p.psi) == (256, 8380417, 1239911)
    assert p.psi_inv == 4231948  # new_reference/test constants
    assert p.omega == pow(1239911, 2, 8380417)
    assert p.width == 23
    p.validate_roots()


def test_1024_constants():
    p = P24_1024
    assert (p.n, p.q, p.psi) == (1024, 8380417, 5548360)
    assert p.psi_inv == 2320879
    assert p.n_inv == 8372233
    p.validate_roots()


def test_4096_24bit_constants():
    p = P24_4096
    assert (p.n, p.q, p.psi) == (4096, 8380417, 283817)
    assert p.psi_inv == 7893065
    assert p.n_inv == 8378371
    p.validate_roots()


def test_4096_60bit_constants():
    p = P60_4096
    assert p.q == 1152921504606830593
    assert p.psi == 431606828070683274
    assert p.psi_inv == 164227591873870967
    assert p.n_inv == 1152640029630119941
    assert p.width == 60
    p.validate_roots()


def test_barrett_constants_dilithium():
    # scripts/precompute_constants.py for q=8380417: K=23, mu=8396807
    p = DILITHIUM_256
    assert p.barrett_k == 23
    assert p.barrett_mu == 8396807


def test_montgomery_constants():
    for p in PRESETS.values():
        r = p.mont_r
        assert (p.q * p.mont_q_prime) % r == r - 1
        assert p.mont_r_mod_q == r % p.q
        assert (p.to_mont(1) * pow(r, p.q - 2, p.q)) % p.q == 1


def test_validation_rejects_bad_psi():
    with pytest.raises(ValueError):
        NttParams(n=256, q=8380417, psi=5)


def test_validation_rejects_non_prime():
    with pytest.raises(ValueError):
        NttParams(n=256, q=8380416, psi=3)


def test_validation_rejects_non_power_of_two():
    with pytest.raises(ValueError):
        NttParams(n=255, q=8380417, psi=1239911)


def test_find_psi_reproduces_property():
    # find_psi may return a different primitive root than the shipped one,
    # but it must satisfy the defining property.
    psi = find_psi(256, 8380417)
    assert pow(psi, 256, 8380417) == 8380417 - 1
    p = make_params(512, 8380417)
    p.validate_roots()
