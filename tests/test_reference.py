"""Golden-model self-consistency tests (oracle tier 1, SURVEY.md §4).

Mirrors new_reference/test_cg_ntt.py: NTT∘INTT identity, NWC vs O(n^2)
schoolbook, cyclic pipeline vs schoolbook cyclic convolution.
"""

import pytest

from tpu_ntt import reference as ref
from tpu_ntt.params import DILITHIUM_256, P60_4096, make_params

SMALL = make_params(16, 8380417, name="small16")


def rand_poly(rng, p):
    return [rng.randrange(p.q) for _ in range(p.n)]


def test_bit_reverse_permutation_involution():
    perm = ref.bit_reverse_permutation(16)
    assert sorted(perm) == list(range(16))
    assert [perm[perm[i]] for i in range(16)] == list(range(16))
    assert perm[:4] == [0, 8, 4, 12]


@pytest.mark.parametrize("p", [SMALL, DILITHIUM_256], ids=["n16", "dilithium"])
def test_ntt_intt_identity(p, rng):
    x = rand_poly(rng, p)
    assert ref.cg_intt(ref.cg_ntt(x, p.omega, p.q), p.omega, p.q) == x


def test_ntt_impulse_is_all_ones():
    p = SMALL
    x = [1] + [0] * (p.n - 1)
    assert ref.cg_ntt(x, p.omega, p.q) == [1] * p.n


def test_ntt_of_ones_is_scaled_impulse():
    p = SMALL
    out = ref.cg_ntt([1] * p.n, p.omega, p.q)
    assert out[0] == p.n
    assert out[1:] == [0] * (p.n - 1)


@pytest.mark.parametrize("p", [SMALL, DILITHIUM_256], ids=["n16", "dilithium"])
def test_cyclic_poly_mult_vs_schoolbook(p, rng):
    a, b = rand_poly(rng, p), rand_poly(rng, p)
    assert ref.cyclic_poly_mult(a, b, p) == ref.schoolbook_cyclic(a, b, p.q)


@pytest.mark.parametrize("p", [SMALL, DILITHIUM_256], ids=["n16", "dilithium"])
def test_nwc_poly_mult_vs_schoolbook(p, rng):
    a, b = rand_poly(rng, p), rand_poly(rng, p)
    assert ref.nwc_poly_mult(a, b, p) == ref.schoolbook_negacyclic(a, b, p.q)


def test_nwc_basic_x_times_x():
    # (x) * (x) = x^2 mod (x^n + 1)
    p = SMALL
    a = [0, 1] + [0] * (p.n - 2)
    out = ref.nwc_poly_mult(a, a, p)
    expected = [0] * p.n
    expected[2] = 1
    assert out == expected


def test_nwc_wraparound_sign():
    # x^(n-1) * x = x^n = -1 mod (x^n + 1)
    p = SMALL
    a = [0] * p.n
    a[p.n - 1] = 1
    b = [0, 1] + [0] * (p.n - 2)
    out = ref.nwc_poly_mult(a, b, p)
    expected = [p.q - 1] + [0] * (p.n - 1)
    assert out == expected


def test_60bit_small_slice_schoolbook(rng):
    # 60-bit modulus on a small n derived from the same q
    p60 = make_params(16, P60_4096.q, name="p60_small")
    a, b = rand_poly(rng, p60), rand_poly(rng, p60)
    assert ref.nwc_poly_mult(a, b, p60) == ref.schoolbook_negacyclic(a, b, p60.q)
