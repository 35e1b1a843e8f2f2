"""Merged-twiddle NWC formulation tests (reference semantics:
test/refs/fast_ntt_negacyclic_convolution.py — CT forward NO->BO, GS
inverse BO->NO, psi folded into stage twiddles, no separate twist)."""

import numpy as np
import pytest

import jax

from tpu_ntt import DILITHIUM_256, P24_1024, P60_4096, NttPlan
from tpu_ntt import reference
from tpu_ntt import ntt as N

PARAMS = [DILITHIUM_256, P24_1024, P60_4096]


def enc_batch(plan, polys):
    return plan.encode(np.array(polys, dtype=object))


@pytest.mark.parametrize("p", PARAMS, ids=lambda p: p.name)
def test_merged_fwd_is_bitrev_of_twisted_ntt(p, rng):
    plan = NttPlan(p)
    x = [rng.randrange(p.q) for _ in range(p.n)]
    got = plan.decode(
        jax.jit(lambda v: N.nwc_fwd_merged(plan, v))(enc_batch(plan, [x]))
    )[0]
    twisted = [x[i] * pow(p.psi, i, p.q) % p.q for i in range(p.n)]
    nat = reference.cg_ntt(twisted, p.omega, p.q)
    brv = reference.bit_reverse_permutation(p.n)
    assert [int(got[j]) for j in range(p.n)] == [nat[brv[j]] for j in range(p.n)]


@pytest.mark.parametrize("p", PARAMS, ids=lambda p: p.name)
def test_merged_roundtrip(p, rng):
    plan = NttPlan(p)
    x = [rng.randrange(p.q) for _ in range(p.n)]
    e = enc_batch(plan, [x])
    out = jax.jit(
        lambda v: N.nwc_inv_merged(plan, N.nwc_fwd_merged(plan, v))
    )(e)
    assert [int(v) for v in plan.decode(out)[0]] == x


@pytest.mark.parametrize("p", PARAMS, ids=lambda p: p.name)
def test_merged_poly_mult_matches_golden(p, rng):
    plan = NttPlan(p)
    a = [rng.randrange(p.q) for _ in range(p.n)]
    b = [rng.randrange(p.q) for _ in range(p.n)]
    got = plan.decode(
        jax.jit(lambda u, v: N.nwc_poly_mult_merged(plan, u, v))(
            enc_batch(plan, [a]), enc_batch(plan, [b])
        )
    )[0]
    want = reference.nwc_poly_mult(a, b, p)
    assert [int(v) for v in got] == want


def test_merged_matches_unmerged_batched(rng):
    p = DILITHIUM_256
    plan = NttPlan(p)
    polys = [[rng.randrange(p.q) for _ in range(p.n)] for _ in range(6)]
    a, b = enc_batch(plan, polys[:3]), enc_batch(plan, polys[3:])
    m = plan.decode(jax.jit(lambda u, v: N.nwc_poly_mult_merged(plan, u, v))(a, b))
    u = plan.decode(jax.jit(lambda u, v: N.nwc_poly_mult(plan, u, v))(a, b))
    assert m.tolist() == u.tolist()


def test_merged_textbook_example():
    """Small hand-checkable case: (1 + x)^2 = 1 + 2x + x^2 mod (x^n+1)."""
    p = DILITHIUM_256
    plan = NttPlan(p)
    a = [1, 1] + [0] * (p.n - 2)
    got = plan.decode(
        jax.jit(lambda u, v: N.nwc_poly_mult_merged(plan, u, v))(
            enc_batch(plan, [a]), enc_batch(plan, [a])
        )
    )[0]
    want = [1, 2, 1] + [0] * (p.n - 3)
    assert [int(v) for v in got] == want


def test_negacyclic_wraparound_sign():
    """x^(n-1) * x = x^n = -1 mod (x^n + 1)."""
    p = DILITHIUM_256
    plan = NttPlan(p)
    a = [0] * p.n
    a[p.n - 1] = 1
    b = [0, 1] + [0] * (p.n - 2)
    got = plan.decode(
        jax.jit(lambda u, v: N.nwc_poly_mult_merged(plan, u, v))(
            enc_batch(plan, [a]), enc_batch(plan, [b])
        )
    )[0]
    want = [p.q - 1] + [0] * (p.n - 1)
    assert [int(v) for v in got] == want


def test_60bit_n8192_beyond_reference(rng):
    """The shipped 60-bit modulus has 2-adicity 14, so n = 8192 — twice the
    reference's largest size — is supported; checked vs the native oracle."""
    from tpu_ntt import native
    from tpu_ntt.params import make_params

    if not native.available():
        pytest.skip("native oracle unavailable")
    p = make_params(8192, P60_4096.q)
    plan = NttPlan(p)
    a = [rng.randrange(p.q) for _ in range(p.n)]
    b = [rng.randrange(p.q) for _ in range(p.n)]
    got = plan.decode(
        jax.jit(lambda x, y: N.nwc_poly_mult_merged(plan, x, y))(
            enc_batch(plan, [a]), enc_batch(plan, [b])
        )
    )[0]
    want = native.nwc_fast(a, b, p.q, p.psi)
    assert [int(v) for v in got] == want
