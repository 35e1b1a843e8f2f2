"""Coset low-degree extension (tpu_ntt/stark.py) vs direct big-int
evaluation at every coset point — the STARK prover's dominant op over
the rings the framework supports, including Goldilocks."""

import random

import numpy as np
import pytest

from tpu_ntt.modmath import GOLDILOCKS_Q
from tpu_ntt.stark import LdePlan

CASES = [
    (64, 8380417, 4),          # reference 24-bit modulus
    (64, GOLDILOCKS_Q, 4),     # the STARK field (64-bit)
    (32, 1152921504606830593, 8),  # 60-bit, blowup 8
]


def _oracle(coeffs, q, N, shift, omega):
    out = []
    for j in range(N):
        x = shift * pow(omega, j, q) % q
        acc, xp = 0, 1
        for c in coeffs:
            acc = (acc + c * xp) % q
            xp = xp * x % q
        out.append(acc)
    return out


@pytest.mark.parametrize("n,q,blowup", CASES)
@pytest.mark.parametrize("order", ["bitrev", "natural"])
def test_lde_matches_pointwise_evaluation(n, q, blowup, order,
                                          rng=random.Random(80)):
    plan = LdePlan(n, q, blowup, order=order)
    coeffs = [rng.randrange(q) for _ in range(n)]
    coeffs[:2] = [0, q - 1]  # boundary coefficients
    evals = plan.decode(plan.extend(plan.encode([coeffs])))[0]
    want = _oracle(coeffs, q, plan.N, plan.shift, plan.big.p.omega)
    idx = plan.spectrum_indices()
    got = [int(evals[t]) for t in range(plan.N)]
    assert got == [want[idx[t]] for t in range(plan.N)]


def test_lde_batched_matches_rowwise(rng=random.Random(81)):
    n, q, blowup = 32, 8380417, 4
    plan = LdePlan(n, q, blowup)
    rows = [[rng.randrange(q) for _ in range(n)] for _ in range(3)]
    batched = plan.decode(plan.extend(plan.encode(rows)))
    for row, brow in zip(rows, batched):
        single = plan.decode(plan.extend(plan.encode([row])))[0]
        assert [int(v) for v in brow] == [int(v) for v in single]


def test_lde_guards():
    with pytest.raises(ValueError, match="power of two"):
        LdePlan(64, 8380417, 3)
    with pytest.raises(ValueError, match="order"):
        LdePlan(64, 8380417, 4, order="x")
    with pytest.raises(ValueError, match="unit"):
        LdePlan(64, 8380417, 4, shift=8380417)


def test_blowup_one_is_plain_cyclic_ntt(rng=random.Random(82)):
    """blowup=1, shift=1, natural order degenerates to the cyclic NTT."""
    from tpu_ntt import ntt
    from tpu_ntt.ntt import NttPlan
    from tpu_ntt.params import make_params

    n, q = 64, 8380417
    plan = LdePlan(n, q, 1, shift=1, order="natural")
    base = NttPlan(make_params(n, q))
    coeffs = [[rng.randrange(q) for _ in range(n)]]
    got = plan.decode(plan.extend(plan.encode(coeffs)))
    want = base.decode(ntt.ntt_fwd(base, base.encode(np.array(coeffs,
                                                              dtype=object))))
    assert [int(v) for v in got[0]] == [int(v) for v in want[0]]


@pytest.mark.parametrize("n,q,blowup", [
    (64, 8380417, 4),       # pallas-mxu band
    (64, GOLDILOCKS_Q, 4),  # pallas-gl64 (the STARK field)
])
def test_lde_kernel_order(n, q, blowup, rng=random.Random(83)):
    """order='kernel' routes the big transform through the fused cyclic
    forward (four-step output layout, exposed via spectrum_indices)."""
    plan = LdePlan(n, q, blowup, order="kernel")
    coeffs = [rng.randrange(q) for _ in range(n)]
    evals = plan.decode(plan.extend(plan.encode([coeffs])))[0]
    want = _oracle(coeffs, q, plan.N, plan.shift, plan.big.p.omega)
    idx = plan.spectrum_indices()
    assert [int(evals[t]) for t in range(plan.N)] == \
        [want[idx[t]] for t in range(plan.N)]


def test_lde_kernel_order_rejected_without_kernel():
    with pytest.raises(ValueError, match="kernel"):
        # 30-bit band routes to XLA (no fused kernel)
        LdePlan(64, 536608769, 4, order="kernel")


@pytest.mark.parametrize("order", ["bitrev", "natural", "kernel"])
def test_interpolate_roundtrip(order, rng=random.Random(84)):
    n, q, blowup = 64, 8380417, 4
    plan = LdePlan(n, q, blowup, order=order)
    coeffs = [rng.randrange(q) for _ in range(n)]
    back = plan.decode(plan.interpolate(plan.extend(plan.encode([coeffs]))))
    assert [int(v) for v in back[0]] == coeffs + [0] * (plan.N - n)


def test_interpolate_roundtrip_goldilocks(rng=random.Random(85)):
    plan = LdePlan(64, GOLDILOCKS_Q, 4, order="kernel")
    coeffs = [rng.randrange(GOLDILOCKS_Q) for _ in range(64)]
    back = plan.decode(plan.interpolate(plan.extend(plan.encode([coeffs]))))
    assert [int(v) for v in back[0]] == coeffs + [0] * (plan.N - 64)
