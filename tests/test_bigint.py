"""Big-integer multiplication on the NTT path (tpu_ntt/bigint.py):
exact products vs Python's own big-int arithmetic — the ultimate
oracle — across sizes, batches, and boundary operands."""

import random

import pytest

from tpu_ntt import bigint


@pytest.mark.parametrize("bits", [1, 16, 17, 1000, 4096, 30000])
def test_one_shot_random(bits, rng=random.Random(60)):
    x = rng.getrandbits(bits)
    y = rng.getrandbits(bits)
    assert bigint.mul(x, y) == x * y


def test_boundary_operands():
    big = (1 << 8192) - 1  # all-ones
    assert bigint.mul(0, big) == 0
    assert bigint.mul(1, big) == big
    assert bigint.mul(big, big) == big * big
    assert bigint.mul(1 << 8191, 2) == 1 << 8192


def test_batched_plan_reuse(rng=random.Random(61)):
    plan = bigint.BigMulPlan(20000)
    xs = [rng.getrandbits(20000) for _ in range(4)]
    ys = [rng.getrandbits(rng.randrange(1, 20001)) for _ in range(4)]
    assert plan.mul_many(xs, ys) == [a * b for a, b in zip(xs, ys)]
    # reuse: second call, fresh operands
    assert plan.mul(xs[0], 3) == xs[0] * 3


def test_plan_guards():
    plan = bigint.BigMulPlan(100)
    with pytest.raises(ValueError, match="bits"):
        plan.mul(1 << 200, 1)
    with pytest.raises(ValueError, match="nonnegative"):
        plan.mul(-1, 1)
    with pytest.raises(ValueError, match="equal length"):
        plan.mul_many([1, 2], [3])


def test_wider_prime_fallback(rng=random.Random(62)):
    """Explicit 30-bit basis exercises the widened-prime path."""
    x, y = rng.getrandbits(5000), rng.getrandbits(5000)
    assert bigint.mul(x, y, prime_width=30) == x * y
