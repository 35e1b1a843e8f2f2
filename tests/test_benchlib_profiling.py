"""benchlib / profiling smoke tests (CPU; same code runs on TPU)."""

import numpy as np

import jax.numpy as jnp

from tpu_ntt import DILITHIUM_256
from tpu_ntt.benchlib import device_seconds_per_iter, throughput
from tpu_ntt.profiling import op_counts, phase_report


def test_device_seconds_positive_and_sane():
    x = jnp.ones((64, 256), jnp.uint32)
    dt = device_seconds_per_iter(lambda v: v + jnp.uint32(1), x, iters=(2, 10))
    assert 0 < dt < 1.0


def test_throughput_scales_with_batch():
    x = jnp.ones((8, 128), jnp.uint32)
    r = throughput(lambda v: v * jnp.uint32(3), x, batch=8, iters=(2, 10))
    assert r > 0


def test_op_counts_match_reference_table():
    # N=4096: 3 transforms x 2048*12 butterflies + 4096 pointwise + 4096
    # scale = 81,920 modmuls (SURVEY.md §6 speed-of-light accounting).
    from tpu_ntt import P24_4096

    c = op_counts(P24_4096)
    assert c.butterflies_per_transform == 2048 * 12
    assert c.total_butterflies == 3 * 2048 * 12
    assert c.total_modmuls == 3 * 2048 * 12 + 4096 + 4096


def test_phase_report_smoke():
    rep = phase_report(DILITHIUM_256, batch=16, iters=(1, 3))
    for key in ("fwd", "pointwise", "inv", "total",
                "poly_mults_per_sec", "butterflies_per_sec"):
        assert key in rep and rep[key] > 0


def test_kernel_phase_report_smoke():
    """Kernel-path phase report runs (interpret mode on CPU) and derives
    consistent non-negative phases."""
    from tpu_ntt import DILITHIUM_256
    from tpu_ntt import profiling

    rep = profiling.kernel_phase_report(DILITHIUM_256, batch=2, iters=(1, 2))
    assert rep["impl"] == "pallas-mxu"
    for key in ("fwd", "inv", "cached", "total", "pointwise_derived"):
        assert rep[key] >= 0
    assert rep["poly_mults_per_sec"] > 0


def test_binary_swap_chain_timer():
    """The hoist-proof binary timer runs the swap-chain body and returns a
    sane positive slope (semantics: each iteration advances (a, b) ->
    (b, fn(a, b)), so no operand is loop-invariant)."""
    from tpu_ntt.benchlib import device_seconds_per_iter_binary

    a = jnp.ones((8, 128), jnp.uint32)
    b = jnp.full((8, 128), 2, jnp.uint32)
    dt = device_seconds_per_iter_binary(
        lambda x, y: (x + y) % jnp.uint32(97), a, b, iters=(2, 10)
    )
    assert 0 < dt < 1.0
