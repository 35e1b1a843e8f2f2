"""Test harness configuration.

Tests run on the CPU backend with 8 virtual devices so the full suite —
including the mesh-sharded paths — is hardware-independent and deterministic
(mirrors the reference's simulator-based strategy, test/Makefile; the TPU
benchmark harness exercises the same code on real chips).

Must set the env vars before JAX initializes, hence the top-of-file placement.
"""

import os
import sys

# Force CPU even when the ambient environment selects a TPU platform
# (e.g. JAX_PLATFORMS=axon, whose plugin overrides the env var via
# jax.config): the suite needs 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(12345)


REFERENCE_RTL = "/root/reference/rtl"


def reference_hex_path(name: str):
    """Path to a reference twiddle hex file, or None if unavailable."""
    path = os.path.join(REFERENCE_RTL, name)
    return path if os.path.exists(path) else None
