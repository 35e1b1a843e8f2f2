"""Direct tests for the persistent-compilation-cache subsystem (cache.py).

The reference persists its precomputed constants as data files (rtl/*.hex,
SURVEY.md §5 checkpoint/resume); the TPU analog persists compiled XLA
executables, which is load-bearing here: first compiles of the big fused
kernels over the tunneled device take minutes (CLAUDE.md), and the cache
removes that cost across processes.  These tests exercise the real
round-trip — enable, compile, observe an artifact on disk, and verify a
program compiled with the cache enabled still computes correctly.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from tpu_ntt import cache


def test_enable_creates_dir_and_sets_config(tmp_path):
    path = str(tmp_path / "xla_cache")
    got = cache.enable_compilation_cache(path)
    assert got == path
    assert os.path.isdir(path)
    assert jax.config.jax_compilation_cache_dir == path


def test_compiled_artifact_persisted_and_correct(tmp_path):
    path = cache.enable_compilation_cache(str(tmp_path / "xla_cache"))

    @jax.jit
    def f(x):
        # arbitrary nontrivial program (unique constant so the cache entry
        # is fresh for this test run rather than a hit from another test)
        return (x * jnp.uint32(2654435761) + jnp.uint32(12345)) ^ (x >> 7)

    x = jnp.arange(256, dtype=jnp.uint32)
    out = np.asarray(f(x))
    want = (np.arange(256, dtype=np.uint32) * np.uint32(2654435761)
            + np.uint32(12345)) ^ (np.arange(256, dtype=np.uint32) >> 7)
    assert np.array_equal(out, want)
    # the executable must have been written into the cache directory
    entries = [e for e in os.listdir(path) if not e.startswith(".")]
    assert entries, "compilation cache directory is empty after a jit compile"


def test_env_var_default(tmp_path, monkeypatch):
    monkeypatch.setenv("TPU_NTT_CACHE_DIR", str(tmp_path / "from_env"))
    got = cache.enable_compilation_cache()
    assert got == str(tmp_path / "from_env")
    assert os.path.isdir(got)
