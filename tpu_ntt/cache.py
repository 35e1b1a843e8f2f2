"""Compile-artifact persistence.

The reference's only persisted artifacts are precomputed constants as data
(rtl/*.hex; SURVEY.md §5 checkpoint/resume).  The TPU equivalents are
(a) the twiddle hex dump/load in tables.py and (b) XLA's persistent
compilation cache, enabled here: first-compile of the large fused pipelines
can take minutes on a tunneled device, and the cache removes that cost
across processes.
"""

from __future__ import annotations

import os

import jax


def enable_compilation_cache(path: str | None = None) -> str:
    """Enable JAX's persistent compilation cache (idempotent).

    Default location: $TPU_NTT_CACHE_DIR or ~/.cache/tpu_ntt_xla.
    Returns the cache directory.
    """
    path = path or os.environ.get(
        "TPU_NTT_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "tpu_ntt_xla"),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything, including fast-compiling programs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
