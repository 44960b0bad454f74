"""Persistent XLA compilation cache.

The jitted H=200 solver takes minutes to compile on TPU the first time;
with the cache enabled, later processes (scripts, notebooks, MPC servers)
reload the compiled executable in milliseconds. Opt-in because it writes
to disk.
"""

from __future__ import annotations

import os

import jax

__all__ = ["enable_compilation_cache"]


def enable_compilation_cache(cache_dir=None):
    """Enables JAX's persistent compilation cache.

    Args:
        cache_dir: directory for compiled executables; defaults to
            $PDDP_TPU_CACHE_DIR or ~/.cache/pddp_tpu/xla.

    Returns:
        The cache directory in use.
    """
    if cache_dir is None:
        cache_dir = os.environ.get(
            "PDDP_TPU_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "pddp_tpu",
                         "xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything that takes noticeable time, not only >1 s programs.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    return cache_dir
