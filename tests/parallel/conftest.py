"""Disable the persistent XLA cache for the parallel (shard_map) tests.

Serializing this package's large f64 shard_map executables through the
persistent compilation cache segfaults intermittently inside
jax/zstandard (observed three times in full-suite runs, in
put_executable_and_time and get_executable_and_time during
test_particle_sharded_batched_solve_2d_mesh; single-module runs pass).
The in-memory executable cache is unaffected; these tests simply
recompile per process.

Note: setting jax_compilation_cache_dir=None is NOT enough mid-process —
jax memoizes the cache object globally on first use, so the enable flag
must be flipped and the global reset.
"""

import jax
import pytest
from jax._src import compilation_cache as _cc


@pytest.fixture(autouse=True, scope="package")
def _no_persistent_cache():
    prev = jax.config.jax_enable_compilation_cache
    jax.config.update("jax_enable_compilation_cache", False)
    _cc.reset_cache()
    yield
    jax.config.update("jax_enable_compilation_cache", prev)
    _cc.reset_cache()
