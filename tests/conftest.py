"""Test configuration.

Tests run on CPU with 8 virtual devices (so multi-chip sharding paths are
exercised without TPU hardware) and float64 enabled (so finite-difference
gradient checks are meaningful, mirroring the reference's
torch.autograd.gradcheck strategy).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU tunnel overrides JAX_PLATFORMS from the environment; the
# config update below wins regardless.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: the suite is compile-dominated (tiny
# numerics, many jitted programs); repeat runs reload executables instead
# of recompiling.
from pddp_tpu.utils.compilation_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
