"""Scale-out demo: batches of independent solves over a device mesh.

The reference is strictly single-device (SURVEY §0); this script shows the
TPU-native scaling axis that replaces it (P5 in SURVEY §2.4): the entire
solver is a pure function, so

 * a batch of B problem instances vmaps into ONE program;
 * the batch shards over every available chip with `jax.sharding.Mesh`
   (no collectives — embarrassingly parallel SPMD);
 * memory-heavy models (the 100-particle BNN) run the batch in fixed-size
   chunks of one compiled program (`chunk=`).

On a single chip the mesh is size 1 and everything still works; to see an
8-way virtual CPU mesh run

    PDDP_FORCE_CPU=1 XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/parallel_solves.py

(the axon TPU tunnel overrides JAX_PLATFORMS, so utils.py forces the CPU
platform in-process when PDDP_FORCE_CPU is set).

Usage:
    python examples/parallel_solves.py [batch] [horizon]
"""

from __future__ import annotations

import os as _os
import sys as _sys

_here = _os.path.dirname(_os.path.abspath(__file__))
for _p in (_here, _os.path.dirname(_here)):  # examples dir + repo root
    if _p not in _sys.path:
        _sys.path.insert(0, _p)


import sys
import time

import jax
import jax.numpy as jnp

from pddp_tpu.controllers.ilqr import ILQROptions
from pddp_tpu.encoding import StateEncoding
from pddp_tpu.examples.cartpole import CartpoleCost, CartpoleDynamicsModel
from pddp_tpu.parallel import batched_solve, make_mesh

import utils  # noqa: F401  (PDDP_FORCE_CPU handling + compile cache)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
H = int(sys.argv[2]) if len(sys.argv) > 2 else 100
ENCODING = StateEncoding.IGNORE_UNCERTAINTY


def main():
    model = CartpoleDynamicsModel(dt=0.05)
    cost = CartpoleCost()
    opts = ILQROptions(n_iterations=10, max_evals=30, scan_unroll=4)

    # B problem instances: perturbed initial states around hanging rest.
    key = jax.random.PRNGKey(0)
    z0s = 0.05 * jax.random.normal(key, (B, 4))
    U0s = 0.1 * jnp.ones((B, H, 1))

    mesh = make_mesh()
    n_dev = len(jax.devices())
    print(f"{B} cartpole solves (H={H}) over a {n_dev}-device mesh "
          f"[{jax.default_backend()}]")

    # Warm-up (compile), then timed run.
    r = batched_solve(model, cost, z0s, U0s, opts, encoding=ENCODING,
                      mesh=mesh)
    jax.block_until_ready(r.J_opt)
    t0 = time.perf_counter()
    r = batched_solve(model, cost, z0s, U0s, opts, encoding=ENCODING,
                      mesh=mesh)
    jax.block_until_ready(r.J_opt)
    dt = time.perf_counter() - t0

    J = jax.device_get(r.J_opt)
    print(f"  sharded: {dt * 1e3:8.1f} ms  ({B / dt:9.0f} solves/s)  "
          f"J mean {J.mean():.2f}  all finite: {bool(jnp.isfinite(r.J_opt).all())}")

    # Chunked variant: same results, bounded peak memory. The chunk must
    # divide the batch and the mesh size must divide the chunk; fall back
    # to the whole batch when no such chunk exists.
    chunk = B
    for c in range(max(n_dev, B // 4), B):
        if B % c == 0 and c % n_dev == 0:
            chunk = c
            break
    r_c = batched_solve(model, cost, z0s, U0s, opts, encoding=ENCODING,
                        mesh=mesh, chunk=chunk)
    jax.block_until_ready(r_c.J_opt)
    t0 = time.perf_counter()
    r_c = batched_solve(model, cost, z0s, U0s, opts, encoding=ENCODING,
                        mesh=mesh, chunk=chunk)
    jax.block_until_ready(r_c.J_opt)
    dt_c = time.perf_counter() - t0
    print(f"  chunked ({chunk}): {dt_c * 1e3:8.1f} ms  "
          f"({B / dt_c:9.0f} solves/s)  max |dJ| vs full: "
          f"{float(jnp.abs(r_c.J_opt - r.J_opt).max()):.2e}")

    particle_sharded_demo(n_dev)


def particle_sharded_demo(n_dev):
    """The model-parallel axis: ONE probabilistic solve with its
    MC-dropout ensemble sharded over the mesh (moment-matching psums ride
    ICI). Scales the *fidelity* of a solve, not the number of solves."""
    from pddp_tpu.encoding import encode
    from pddp_tpu.models.bnn import bnn_dynamics_model_factory
    from pddp_tpu.parallel import particle_sharded_solve

    enc = StateEncoding.UPPER_TRIANGULAR_CHOLESKY
    # Production shapes on TPU; tiny on CPU (smoke tests, virtual meshes —
    # the full-size solve takes minutes to compile there).
    on_tpu = jax.default_backend() == "tpu"
    Hp = 25 if on_tpu else 4
    particles = (128 if on_tpu else 2) * n_dev
    hidden = [200, 200] if on_tpu else [16, 16]
    cls = bnn_dynamics_model_factory(4, 1, hidden, angular_indices=(2,),
                                     non_angular_indices=(0, 1, 3))
    model = cls.init(jax.random.PRNGKey(0), n_particles=particles,
                     horizon=Hp + 1)
    cost = CartpoleCost()
    z0 = encode(jnp.zeros(4), V=1e-2 * jnp.ones(4), encoding=enc)
    U0 = 0.1 * jnp.ones((Hp, 1))
    opts = ILQROptions(n_iterations=5 if on_tpu else 1,
                       max_evals=15 if on_tpu else 3)

    mesh = make_mesh("pp")
    r = particle_sharded_solve(model, cost, z0, U0, opts, encoding=enc,
                               mesh=mesh)
    jax.block_until_ready(r.J_opt)
    t0 = time.perf_counter()
    r = particle_sharded_solve(model, cost, z0, U0, opts, encoding=enc,
                               mesh=mesh)
    jax.block_until_ready(r.J_opt)
    dt = time.perf_counter() - t0
    print(f"  particle-sharded PDDP solve ({particles} particles over "
          f"{n_dev} devices, H={Hp}): {dt * 1e3:8.1f} ms  "
          f"J {float(r.J_opt):.2f}")


if __name__ == "__main__":
    main()
