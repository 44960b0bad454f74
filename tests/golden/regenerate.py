"""Regenerates the golden solver trajectories.

Run from the repo root after an INTENTIONAL algorithmic change:

    python tests/golden/regenerate.py

Keep the configs in sync with tests/controllers/test_golden.py.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from pddp_tpu.controllers.ilqr import ILQROptions, solve
from pddp_tpu.encoding import StateEncoding
from pddp_tpu.examples.cartpole import CartpoleCost, CartpoleDynamicsModel
from pddp_tpu.examples.pendulum import PendulumCost, PendulumDynamicsModel


def main():
    runs = {}
    for name, model, cost, x0, N, iters in [
        ("pendulum", PendulumDynamicsModel(dt=0.1), PendulumCost(),
         [0.0, 0.0], 50, 50),
        ("cartpole", CartpoleDynamicsModel(dt=0.05), CartpoleCost(),
         [0.0, 0.0, 0.1, 0.0], 60, 40),
    ]:
        enc = StateEncoding.IGNORE_UNCERTAINTY
        z0 = jnp.asarray(x0, jnp.float64)
        U0 = 0.1 * jax.random.normal(jax.random.PRNGKey(42),
                                     (N, 1)).astype(jnp.float64)
        r = solve(model, cost, z0, U0, ILQROptions(n_iterations=iters),
                  encoding=enc)
        runs[name + "_Z"] = np.asarray(r.Z)
        runs[name + "_U"] = np.asarray(r.U)
        runs[name + "_J"] = np.asarray(r.J_opt)
        print(name, "J =", float(r.J_opt), "iters =", int(r.iterations))

    out = os.path.join(os.path.dirname(__file__),
                       "solver_trajectories.npz")
    np.savez(out, **runs)
    print("wrote", out)


if __name__ == "__main__":
    main()
