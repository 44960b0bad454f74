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
from pddp_tpu.encoding import StateEncoding, encode
from pddp_tpu.examples.cartpole import CartpoleCost, CartpoleDynamicsModel
from pddp_tpu.examples.double_cartpole import (DoubleCartpoleCost,
                                               DoubleCartpoleDynamicsModel)
from pddp_tpu.examples.pendulum import PendulumCost, PendulumDynamicsModel
from pddp_tpu.examples.rendezvous import (RendezvousCost,
                                          RendezvousDynamicsModel)

IGN = StateEncoding.IGNORE_UNCERTAINTY
CHOL = StateEncoding.UPPER_TRIANGULAR_CHOLESKY

CASES = [
    ("pendulum", PendulumDynamicsModel(dt=0.1), PendulumCost(),
     [0.0, 0.0], 50, 50, IGN, 1),
    ("cartpole", CartpoleDynamicsModel(dt=0.05), CartpoleCost(),
     [0.0, 0.0, 0.1, 0.0], 60, 40, IGN, 1),
    ("double_cartpole", DoubleCartpoleDynamicsModel(dt=0.05),
     DoubleCartpoleCost(), [0.0, 0.0, 0.05, 0.0, -0.05, 0.0], 40, 25,
     IGN, 1),
    ("rendezvous", RendezvousDynamicsModel(dt=0.1), RendezvousCost(),
     [-10.0, -10.0, 10.0, 10.0, 0.0, -5.0, 5.0, 0.0], 40, 25, IGN, 4),
    # Belief-space solve: derivatives flow through mean AND covariance.
    ("pendulum_chol", PendulumDynamicsModel(dt=0.1), PendulumCost(),
     [0.0, 0.0], 30, 25, CHOL, 1),
]


def main():
    runs = {}
    for name, model, cost, x0, N, iters, enc, nu in CASES:
        x0 = jnp.asarray(x0, jnp.float64)
        if enc == IGN:
            z0 = x0
        else:
            z0 = encode(x0, C=1e-2 * jnp.eye(x0.shape[0], dtype=jnp.float64),
                        encoding=enc)
        U0 = 0.1 * jax.random.normal(jax.random.PRNGKey(42),
                                     (N, nu)).astype(jnp.float64)
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
