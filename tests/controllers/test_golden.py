"""Golden-trajectory regression tests.

Deterministic f64 solves (fixed z0, fixed seed, no env noise) pinned
against stored trajectories (tests/golden/solver_trajectories.npz) — the
cross-refactor safety net the reference approximates with its benchmark
suite (SURVEY §4.7). Regenerate the goldens ONLY for intentional
algorithmic changes:

    python tests/golden/regenerate.py
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pddp_tpu.controllers.ilqr import ILQROptions, solve
from pddp_tpu.encoding import StateEncoding, encode
from pddp_tpu.examples.cartpole import CartpoleCost, CartpoleDynamicsModel
from pddp_tpu.examples.double_cartpole import (DoubleCartpoleCost,
                                               DoubleCartpoleDynamicsModel)
from pddp_tpu.examples.pendulum import PendulumCost, PendulumDynamicsModel
from pddp_tpu.examples.rendezvous import (RendezvousCost,
                                          RendezvousDynamicsModel)

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "golden",
                      "solver_trajectories.npz")

IGN = StateEncoding.IGNORE_UNCERTAINTY
CHOL = StateEncoding.UPPER_TRIANGULAR_CHOLESKY

CASES = {
    "pendulum": (PendulumDynamicsModel(dt=0.1), PendulumCost(),
                 [0.0, 0.0], 50, 50, IGN, 1),
    "cartpole": (CartpoleDynamicsModel(dt=0.05), CartpoleCost(),
                 [0.0, 0.0, 0.1, 0.0], 60, 40, IGN, 1),
    "double_cartpole": (DoubleCartpoleDynamicsModel(dt=0.05),
                        DoubleCartpoleCost(),
                        [0.0, 0.0, 0.05, 0.0, -0.05, 0.0], 40, 25, IGN, 1),
    "rendezvous": (RendezvousDynamicsModel(dt=0.1), RendezvousCost(),
                   [-10.0, -10.0, 10.0, 10.0, 0.0, -5.0, 5.0, 0.0], 40, 25,
                   IGN, 4),
    "pendulum_chol": (PendulumDynamicsModel(dt=0.1), PendulumCost(),
                      [0.0, 0.0], 30, 25, CHOL, 1),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_solver_matches_golden(name):
    model, cost, x0, N, iters, enc, nu = CASES[name]
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

    g = np.load(GOLDEN)
    np.testing.assert_allclose(float(r.J_opt), g[name + "_J"], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(r.Z), g[name + "_Z"], rtol=1e-5,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(r.U), g[name + "_U"], rtol=1e-5,
                               atol=1e-7)
