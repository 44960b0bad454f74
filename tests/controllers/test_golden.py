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
from pddp_tpu.encoding import StateEncoding
from pddp_tpu.examples.cartpole import CartpoleCost, CartpoleDynamicsModel
from pddp_tpu.examples.pendulum import PendulumCost, PendulumDynamicsModel

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "golden",
                      "solver_trajectories.npz")

CASES = {
    "pendulum": (PendulumDynamicsModel(dt=0.1), PendulumCost(),
                 [0.0, 0.0], 50, 50),
    "cartpole": (CartpoleDynamicsModel(dt=0.05), CartpoleCost(),
                 [0.0, 0.0, 0.1, 0.0], 60, 40),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_solver_matches_golden(name):
    model, cost, x0, N, iters = CASES[name]
    enc = StateEncoding.IGNORE_UNCERTAINTY
    z0 = jnp.asarray(x0, jnp.float64)
    U0 = 0.1 * jax.random.normal(jax.random.PRNGKey(42),
                                 (N, 1)).astype(jnp.float64)
    r = solve(model, cost, z0, U0, ILQROptions(n_iterations=iters),
              encoding=enc)

    g = np.load(GOLDEN)
    np.testing.assert_allclose(float(r.J_opt), g[name + "_J"], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(r.Z), g[name + "_Z"], rtol=1e-5,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(r.U), g[name + "_U"], rtol=1e-5,
                               atol=1e-7)
