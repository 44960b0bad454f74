"""End-to-end PDDP *learning* test (round-1 verdict item 5).

The does-it-run PDDP tests (test_pddp.py) never check that the
probabilistic pipeline actually improves anything. This test runs the
full episodic loop on the pendulum at reduced-but-honest sizes and pins
the qualitative learning property: the per-step real-environment cost of
the trained MPC collection trials beats the random-exploration trial.

The quantitative TPU-scale run (P=100, [200,200], reference config) is
recorded in docs/experiments/pendulum_pddp_r2.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pddp_tpu.controllers.pddp import PDDPController
from pddp_tpu.encoding import StateEncoding
from pddp_tpu.examples.pendulum import PendulumCost, PendulumEnv
from pddp_tpu.models.bnn import bnn_dynamics_model_factory

IGN = StateEncoding.IGNORE_UNCERTAINTY


@pytest.mark.slow
def test_pddp_learns_to_beat_random_exploration():
    N = 15
    P = 30
    env = PendulumEnv(dt=0.1, seed=0)
    cost = PendulumCost()
    cls = bnn_dynamics_model_factory(
        2, 1, [64, 64], angular_indices=(0,), non_angular_indices=(1,))
    model = cls.init(jax.random.PRNGKey(0), n_particles=P,
                     horizon=2 * N + 1, dtype=jnp.float64)
    ctrl = PDDPController(env, model, cost,
                          training_opts={"n_iter": 400,
                                         "learning_rate": 1e-3})

    per_step = []  # (kind, J/step) per trial

    def on_trial(trial, X, U):
        J = 0.0
        for i in range(U.shape[0]):
            J += float(cost(X[i], U[i], i, terminal=False, encoding=IGN))
        per_step.append((U.shape[0], J / U.shape[0]))

    U0 = 0.1 * jnp.ones((N, 1), jnp.float64)
    umax = jnp.array([2.5])
    ctrl.fit(U0, encoding=StateEncoding.UPPER_TRIANGULAR_CHOLESKY,
             max_trials=4, n_initial_sample_trajectories=2,
             n_iterations=15, on_trial=on_trial,
             u_min=-umax, u_max=umax)

    assert len(per_step) >= 4
    # Trial 2 is the uniform-random exploration rollout; the rest of the
    # trials run trained MPC. Random swings the pendulum hard for no
    # reason — the trained controller must do better per step.
    random_cost = per_step[1][1]
    mpc_costs = [c for _, c in per_step[2:]]
    assert min(mpc_costs) < random_cost, (per_step,)
    # And the improvement must be substantial, not noise (the TPU-scale
    # run shows 6.5x; demand 1.5x at these sizes).
    assert min(mpc_costs) < random_cost / 1.5, (per_step,)
