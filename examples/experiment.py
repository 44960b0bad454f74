"""Problem-switchable PDDP experiment.

Parity: /root/reference/examples/experiment.py:24-208 — runs the full PDDP
algorithm (episodic data collection + BNN training + trajectory
optimization + MPC) on any problem in the SampleProblems registry, with
loss/path plots per trial and a final policy execution.

Usage:
    python examples/experiment.py [cartpole|pendulum|double_cartpole|rendezvous]
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
import matplotlib.pyplot as plt

from pddp_tpu.controllers import PDDPController
from pddp_tpu.encoding import StateEncoding
from pddp_tpu.examples.problems import SampleProblems
from pddp_tpu.models.bnn import bnn_dynamics_model_factory

from utils import finish_figure, plot_path, rollout

N = 25            # Horizon length.
DT = 0.1          # Time step (s).
PLOT = True
ENCODING = StateEncoding.DEFAULT
MAX_TRIALS = 5
HIDDEN = [200, 200]
N_PARTICLES = 100
TRAIN_N_ITER = 500
SEED = 0

# Action bounds per problem (reference experiment.py:24-30).
UMAX = {
    SampleProblems.CARTPOLE: 10.0,
    SampleProblems.DOUBLE_CARTPOLE: 20.0,
    SampleProblems.PENDULUM: 2.5,
    SampleProblems.RENDEZVOUS: 10.0,
}


def run(problem: SampleProblems, max_trials=MAX_TRIALS, n_iterations=50,
        quiet=False):
    env, cost, _ = problem.setup(DT, seed=SEED)
    model_class = problem.get_model_class()
    real_model = model_class(dt=DT)

    umax = UMAX[problem] * jnp.ones(env.action_size)
    umin = -umax

    factory = bnn_dynamics_model_factory(
        env.state_size, env.action_size, HIDDEN,
        model_class.angular_indices, model_class.non_angular_indices)
    model = factory.init(jax.random.PRNGKey(SEED), n_particles=N_PARTICLES,
                         horizon=2 * N + 1)

    controller = PDDPController(
        env, model, cost,
        model_opts={},
        training_opts={"n_iter": TRAIN_N_ITER, "learning_rate": 1e-3},
        seed=SEED)

    J_hist = []
    trial_costs = []  # real-environment cost of each collected trajectory
    t0 = time.time()

    def on_iteration(iteration, state, Z, U, J_opt):
        J_hist.append(float(J_opt))
        if not quiet and (iteration % 10 == 9 or iteration == 0):
            print("  iter {:3d}  J = {:.4f}  state = {}".format(
                iteration + 1, float(J_opt), state.name))

    def _trial_cost(X, U):
        """Cost of a collected (real-env) trajectory, evaluated on the
        raw states with IGNORE_UNCERTAINTY — the learning-progress metric
        (falling trial cost = the BNN + planner are actually working)."""
        IGN = StateEncoding.IGNORE_UNCERTAINTY
        J = 0.0
        for i in range(U.shape[0]):
            J += float(cost(X[i], U[i], i, terminal=False, encoding=IGN))
        return J

    def on_trial(trial, X, U):
        Jt = _trial_cost(X, U)
        trial_costs.append((X.shape[0], Jt))
        if not quiet:
            print("trial {}  collected {} transitions  env cost {:.2f}  "
                  "({:.1f}s)".format(trial + 1, X.shape[0], Jt,
                                     time.time() - t0))
        if PLOT:
            plt.figure(figsize=(10, 4))
            plt.title("{} trial {}".format(problem.name.lower(), trial + 1))
            plot_path(X, encoding=StateEncoding.IGNORE_UNCERTAINTY,
                      horizon=X.shape[0] - 1)
            finish_figure(
                "/tmp/{}_trial{}.png".format(problem.name.lower(), trial + 1),
                show=False)
            plt.close()

    key = jax.random.PRNGKey(SEED + 1)
    U0 = (umax - umin) * jax.random.uniform(
        key, (N, env.action_size)) + umin

    controller.train()
    Z, U, state = controller.fit(
        U0, encoding=ENCODING, n_iterations=n_iterations,
        on_iteration=on_iteration, on_trial=on_trial, max_trials=max_trials,
        u_min=umin, u_max=umax)

    if PLOT:
        plt.figure(figsize=(8, 4))
        plt.plot(J_hist)
        plt.xlabel("Iteration")
        plt.ylabel("Total loss")
        plt.title("{} loss path".format(problem.name.lower()))
        finish_figure("/tmp/{}_loss.png".format(problem.name.lower()),
                      show=False)
        plt.close()

        plt.figure(figsize=(10, 4))
        real_Z = rollout(real_model, Z[0], U, ENCODING)
        plot_path(Z, encoding=ENCODING, reality=real_Z, horizon=N)
        plt.title("{} optimized path (dashed = ground truth)".format(
            problem.name.lower()))
        finish_figure("/tmp/{}_path.png".format(problem.name.lower()),
                      show=False)
        plt.close()

    # Final policy execution on the real environment
    # (reference experiment.py:195-205).
    env.reset()
    J_real = 0.0
    for i in range(N):
        z = env.get_state().encode(ENCODING)
        u = controller(z, i, ENCODING)
        J_real += float(cost(z, u, i, terminal=False, encoding=ENCODING))
        env.apply(u)
    z = env.get_state().encode(ENCODING)
    J_real += float(cost(z, None, N, terminal=True, encoding=ENCODING))
    print("final policy execution cost: {:.4f}".format(J_real))

    if not quiet and trial_costs:
        print("per-trial env costs (len, J):", trial_costs)

    env.close()
    return Z, U, state, J_hist, trial_costs


if __name__ == "__main__":
    name = sys.argv[1].upper() if len(sys.argv) > 1 else "CARTPOLE"
    if name not in SampleProblems.__members__:
        raise SystemExit("Unknown problem {!r}; choose from: {}".format(
            sys.argv[1], ", ".join(m.lower() for m in
                                   SampleProblems.__members__)))
    run(SampleProblems[name])
