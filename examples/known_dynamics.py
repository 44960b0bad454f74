"""Known-dynamics iLQR on the whole problem suite.

Covers the role of the reference's notebooks
(/root/reference/notebooks/known_dynamics/*.ipynb — "simply solving the
iLQR problem without any training", notebooks/README.rst:8-10): solves
each sample problem with its exact analytic model and plots the loss path
and optimized trajectories.

Usage:
    python examples/known_dynamics.py [problem] [n_iterations]
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

from pddp_tpu.controllers import iLQRController
from pddp_tpu.encoding import StateEncoding
from pddp_tpu.examples.problems import SampleProblems

from utils import finish_figure, plot_path

DT = 0.05
N = 100
ENCODING = StateEncoding.IGNORE_UNCERTAINTY
UMAX = {
    SampleProblems.CARTPOLE: 10.0,
    SampleProblems.DOUBLE_CARTPOLE: 30.0,
    SampleProblems.PENDULUM: 5.0,
    SampleProblems.RENDEZVOUS: 10.0,
}


def run(problem: SampleProblems, n_iterations=100):
    env, cost, model = problem.setup(DT, seed=0)
    umax = UMAX[problem] * jnp.ones(env.action_size)

    # The fused Pallas line search compiles on TPU only; elsewhere it runs
    # interpreted (slow), so enable it by backend. (No scan_unroll here:
    # these solves are action-bounded, and unrolling the boxqp-constrained
    # backward multiplies an already-large program.)
    on_tpu = jax.default_backend() == "tpu"
    controller = iLQRController(env, model, cost, fused_rollout=on_tpu)
    # 0.5-scale initial excitation: at 0.1 the swing-up can stall in the
    # hanging-rest local minimum on TPU (f32 transcendental precision
    # perturbs the delicately-balanced early gradients); 0.5 escapes the
    # basin reliably on every backend and seed tested.
    U0 = 0.5 * jax.random.normal(jax.random.PRNGKey(0),
                                 (N, model.action_size))

    J_hist = []

    def on_iteration(iteration, state, Z, U, J):
        J_hist.append(float(J))

    t0 = time.time()
    Z, U, state = controller.fit(U0, encoding=ENCODING,
                                 n_iterations=n_iterations,
                                 on_iteration=on_iteration,
                                 u_min=-umax, u_max=umax)
    wall = time.time() - t0
    print("{}: J = {:.4f}  state = {}  ({} iters, {:.2f}s)".format(
        problem.name.lower(), J_hist[-1] if J_hist else float("nan"),
        state.name, len(J_hist), wall))

    plt.figure(figsize=(10, 6))
    plt.subplot(2, 1, 1)
    plt.plot(J_hist)
    plt.yscale("log")
    plt.ylabel("Total loss")
    plt.title("{} (known dynamics)".format(problem.name.lower()))
    plt.subplot(2, 1, 2)
    plot_path(Z, encoding=ENCODING, horizon=N, legend=False)
    plt.xlabel("Time step")
    finish_figure("/tmp/{}_known.png".format(problem.name.lower()),
                  show=False)
    plt.close()
    return Z, U, state


if __name__ == "__main__":
    if len(sys.argv) > 1:
        name = sys.argv[1].upper()
        if name not in SampleProblems.__members__:
            raise SystemExit("Unknown problem {!r}; choose from: {}".format(
                sys.argv[1], ", ".join(m.lower() for m in
                                       SampleProblems.__members__)))
        problems = [SampleProblems[name]]
    else:
        problems = list(SampleProblems)
    n_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    for p in problems:
        run(p, n_iterations=n_iter)
