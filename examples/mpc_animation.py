"""Receding-horizon MPC animation (cartpole, known dynamics).

Parity: /root/reference/examples/mpc_animation.py:26-69 — each frame takes
one real environment step driven by ``controller(z, i, mpc=True)`` (a
warm-started single iLQR iteration) and plots the current nominal
trajectory's phase plot. Headless-safe: writes a GIF.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_here = _os.path.dirname(_os.path.abspath(__file__))
for _p in (_here, _os.path.dirname(_here)):  # examples dir + repo root
    if _p not in _sys.path:
        _sys.path.insert(0, _p)


import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

import matplotlib

if not os.environ.get("DISPLAY"):
    matplotlib.use("Agg")

import matplotlib.pyplot as plt  # noqa: E402
from matplotlib.animation import FuncAnimation, PillowWriter  # noqa: E402

from pddp_tpu.controllers import iLQRController
from pddp_tpu.encoding import StateEncoding, decode_mean
from pddp_tpu.examples.cartpole import (CartpoleCost, CartpoleDynamicsModel,
                                        CartpoleEnv)

DT = 0.1
N = 25
ITERATIONS = 50
U_MAX = jnp.array([10.0])
U_MIN = -U_MAX
ENCODING = StateEncoding.IGNORE_UNCERTAINTY


def main(save_path="/tmp/mpc.gif"):
    cost = CartpoleCost()
    model = CartpoleDynamicsModel(dt=DT)
    env = CartpoleEnv(dt=DT)

    controller = iLQRController(env, model, cost)
    U = 1e-1 * jax.random.normal(jax.random.PRNGKey(0),
                                 (N, model.action_size))
    controller.fit(U, encoding=ENCODING, n_iterations=1, tol=0.0,
                   u_min=U_MIN, u_max=U_MAX)

    fig, ax = plt.subplots(figsize=(8, 6), dpi=100)

    def update(iteration):
        if iteration == 0:
            env.reset()

        z0 = env.get_state().encode(ENCODING)
        u = controller(z0, iteration, ENCODING, mpc=True, u_min=U_MIN,
                       u_max=U_MAX)
        env.apply(u)

        X = np.asarray(decode_mean(controller._Z_nominal, ENCODING))
        theta = np.unwrap(X[:, 2])
        theta_dot = X[:, 3]

        ax.clear()
        ax.scatter(-np.pi, 0, marker="*", color="r")
        ax.scatter(np.pi, 0, marker="*", color="r")
        ax.plot(theta, theta_dot)
        ax.set_xlim(-3 * np.pi, 3 * np.pi)
        ax.set_ylim(-4 * np.pi, 4 * np.pi)
        ax.set_xlabel("Orientation (rad)")
        ax.set_ylabel("Angular velocity (rad/s)")
        ax.set_title("Iteration {}".format(iteration))
        return (ax,)

    anim = FuncAnimation(fig, update, frames=np.arange(ITERATIONS),
                         interval=100)
    if len(sys.argv) > 1 and sys.argv[1] == "show" and os.environ.get(
            "DISPLAY"):
        plt.show()
    else:
        anim.save(save_path, writer=PillowWriter(fps=10))
        print("saved", save_path)


if __name__ == "__main__":
    main()
