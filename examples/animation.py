"""Known-dynamics iLQR phase-plot animation (cartpole).

Parity: /root/reference/examples/animation.py:26-82 — records the nominal
trajectory after every accepted iLQR iteration and animates the
(theta, theta-dot) phase plot across iterations. Headless-safe: always
writes a GIF (pillow writer) unless a display is present and "show" is
passed.
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
from pddp_tpu.controllers.ilqr import forward
from pddp_tpu.encoding import StateEncoding, decode_mean
from pddp_tpu.examples.cartpole import (CartpoleCost, CartpoleDynamicsModel,
                                        CartpoleEnv)

DT = 0.1
N = 25
ITERATIONS = 100
U_MAX = jnp.array([10.0])
U_MIN = -U_MAX

# Known dynamics: uncertainty disabled (reference animation.py:20).
ENCODING = StateEncoding.IGNORE_UNCERTAINTY


def main(save_path="/tmp/ilqr.gif"):
    cost = CartpoleCost()
    model = CartpoleDynamicsModel(dt=DT)
    env = CartpoleEnv(dt=DT)

    controller = iLQRController(env, model, cost)
    U = 1e-1 * jax.random.normal(jax.random.PRNGKey(0),
                                 (N, model.action_size))

    z0 = env.get_state().encode(ENCODING)
    Zs = [forward(z0, U, model, cost, ENCODING)[0]]

    def on_iteration(iteration, state, Z, U, J_opt):
        Zs.append(np.asarray(Z))

    controller.fit(U, encoding=ENCODING, n_iterations=ITERATIONS,
                   on_iteration=on_iteration, tol=0.0, u_min=U_MIN,
                   u_max=U_MAX)

    fig, ax = plt.subplots(figsize=(8, 6), dpi=100)

    def update(iteration):
        Z = Zs[iteration]
        X = np.asarray(decode_mean(jnp.asarray(Z), ENCODING))
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

    anim = FuncAnimation(fig, update, frames=np.arange(len(Zs)),
                         interval=1000)
    if len(sys.argv) > 1 and sys.argv[1] == "show" and os.environ.get(
            "DISPLAY"):
        plt.show()
    else:
        anim.save(save_path, writer=PillowWriter(fps=2))
        print("saved", save_path)


if __name__ == "__main__":
    main()
