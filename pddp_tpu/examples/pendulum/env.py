"""Pendulum environment.

Parity: /root/reference/pddp/examples/pendulum/env.py — simulator whose
ground truth is the analytic model, reset at [0, 0] + 1e-2 N(0, I)
(reference env.py:110-113).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...envs.base import SimEnv
from .model import PendulumDynamicsModel

__all__ = ["PendulumEnv"]


class PendulumEnv(SimEnv):
    """Pendulum swing-up environment."""

    def __init__(self, model=None, dt=0.1, seed=0, render=False):
        if model is None:
            model = PendulumDynamicsModel(dt=dt)
        del render  # rendering is not supported in the headless TPU build
        super().__init__(model, dt=dt, seed=seed)

    @property
    def reset_mean(self):
        return jnp.zeros(2)
