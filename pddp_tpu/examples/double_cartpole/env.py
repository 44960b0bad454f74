"""Double cartpole environment.

Parity: /root/reference/pddp/examples/double_cartpole/env.py — simulator
with the analytic model, reset at zeros + 1e-2 N(0, I) (env.py:114-117).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...envs.base import SimEnv
from .model import DoubleCartpoleDynamicsModel

__all__ = ["DoubleCartpoleEnv"]


class DoubleCartpoleEnv(SimEnv):
    """Double cartpole swing-up environment."""

    def __init__(self, model=None, dt=0.05, seed=0, render=False):
        if model is None:
            model = DoubleCartpoleDynamicsModel(dt=dt)
        del render
        super().__init__(model, dt=dt, seed=seed)

    @property
    def reset_mean(self):
        return jnp.zeros(6)
