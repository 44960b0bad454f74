"""Cartpole environment.

Parity: /root/reference/pddp/examples/cartpole/env.py — simulator with the
analytic model as ground truth, reset at zeros + 1e-2 N(0, I)
(reference env.py:114-117).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...envs.base import SimEnv
from .model import CartpoleDynamicsModel

__all__ = ["CartpoleEnv"]


class CartpoleEnv(SimEnv):
    """Cartpole swing-up environment."""

    def __init__(self, model=None, dt=0.1, seed=0, render=False):
        if model is None:
            model = CartpoleDynamicsModel(dt=dt)
        del render
        super().__init__(model, dt=dt, seed=seed)

    @property
    def reset_mean(self):
        return jnp.zeros(4)
