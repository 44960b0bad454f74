"""Multi-vehicle rendezvous environment.

Parity: /root/reference/pddp/examples/rendezvous/env.py — simulator with
the analytic model, reset at [-10, -10, 10, 10, 0, -5, 5, 0] + 1e-2 noise
(env.py:106-109).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...envs.base import SimEnv
from .model import RendezvousDynamicsModel

__all__ = ["RendezvousEnv"]


class RendezvousEnv(SimEnv):
    """Two-vehicle rendezvous environment."""

    def __init__(self, model=None, dt=0.1, seed=0, render=False):
        if model is None:
            model = RendezvousDynamicsModel(dt=dt)
        del render
        super().__init__(model, dt=dt, seed=seed)

    @property
    def reset_mean(self):
        return jnp.array([-10.0, -10.0, 10.0, 10.0, 0.0, -5.0, 5.0, 0.0])
