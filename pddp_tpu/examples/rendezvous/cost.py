"""Multi-vehicle rendezvous cost.

Parity: /root/reference/pddp/examples/rendezvous/cost.py:30-42 — Q couples
the two vehicles' positions (penalizes ||x_0 - x_1||^2) while penalizing
velocities; no angular augmentation.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ...costs.quadratic import QRCost
from ...struct import pytree_dataclass
from .model import RendezvousDynamicsModel

__all__ = ["RendezvousCost"]


def _build():
    model = RendezvousDynamicsModel
    Q = np.eye(model.state_size)
    Q[0, 2] = Q[2, 0] = -1.0
    Q[1, 3] = Q[3, 1] = -1.0
    R = 0.1 * np.eye(model.action_size)
    return jnp.asarray(Q), jnp.asarray(R)


@pytree_dataclass
class RendezvousCost(QRCost):
    """Vehicle-coupling quadratic cost."""

    Q: jnp.ndarray = None
    R: jnp.ndarray = None

    def __post_init__(self):
        if self.Q is None:
            Q, R = _build()
            object.__setattr__(self, "Q", Q)
            object.__setattr__(self, "R", R)
        super().__post_init__()
