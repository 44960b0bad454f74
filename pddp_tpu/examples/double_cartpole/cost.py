"""Double cartpole cost.

Parity: /root/reference/pddp/examples/double_cartpole/cost.py:39-67 —
two-pole tip distance cost built via C^T C on the augmented state
[x, x', th1', th2', sin th1, cos th1, sin th2, cos th2], Q_term = 100 I.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ...costs.quadratic import QRCost
from ...encoding import StateEncoding
from ...struct import pytree_dataclass
from ...utils.angular import (augment_encoded_state, augment_state,
                              infer_augmented_state_size)
from .model import DoubleCartpoleDynamicsModel

__all__ = ["DoubleCartpoleCost"]


def _build(pole1_length=0.6, pole2_length=0.6):
    model = DoubleCartpoleDynamicsModel
    n_aug = infer_augmented_state_size(model.angular_indices,
                                       model.non_angular_indices)

    Q_term = 100.0 * np.eye(n_aug)
    Q = np.zeros((n_aug, n_aug))
    # Cost acts on [x, sin th1, cos th1, sin th2, cos th2]
    # (reference cost.py:45-51).
    cost_dims = np.hstack([
        0,
        np.arange(n_aug - 2 * len(model.angular_indices), n_aug)
    ])[:, None]
    C = np.array([[1.0, -pole1_length, 0.0, -pole2_length, 0.0],
                  [0.0, 0.0, pole1_length, 0.0, pole2_length]])
    Q[cost_dims, cost_dims.T] = C.T @ C

    R = 0.1 * np.eye(model.action_size)

    x_goal = augment_state(
        jnp.zeros(model.state_size), model.angular_indices,
        model.non_angular_indices)

    return (jnp.asarray(Q), jnp.asarray(R), jnp.asarray(Q_term), x_goal)


@pytree_dataclass
class DoubleCartpoleCost(QRCost):
    """Two-pole tip distance cost on the augmented state."""

    Q: jnp.ndarray = None
    R: jnp.ndarray = None

    # __call__ is exactly augment -> QRCost: analytic local model applies.
    call_is_augmented_qr = True
    aug_angular_indices = DoubleCartpoleDynamicsModel.angular_indices
    aug_non_angular_indices = DoubleCartpoleDynamicsModel.non_angular_indices

    def __post_init__(self):
        if self.Q is None:
            Q, R, Q_term, x_goal = _build()
            object.__setattr__(self, "Q", Q)
            object.__setattr__(self, "R", R)
            object.__setattr__(self, "Q_term", Q_term)
            object.__setattr__(self, "x_goal", x_goal)
        super().__post_init__()

    def __call__(self, z, u, i, terminal=False,
                 encoding: StateEncoding = StateEncoding.DEFAULT, **kwargs):
        model = DoubleCartpoleDynamicsModel
        z = augment_encoded_state(z, model.angular_indices,
                                  model.non_angular_indices, encoding,
                                  model.state_size)
        return super().__call__(z, u, i, terminal, encoding, **kwargs)
