"""Cartpole cost.

Parity: /root/reference/pddp/examples/cartpole/cost.py:38-58 — pole-tip
distance cost on the augmented state [x, x', theta', sin(theta),
cos(theta)], Q_term = I, R = 0.1 I, goal = augment([0, 0, pi, 0]).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ...costs.quadratic import QRCost
from ...encoding import StateEncoding
from ...struct import pytree_dataclass
from ...utils.angular import (augment_encoded_state, augment_state,
                              infer_augmented_state_size)
from .model import CartpoleDynamicsModel

__all__ = ["CartpoleCost"]


def _build(pole_length=0.5):
    model = CartpoleDynamicsModel
    n_aug = infer_augmented_state_size(model.angular_indices,
                                       model.non_angular_indices)

    Q = np.zeros((n_aug, n_aug))
    Q[0, 0] = 1.0
    Q[0, 3] = Q[3, 0] = pole_length
    Q[3, 3] = Q[4, 4] = pole_length**2
    Q_term = np.eye(n_aug)
    R = 0.1 * np.eye(model.action_size)

    x_goal = augment_state(
        jnp.array([0.0, 0.0, np.pi, 0.0]), model.angular_indices,
        model.non_angular_indices)

    return (jnp.asarray(Q), jnp.asarray(R), jnp.asarray(Q_term), x_goal)


@pytree_dataclass
class CartpoleCost(QRCost):
    """Pole-tip distance cost on the augmented cartpole state."""

    Q: jnp.ndarray = None
    R: jnp.ndarray = None

    # __call__ is exactly augment -> QRCost: analytic local model applies.
    call_is_augmented_qr = True
    aug_angular_indices = CartpoleDynamicsModel.angular_indices
    aug_non_angular_indices = CartpoleDynamicsModel.non_angular_indices

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
        model = CartpoleDynamicsModel
        z = augment_encoded_state(z, model.angular_indices,
                                  model.non_angular_indices, encoding,
                                  model.state_size)
        return super().__call__(z, u, i, terminal, encoding, **kwargs)
