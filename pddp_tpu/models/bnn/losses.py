"""Bayesian neural network losses.

Parity: /root/reference/pddp/models/bnn/losses.py:20-39.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

__all__ = ["gaussian_log_likelihood"]


def gaussian_log_likelihood(targets, pred_means, pred_stds=None):
    """Heteroscedastic Gaussian log marginal likelihood."""
    deltas = pred_means - targets
    if pred_stds is not None:
        return (-0.5 * jnp.sum(jnp.square(deltas / pred_stds), axis=-1)
                - jnp.sum(jnp.log(pred_stds), axis=-1)
                - 0.5 * math.log(2 * math.pi))
    return -0.5 * jnp.sum(jnp.square(deltas), axis=-1)
