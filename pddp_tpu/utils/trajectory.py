"""Trajectory utilities (parity: /root/reference/pddp/utils/trajectory.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "mean_trajectory",
    "sample_trajectory",
    "trajectory_to_training_data",
]


def mean_trajectory(X):
    """Mean trajectory from a list/stack of GaussianVariables (ref :20-37)."""
    return jnp.stack([x.mean() for x in X])


def sample_trajectory(X, key):
    """Sampled trajectory from GaussianVariables (reference :40-57)."""
    keys = jax.random.split(key, len(X))
    return jnp.stack([x.sample(k) for x, k in zip(X, keys)])


def trajectory_to_training_data(X, U):
    """(X, U) -> (state-action pairs, state deltas) (reference :60-73)."""
    X_ = jnp.concatenate([X[:-1], U], axis=-1)
    dX = X[:-1] - X[1:]
    return X_, dX
