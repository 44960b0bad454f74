"""Trajectory utility tests (reference tests/utils has no trajectory test;
these cover the contract at /root/reference/pddp/utils/trajectory.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from pddp_tpu.gaussian_variable import GaussianVariable
from pddp_tpu.utils.trajectory import (mean_trajectory, sample_trajectory,
                                       trajectory_to_training_data)


def _gaussians(n=4, d=3):
    key = jax.random.PRNGKey(0)
    out = []
    for i in range(n):
        key, sub = jax.random.split(key)
        out.append(GaussianVariable.random(sub, d))
    return out


def test_mean_trajectory():
    X = _gaussians()
    M = mean_trajectory(X)
    assert M.shape == (4, 3)
    for i, x in enumerate(X):
        np.testing.assert_allclose(M[i], x.mean())


def test_sample_trajectory_shape_and_determinism():
    X = _gaussians()
    key = jax.random.PRNGKey(42)
    S1 = sample_trajectory(X, key)
    S2 = sample_trajectory(X, key)
    assert S1.shape == (4, 3)
    np.testing.assert_allclose(S1, S2)  # same key -> same sample
    S3 = sample_trajectory(X, jax.random.PRNGKey(43))
    assert not np.allclose(S1, S3)


def test_trajectory_to_training_data():
    """Parity with reference trajectory.py:60-73 (dX = X[:-1] - X[1:])."""
    X = jnp.arange(15.0).reshape(5, 3)
    U = jnp.arange(8.0).reshape(4, 2)
    X_, dX = trajectory_to_training_data(X, U)
    assert X_.shape == (4, 5)
    assert dX.shape == (4, 3)
    np.testing.assert_allclose(X_[:, :3], X[:-1])
    np.testing.assert_allclose(X_[:, 3:], U)
    np.testing.assert_allclose(dX, X[:-1] - X[1:])
