"""Angular augmentation tests: roundtrips plus Monte-Carlo validation of the
exact trig moment matching (the reference validates by inheritance from
kusanagi; here we check the math directly against sampling)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pddp_tpu.encoding import StateEncoding, decode_covar, decode_mean, decode_var, encode
from pddp_tpu.utils.angular import (augment_encoded_state, augment_state,
                                    complementary_indices,
                                    infer_augmented_state_size, reduce_state)


def test_complementary_indices():
    assert complementary_indices((0,), 3) == (1, 2)
    assert complementary_indices((), 3) == (0, 1, 2)
    assert complementary_indices((0, 1, 2), 3) == ()


def test_augment_reduce_roundtrip():
    x = jnp.array([0.3, -1.2, 2.5])
    ai, nai = (1,), (0, 2)
    x_aug = augment_state(x, ai, nai)
    assert x_aug.shape == (4,)
    np.testing.assert_allclose(reduce_state(x_aug, ai, nai), x, atol=1e-6)


def test_augment_state_layout():
    x = jnp.array([0.5, 1.5])
    ai, nai = (0,), (1,)
    x_aug = augment_state(x, ai, nai)
    np.testing.assert_allclose(
        x_aug, jnp.array([1.5, jnp.sin(0.5), jnp.cos(0.5)]), atol=1e-6)


def test_augment_batched():
    x = jnp.ones((5, 3))
    ai, nai = (2,), (0, 1)
    assert augment_state(x, ai, nai).shape == (5, 4)
    assert infer_augmented_state_size(ai, nai) == 4


@pytest.mark.parametrize("encoding", [
    StateEncoding.UPPER_TRIANGULAR_CHOLESKY,
    StateEncoding.VARIANCE_ONLY,
])
def test_moment_matching_against_monte_carlo(encoding):
    """E[sin th], E[cos th], Var[sin th], Var[cos th] must match sampling."""
    mu = jnp.array([0.7, 1.1])
    var = jnp.array([0.09, 0.04])
    ai, nai = (0,), (1,)

    z = encode(mu, V=var, encoding=encoding)
    z_aug = augment_encoded_state(z, ai, nai, encoding, 2)

    # Monte Carlo ground truth.
    key = jax.random.PRNGKey(0)
    samples = mu + jnp.sqrt(var) * jax.random.normal(key, (200000, 2))
    s = jnp.sin(samples[:, 0])
    c = jnp.cos(samples[:, 0])

    mean_aug = decode_mean(z_aug, encoding)
    var_aug = decode_var(z_aug, encoding)

    # Layout: [theta_dot, sin, cos]
    np.testing.assert_allclose(mean_aug[1], s.mean(), atol=2e-3)
    np.testing.assert_allclose(mean_aug[2], c.mean(), atol=2e-3)
    np.testing.assert_allclose(var_aug[1], s.var(), atol=2e-3)
    np.testing.assert_allclose(var_aug[2], c.var(), atol=2e-3)
    np.testing.assert_allclose(mean_aug[0], mu[1], atol=1e-6)


def test_covar_moment_matching_cross_terms():
    """Full-covariance augmentation: sin/cos covariance and input-output
    cross-covariance match Monte Carlo."""
    encoding = StateEncoding.FULL_COVARIANCE_MATRIX
    mu = jnp.array([0.4, -0.8])
    A = jnp.array([[0.3, 0.05], [0.05, 0.2]])
    C = A @ A.T + 0.01 * jnp.eye(2)
    ai, nai = (0,), (1,)

    z = encode(mu, C=C, encoding=encoding)
    z_aug = augment_encoded_state(z, ai, nai, encoding, 2)

    key = jax.random.PRNGKey(1)
    L = jnp.linalg.cholesky(C)
    eps = jax.random.normal(key, (400000, 2))
    samples = mu + eps @ L.T
    feats = jnp.stack([
        samples[:, 1],
        jnp.sin(samples[:, 0]),
        jnp.cos(samples[:, 0]),
    ], axis=-1)

    mc_mean = feats.mean(0)
    d = feats - mc_mean
    mc_cov = (d.T @ d) / (feats.shape[0] - 1)

    np.testing.assert_allclose(decode_mean(z_aug, encoding), mc_mean,
                               atol=5e-3)
    np.testing.assert_allclose(decode_covar(z_aug, encoding), mc_cov,
                               atol=5e-3)


def test_augment_encoded_ignore_uncertainty():
    z = jnp.array([0.5, 1.5])
    out = augment_encoded_state(z, (0,), (1,),
                                StateEncoding.IGNORE_UNCERTAINTY, 2)
    np.testing.assert_allclose(
        out, jnp.array([1.5, jnp.sin(0.5), jnp.cos(0.5)]), atol=1e-6)
