"""Encoding tests (mirrors reference tests/utils/test_encoding.py strategy:
encode/decode roundtrips under every encoding, size inference both ways)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pddp_tpu.encoding import (StateEncoding, decode_covar, decode_covar_sqrt,
                               decode_mean, decode_std, decode_var, encode,
                               infer_encoded_state_size, infer_state_size)

ENCODINGS = list(StateEncoding)[:5]
SIZES = [1, 2, 4, 8]


@pytest.mark.parametrize("encoding", ENCODINGS)
@pytest.mark.parametrize("n", SIZES)
def test_size_inference_roundtrip(encoding, n):
    m = infer_encoded_state_size(n, encoding)
    assert infer_state_size(m, encoding) == n


def _random_cov(key, n):
    L = jax.random.normal(key, (n, n))
    return L.T @ L + 0.1 * jnp.eye(n)


@pytest.mark.parametrize("encoding", ENCODINGS)
@pytest.mark.parametrize("n", SIZES)
def test_encode_decode_mean_roundtrip(encoding, n):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    M = jax.random.normal(k1, (n,))
    C = _random_cov(k2, n)
    z = encode(M, C=C, encoding=encoding)
    assert z.shape == (infer_encoded_state_size(n, encoding),)
    np.testing.assert_allclose(decode_mean(z, encoding), M, atol=1e-6)


@pytest.mark.parametrize("encoding", [
    StateEncoding.FULL_COVARIANCE_MATRIX,
    StateEncoding.UPPER_TRIANGULAR_CHOLESKY,
])
@pytest.mark.parametrize("n", SIZES)
def test_encode_decode_covar_roundtrip(encoding, n):
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    M = jax.random.normal(k1, (n,))
    C = _random_cov(k2, n)
    z = encode(M, C=C, encoding=encoding)
    np.testing.assert_allclose(decode_covar(z, encoding), C, atol=1e-5)


@pytest.mark.parametrize("encoding", [
    StateEncoding.VARIANCE_ONLY,
    StateEncoding.STANDARD_DEVIATION_ONLY,
])
@pytest.mark.parametrize("n", SIZES)
def test_encode_decode_var_roundtrip(encoding, n):
    key = jax.random.PRNGKey(2)
    k1, k2 = jax.random.split(key)
    M = jax.random.normal(k1, (n,))
    V = jnp.abs(jax.random.normal(k2, (n,))) + 0.1
    z = encode(M, V=V, encoding=encoding)
    np.testing.assert_allclose(decode_var(z, encoding), V, atol=1e-6)
    np.testing.assert_allclose(decode_std(z, encoding), jnp.sqrt(V),
                               atol=1e-6)


@pytest.mark.parametrize("encoding", ENCODINGS)
@pytest.mark.parametrize("n", [2, 4])
def test_covar_sqrt_consistency(encoding, n):
    """decode_covar_sqrt U must satisfy U^T U == decode_covar."""
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    M = jax.random.normal(k1, (n,))
    C = _random_cov(k2, n)
    z = encode(M, C=C, encoding=encoding)
    U = decode_covar_sqrt(z, encoding)
    np.testing.assert_allclose(U.T @ U, decode_covar(z, encoding), atol=1e-5)


@pytest.mark.parametrize("encoding", ENCODINGS)
def test_batched_encode_decode(encoding):
    """All codecs broadcast over leading batch dims."""
    n, B = 4, 7
    key = jax.random.PRNGKey(4)
    ks = jax.random.split(key, B + 1)
    M = jax.random.normal(ks[0], (B, n))
    C = jnp.stack([_random_cov(k, n) for k in ks[1:]])
    z = encode(M, C=C, encoding=encoding)
    assert z.shape == (B, infer_encoded_state_size(n, encoding))
    np.testing.assert_allclose(decode_mean(z, encoding), M, atol=1e-6)
    assert decode_covar(z, encoding).shape == (B, n, n)
    assert decode_var(z, encoding).shape == (B, n)
    assert decode_covar_sqrt(z, encoding).shape == (B, n, n)


def test_encode_from_variance_only_inputs():
    """encode with V or S under every encoding (diagonal fast paths)."""
    n = 3
    M = jnp.arange(1.0, n + 1)
    V = jnp.array([0.1, 0.2, 0.3])
    for encoding in ENCODINGS:
        z_v = encode(M, V=V, encoding=encoding)
        z_s = encode(M, S=jnp.sqrt(V), encoding=encoding)
        np.testing.assert_allclose(z_v, z_s, atol=1e-6)
        if encoding != StateEncoding.IGNORE_UNCERTAINTY:
            np.testing.assert_allclose(decode_var(z_v, encoding), V,
                                       atol=1e-6)


def test_ignore_uncertainty_constants():
    z = jnp.arange(3.0)
    np.testing.assert_allclose(
        decode_covar(z, StateEncoding.IGNORE_UNCERTAINTY),
        1e-6 * jnp.eye(3))
    np.testing.assert_allclose(
        decode_std(z, StateEncoding.IGNORE_UNCERTAINTY), 1e-3 * jnp.ones(3))


def test_safe_cholesky_non_psd_fallback():
    """A non-PSD matrix must still produce a finite factor."""
    from pddp_tpu.utils.linalg import safe_cholesky
    C = jnp.array([[1.0, 0.0], [0.0, -0.5]])
    U = safe_cholesky(C)
    assert bool(jnp.all(jnp.isfinite(U)))


def test_encode_jits():
    n = 4
    M = jnp.zeros(n)
    C = jnp.eye(n)
    for encoding in ENCODINGS:
        fn = jax.jit(lambda m, c, e=encoding: encode(m, C=c, encoding=e))
        z = fn(M, C)
        assert z.shape == (infer_encoded_state_size(n, encoding),)
