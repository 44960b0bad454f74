"""Example-model tests (mirrors reference tests/examples/test_models.py:
shape contracts across all problems x encodings, plus finite-difference
gradient checks — the reference's torch.autograd.gradcheck at :45-53)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pddp_tpu.encoding import (StateEncoding, decode_mean, encode,
                               infer_encoded_state_size)
from pddp_tpu.examples.problems import SampleProblems

ENCODINGS = [
    StateEncoding.FULL_COVARIANCE_MATRIX,
    StateEncoding.UPPER_TRIANGULAR_CHOLESKY,
    StateEncoding.VARIANCE_ONLY,
    StateEncoding.STANDARD_DEVIATION_ONLY,
    StateEncoding.IGNORE_UNCERTAINTY,
]
PROBLEMS = list(SampleProblems)


def _model(problem):
    return problem.get_model_class()(dt=0.05)


def _z(model, encoding, key=0):
    n = model.state_size
    mean = 0.1 * jax.random.normal(jax.random.PRNGKey(key), (n,),
                                   dtype=jnp.float64)
    V = 0.01 + 0.01 * jnp.arange(1.0, n + 1)
    return encode(mean, V=V, encoding=encoding)


def _u(model, key=1):
    return 0.3 * jax.random.normal(jax.random.PRNGKey(key),
                                   (model.action_size,), dtype=jnp.float64)


@pytest.mark.parametrize("problem", PROBLEMS)
@pytest.mark.parametrize("encoding", ENCODINGS)
def test_forward_shape_and_finiteness(problem, encoding):
    model = _model(problem)
    z = _z(model, encoding)
    u = _u(model)
    z_next = model(z, u, 0, encoding=encoding)
    assert z_next.shape == (infer_encoded_state_size(model.state_size,
                                                     encoding),)
    assert bool(jnp.all(jnp.isfinite(z_next)))


@pytest.mark.parametrize("problem", PROBLEMS)
@pytest.mark.parametrize("encoding", [StateEncoding.IGNORE_UNCERTAINTY,
                                      StateEncoding.VARIANCE_ONLY])
def test_jacobians_match_finite_differences(problem, encoding):
    """The reference's gradcheck (tests/examples/test_models.py:45-53)."""
    model = _model(problem)
    z = _z(model, encoding)
    u = _u(model)

    def f_z(zz):
        return model(zz, u, 0, encoding=encoding)

    def f_u(uu):
        return model(z, uu, 0, encoding=encoding)

    J_z = jax.jacfwd(f_z)(z)
    J_u = jax.jacfwd(f_u)(u)

    eps = 1e-6
    for j in range(z.shape[0]):
        dz = jnp.zeros_like(z).at[j].set(eps)
        fd = (f_z(z + dz) - f_z(z - dz)) / (2 * eps)
        np.testing.assert_allclose(J_z[:, j], fd, atol=1e-5, rtol=1e-4)
    for j in range(u.shape[0]):
        du = jnp.zeros_like(u).at[j].set(eps)
        fd = (f_u(u + du) - f_u(u - du)) / (2 * eps)
        np.testing.assert_allclose(J_u[:, j], fd, atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("problem", PROBLEMS)
def test_model_is_batched(problem):
    """Dynamics broadcast over leading batch dims (vmap axis P1/P5)."""
    encoding = StateEncoding.IGNORE_UNCERTAINTY
    model = _model(problem)
    B = 7
    zs = 0.1 * jax.random.normal(jax.random.PRNGKey(0),
                                 (B, model.state_size))
    us = 0.1 * jax.random.normal(jax.random.PRNGKey(1),
                                 (B, model.action_size))
    out_vmap = jax.vmap(
        lambda z, u: model(z, u, 0, encoding=encoding))(zs, us)
    assert out_vmap.shape == (B, model.state_size)
    for b in range(B):
        np.testing.assert_allclose(
            out_vmap[b], model(zs[b], us[b], 0, encoding=encoding),
            rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("problem", PROBLEMS)
def test_model_params_are_differentiable(problem):
    """Physical constants are pytree leaves: the model itself is learnable
    (the reference's grad-enabled Parameters, e.g. pendulum/model.py:62-70)."""
    encoding = StateEncoding.IGNORE_UNCERTAINTY
    model = _model(problem)
    z = _z(model, encoding)
    u = _u(model)

    def loss(m):
        return jnp.sum(m(z, u, 0, encoding=encoding) ** 2)

    grads = jax.grad(loss)(model)
    leaves = jax.tree_util.tree_leaves(grads)
    assert len(leaves) > 0
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
    total = sum(float(jnp.abs(g).sum()) for g in leaves)
    assert total > 0.0


def test_pendulum_euler_integration_values():
    """Spot-check the pendulum Euler step against hand-computed physics
    (reference pendulum/model.py:84-119)."""
    from pddp_tpu.examples.pendulum import PendulumDynamicsModel

    dt, m, l, mu, g = 0.1, 1.0, 1.0, 0.1, 9.80665
    model = PendulumDynamicsModel(dt=dt, m=m, l=l, mu=mu, g=g)
    theta, theta_dot, torque = 0.3, -0.5, 0.7
    x = jnp.array([theta, theta_dot])
    u = jnp.array([torque])
    x_next = model(x, u, 0, encoding=StateEncoding.IGNORE_UNCERTAINTY)

    acc = 3.0 * (torque - mu * theta_dot
                 - 0.5 * m * l * g * np.sin(theta)) / (m * l * l)
    np.testing.assert_allclose(x_next[0], theta + theta_dot * dt, rtol=1e-6)
    np.testing.assert_allclose(x_next[1], theta_dot + acc * dt, rtol=1e-6)
