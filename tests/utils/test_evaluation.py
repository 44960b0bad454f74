"""Derivative-engine tests: eval_cost/eval_dynamics vs finite differences
(the reference's gradcheck strategy, tests/examples/test_models.py:45-53)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pddp_tpu.encoding import StateEncoding, infer_encoded_state_size
from pddp_tpu.examples.pendulum import PendulumCost, PendulumDynamicsModel
from pddp_tpu.utils.evaluation import eval_cost, eval_dynamics

ENCODINGS = [
    StateEncoding.IGNORE_UNCERTAINTY,
    StateEncoding.VARIANCE_ONLY,
    StateEncoding.UPPER_TRIANGULAR_CHOLESKY,
]


def _fd_grad(f, x, eps=1e-6):
    x = np.asarray(x, dtype=np.float64)
    g = np.zeros_like(x)
    for j in range(x.size):
        dx = np.zeros_like(x)
        dx[j] = eps
        g[j] = (f(x + dx) - f(x - dx)) / (2 * eps)
    return g


def _z0(encoding, n=2):
    nz = infer_encoded_state_size(n, encoding)
    z = 0.1 * jnp.arange(1.0, nz + 1)
    # keep uncertainty part positive-definite-ish
    return z.at[n:].add(0.5)


@pytest.mark.parametrize("encoding", ENCODINGS)
def test_eval_cost_gradients_match_fd(encoding):
    cost = PendulumCost()
    z = _z0(encoding)
    u = jnp.array([0.3])
    l, l_z, l_u, l_zz, l_uz, l_uu = eval_cost(cost, z, u, 0,
                                              encoding=encoding)
    assert jnp.isfinite(l)

    fd_z = _fd_grad(
        lambda zz: float(cost(jnp.asarray(zz), u, 0, False, encoding)), z)
    fd_u = _fd_grad(
        lambda uu: float(cost(z, jnp.asarray(uu), 0, False, encoding)), u)
    np.testing.assert_allclose(l_z, fd_z, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(l_u, fd_u, atol=1e-4, rtol=1e-4)

    # Hessian symmetry and shapes.
    nz = z.shape[0]
    assert l_zz.shape == (nz, nz)
    np.testing.assert_allclose(l_zz, l_zz.T, atol=1e-8)
    assert l_uz.shape == (1, nz)
    assert l_uu.shape == (1, 1)


@pytest.mark.parametrize("encoding", ENCODINGS)
def test_eval_cost_terminal(encoding):
    cost = PendulumCost()
    z = _z0(encoding)
    l, l_z, l_u, l_zz, l_uz, l_uu = eval_cost(cost, z, None, 10,
                                              terminal=True,
                                              encoding=encoding)
    assert l_u is None and l_uz is None and l_uu is None
    assert l_z.shape == z.shape


@pytest.mark.parametrize("encoding", ENCODINGS)
def test_eval_dynamics_jacobians_match_fd(encoding):
    model = PendulumDynamicsModel(dt=0.1)
    z = _z0(encoding)
    u = jnp.array([0.5])
    z_next, F_z, F_u = eval_dynamics(model, z, u, 0, encoding=encoding)

    nz = z.shape[0]
    assert z_next.shape == (nz,)
    assert F_z.shape == (nz, nz)
    assert F_u.shape == (nz, 1)

    for row in range(nz):
        fd = _fd_grad(
            lambda zz: float(
                model.apply(jnp.asarray(zz), u, 0, (), encoding)[row]), z)
        np.testing.assert_allclose(F_z[row], fd, atol=1e-4, rtol=1e-4)

    fd_u = _fd_grad(
        lambda uu: float(model.apply(z, jnp.asarray(uu), 0, (), encoding)[0]),
        u)
    np.testing.assert_allclose(F_u[0], fd_u, atol=1e-4, rtol=1e-4)


def test_approximate_hessians():
    cost = PendulumCost()
    encoding = StateEncoding.IGNORE_UNCERTAINTY
    z = _z0(encoding)
    u = jnp.array([0.3])
    _, l_z, l_u, l_zz, l_uz, l_uu = eval_cost(cost, z, u, 0,
                                              encoding=encoding,
                                              approximate=True)
    np.testing.assert_allclose(l_zz, jnp.outer(l_z, l_z), atol=1e-8)
    np.testing.assert_allclose(l_uu, jnp.outer(l_u, l_u), atol=1e-8)
    np.testing.assert_allclose(l_uz, jnp.outer(l_u, l_z), atol=1e-8)
