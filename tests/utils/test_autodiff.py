"""Autodiff helper tests: cross-check jacrev vs jacfwd paths (the
reference's strategy of checking its batch trick against row-by-row
jacobians, tests/models/test_bnn.py:72-80)."""

import jax.numpy as jnp
import numpy as np

from pddp_tpu.utils.autodiff import batch_jacobian, grad, jacobian


def f(x):
    return jnp.array([jnp.sin(x[0]) * x[1], x[0]**2 + jnp.exp(x[2])])


def test_jacobian_matches_batch_jacobian():
    x = jnp.array([0.3, -1.2, 0.5])
    J_rev = jacobian(f)(x)
    J_fwd = batch_jacobian(f)(x)
    assert J_rev.shape == (2, 3)
    np.testing.assert_allclose(J_rev, J_fwd, rtol=1e-10)


def test_jacobian_values():
    x = jnp.array([0.3, -1.2, 0.5])
    J = jacobian(f)(x)
    expected = np.array([
        [np.cos(0.3) * -1.2, np.sin(0.3), 0.0],
        [2 * 0.3, 0.0, np.exp(0.5)],
    ])
    np.testing.assert_allclose(J, expected, rtol=1e-6)


def test_grad_scalar():
    g = grad(lambda x: jnp.sum(x**2))(jnp.array([1.0, -2.0]))
    np.testing.assert_allclose(g, [2.0, -4.0])


def test_grad_disconnected_is_zero():
    """Disconnected inputs yield zeros (reference autodiff.py:20-39)."""
    g = grad(lambda x, y: jnp.sum(x**2), argnums=1)(
        jnp.array([1.0]), jnp.array([3.0, 4.0]))
    np.testing.assert_allclose(g, [0.0, 0.0])
