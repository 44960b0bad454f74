"""Example-cost tests (mirrors reference tests/examples/test_costs.py:
value/gradient checks across problems x encodings, gradcheck at :54)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pddp_tpu.encoding import StateEncoding, encode
from pddp_tpu.examples.problems import SampleProblems

ENCODINGS = [
    StateEncoding.FULL_COVARIANCE_MATRIX,
    StateEncoding.UPPER_TRIANGULAR_CHOLESKY,
    StateEncoding.VARIANCE_ONLY,
    StateEncoding.STANDARD_DEVIATION_ONLY,
    StateEncoding.IGNORE_UNCERTAINTY,
]
PROBLEMS = list(SampleProblems)


def _setup(problem, encoding):
    model = problem.get_model_class()(dt=0.05)
    cost = problem.get_cost_class()()
    n = model.state_size
    mean = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (n,),
                                   dtype=jnp.float64)
    V = 0.01 + 0.005 * jnp.arange(1.0, n + 1)
    z = encode(mean, V=V, encoding=encoding)
    u = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (model.action_size,),
                                dtype=jnp.float64)
    return cost, z, u


@pytest.mark.parametrize("problem", PROBLEMS)
@pytest.mark.parametrize("encoding", ENCODINGS)
@pytest.mark.parametrize("terminal", [False, True])
def test_cost_scalar_and_finite(problem, encoding, terminal):
    cost, z, u = _setup(problem, encoding)
    l = cost(z, None if terminal else u, 0, terminal, encoding)
    assert l.shape == ()
    assert bool(jnp.isfinite(l))


@pytest.mark.parametrize("problem", PROBLEMS)
@pytest.mark.parametrize("encoding", [StateEncoding.IGNORE_UNCERTAINTY,
                                      StateEncoding.VARIANCE_ONLY,
                                      StateEncoding.UPPER_TRIANGULAR_CHOLESKY])
def test_cost_gradients_match_finite_differences(problem, encoding):
    """The reference's gradcheck (tests/examples/test_costs.py:54)."""
    cost, z, u = _setup(problem, encoding)

    g_z = jax.grad(lambda zz: cost(zz, u, 0, False, encoding))(z)
    g_u = jax.grad(lambda uu: cost(z, uu, 0, False, encoding))(u)

    eps = 1e-6
    for j in range(z.shape[0]):
        dz = jnp.zeros_like(z).at[j].set(eps)
        fd = (cost(z + dz, u, 0, False, encoding)
              - cost(z - dz, u, 0, False, encoding)) / (2 * eps)
        np.testing.assert_allclose(g_z[j], fd, atol=1e-5, rtol=1e-4)
    for j in range(u.shape[0]):
        du = jnp.zeros_like(u).at[j].set(eps)
        fd = (cost(z, u + du, 0, False, encoding)
              - cost(z, u - du, 0, False, encoding)) / (2 * eps)
        np.testing.assert_allclose(g_u[j], fd, atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("problem", PROBLEMS)
def test_cost_is_batched(problem):
    encoding = StateEncoding.VARIANCE_ONLY
    model = problem.get_model_class()(dt=0.05)
    cost = problem.get_cost_class()()
    n = model.state_size
    B = 5
    means = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (B, n))
    V = 0.01 * jnp.ones((B, n))
    zs = encode(means, V=V, encoding=encoding)
    us = 0.1 * jax.random.normal(jax.random.PRNGKey(1),
                                 (B, model.action_size))
    ls = cost(zs, us, 0, False, encoding)
    assert ls.shape == (B,)
    for b in range(B):
        np.testing.assert_allclose(
            ls[b], cost(zs[b], us[b], 0, False, encoding), rtol=1e-5)


@pytest.mark.parametrize("problem", [SampleProblems.PENDULUM,
                                     SampleProblems.CARTPOLE])
def test_cost_minimal_at_goal(problem):
    """The running cost at the goal state with zero action must be (near)
    its minimum over random states."""
    encoding = StateEncoding.IGNORE_UNCERTAINTY
    model = problem.get_model_class()(dt=0.05)
    cost = problem.get_cost_class()()
    goal = {
        SampleProblems.PENDULUM: jnp.array([np.pi, 0.0]),
        SampleProblems.CARTPOLE: jnp.array([0.0, 0.0, np.pi, 0.0]),
    }[problem]
    u0 = jnp.zeros(model.action_size)
    l_goal = float(cost(goal, u0, 0, False, encoding))

    keys = jax.random.split(jax.random.PRNGKey(3), 32)
    for k in keys:
        x = 2.0 * jax.random.normal(k, goal.shape)
        assert float(cost(x, u0, 0, False, encoding)) >= l_goal - 1e-6


def test_uncertainty_increases_qr_cost():
    """tr(Q Sigma) term: larger covariance => larger expected cost
    (reference quadratic.py:92-97)."""
    problem = SampleProblems.PENDULUM
    encoding = StateEncoding.VARIANCE_ONLY
    model = problem.get_model_class()(dt=0.05)
    cost = problem.get_cost_class()()
    mean = jnp.array([0.3, 0.1])
    u = jnp.zeros(model.action_size)
    z_small = encode(mean, V=1e-4 * jnp.ones(2), encoding=encoding)
    z_large = encode(mean, V=1e-1 * jnp.ones(2), encoding=encoding)
    assert float(cost(z_large, u, 0, False, encoding)) > float(
        cost(z_small, u, 0, False, encoding))
