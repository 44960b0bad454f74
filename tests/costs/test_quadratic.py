"""Quadratic cost tests (mirrors reference tests/costs/test_quadratic.py:
Hessian identities Q+Q^T / R+R^T, trace term under uncertainty; adds a
Monte-Carlo check of the saturating cost's closed form)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pddp_tpu.costs import QRCost, SaturatingQRCost
from pddp_tpu.encoding import StateEncoding, encode
from pddp_tpu.utils.evaluation import eval_cost


def _setup(n=3, m=2, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    Q = jax.random.normal(k1, (n, n))
    Q = Q @ Q.T + jnp.eye(n)
    R = jax.random.normal(k2, (m, m))
    R = R @ R.T + jnp.eye(m)
    x_goal = jax.random.normal(k3, (n,))
    u_goal = jax.random.normal(k4, (m,))
    return Q, R, x_goal, u_goal


def test_qr_cost_hessian_identities():
    Q, R, x_goal, u_goal = _setup()
    cost = QRCost(Q, R, x_goal=x_goal, u_goal=u_goal)
    encoding = StateEncoding.IGNORE_UNCERTAINTY
    z = jnp.array([0.1, -0.4, 0.7])
    u = jnp.array([0.2, 0.9])
    _, _, _, l_zz, l_uz, l_uu = eval_cost(cost, z, u, 0, encoding=encoding)
    np.testing.assert_allclose(l_zz, Q + Q.T, atol=1e-6)
    np.testing.assert_allclose(l_uu, R + R.T, atol=1e-6)
    np.testing.assert_allclose(l_uz, jnp.zeros((2, 3)), atol=1e-8)


def test_qr_cost_trace_term():
    """E[L] = d'Qd + u-term + tr(Q Sigma)."""
    Q, R, x_goal, u_goal = _setup()
    cost = QRCost(Q, R, x_goal=x_goal, u_goal=u_goal)
    mean = jnp.array([0.5, 0.1, -0.3])
    C = jnp.diag(jnp.array([0.2, 0.1, 0.05]))
    z = encode(mean, C=C, encoding=StateEncoding.UPPER_TRIANGULAR_CHOLESKY)
    u = jnp.array([0.0, 0.0])
    val = cost(z, u, 0, False, StateEncoding.UPPER_TRIANGULAR_CHOLESKY)
    d = mean - x_goal
    du = u - u_goal
    expected = d @ Q @ d + du @ R @ du + jnp.trace(C @ Q)
    np.testing.assert_allclose(val, expected, rtol=1e-5)


def test_qr_cost_terminal_uses_q_term():
    Q, R, x_goal, u_goal = _setup()
    Q_term = 100.0 * jnp.eye(3)
    cost = QRCost(Q, R, Q_term=Q_term, x_goal=x_goal)
    z = jnp.array([1.0, 2.0, 3.0])
    val = cost(z, None, 5, True, StateEncoding.IGNORE_UNCERTAINTY)
    d = z - x_goal
    np.testing.assert_allclose(val, d @ Q_term @ d, rtol=1e-6)


def test_qr_cost_batched():
    Q, R, x_goal, u_goal = _setup()
    cost = QRCost(Q, R, x_goal=x_goal, u_goal=u_goal)
    z = jnp.ones((7, 3))
    u = jnp.zeros((7, 2))
    out = cost(z, u, jnp.arange(7), False, StateEncoding.IGNORE_UNCERTAINTY)
    assert out.shape == (7,)


def test_saturating_cost_bounded_and_mc():
    """Saturating state-cost term is in [0, 1]; closed form matches MC."""
    n = 2
    Q = jnp.eye(n)
    R = jnp.zeros((1, 1))
    x_goal = jnp.array([1.0, -0.5])
    cost = SaturatingQRCost(Q, R, x_goal=x_goal)

    mean = jnp.array([0.3, 0.2])
    C = jnp.array([[0.3, 0.1], [0.1, 0.2]])
    z = encode(mean, C=C, encoding=StateEncoding.FULL_COVARIANCE_MATRIX)
    val = cost(z, jnp.zeros(1), 0, False,
               StateEncoding.FULL_COVARIANCE_MATRIX)
    assert 0.0 <= float(val) <= 1.0

    key = jax.random.PRNGKey(0)
    L = jnp.linalg.cholesky(C)
    xs = mean + jax.random.normal(key, (400000, n)) @ L.T
    d = xs - x_goal
    mc = jnp.mean(1.0 - jnp.exp(-0.5 * jnp.sum((d @ Q) * d, axis=-1)))
    np.testing.assert_allclose(val, mc, atol=5e-3)


def test_aggregate_cost_algebra():
    """Mirror reference tests/costs/test_aggregate.py: op of values."""
    Q, R, x_goal, u_goal = _setup()
    c1 = QRCost(Q, R, x_goal=x_goal)
    c2 = QRCost(2.0 * Q, 0.5 * R)
    encoding = StateEncoding.IGNORE_UNCERTAINTY
    z = jnp.array([0.3, 0.1, -0.2])
    u = jnp.array([0.5, -0.5])

    v1 = c1(z, u, 0, False, encoding)
    v2 = c2(z, u, 0, False, encoding)

    np.testing.assert_allclose((c1 + c2)(z, u, 0, False, encoding), v1 + v2,
                               rtol=1e-6)
    np.testing.assert_allclose((c1 - c2)(z, u, 0, False, encoding), v1 - v2,
                               rtol=1e-6)
    np.testing.assert_allclose((c1 * c2)(z, u, 0, False, encoding), v1 * v2,
                               rtol=1e-6)
    np.testing.assert_allclose((c1 / c2)(z, u, 0, False, encoding), v1 / v2,
                               rtol=1e-6)
    np.testing.assert_allclose((c1 * 3.0)(z, u, 0, False, encoding), 3 * v1,
                               rtol=1e-6)
    np.testing.assert_allclose((-c1)(z, u, 0, False, encoding), -v1,
                               rtol=1e-6)
    np.testing.assert_allclose((c1**2.0)(z, u, 0, False, encoding), v1**2,
                               rtol=1e-6)


def test_aggregate_cost_is_jittable():
    Q, R, _, _ = _setup()
    c = QRCost(Q, R) + 0.5 * QRCost(Q, R)
    encoding = StateEncoding.IGNORE_UNCERTAINTY

    @jax.jit
    def f(cost, z, u):
        return cost(z, u, 0, False, encoding)

    out = f(c, jnp.zeros(3), jnp.zeros(2))
    assert jnp.isfinite(out)


class _NoFastPath:
    """Wrapper hiding eval_derivatives so eval_cost uses autodiff."""

    def __init__(self, cost):
        self._cost = cost

    def __call__(self, *args, **kwargs):
        return self._cost(*args, **kwargs)


@pytest.mark.parametrize("terminal", [False, True])
def test_analytic_qr_derivatives_match_autodiff(terminal):
    """The closed-form augmented-QR local model (the solver's hot path
    under IGNORE_UNCERTAINTY) must agree with grad-of-grad exactly."""
    from pddp_tpu.examples.cartpole import CartpoleCost
    from pddp_tpu.examples.double_cartpole import DoubleCartpoleCost
    from pddp_tpu.examples.pendulum import PendulumCost
    from pddp_tpu.examples.rendezvous import RendezvousCost
    from pddp_tpu.utils.evaluation import eval_cost

    enc = StateEncoding.IGNORE_UNCERTAINTY
    key = jax.random.PRNGKey(0)
    cases = [(PendulumCost(), 2, 1), (CartpoleCost(), 4, 1),
             (DoubleCartpoleCost(), 6, 1), (RendezvousCost(), 8, 4)]
    for cost, nx, nu in cases:
        z = jax.random.normal(jax.random.fold_in(key, nx), (nx,),
                              jnp.float64)
        u = None if terminal else jax.random.normal(key, (nu,), jnp.float64)
        fast = cost.eval_derivatives(z, u, 3, terminal=terminal,
                                     encoding=enc)
        assert fast is not None
        slow = eval_cost(_NoFastPath(cost), z, u, 3, terminal=terminal,
                         encoding=enc)
        for a, b in zip(fast, slow):
            if a is None:
                assert b is None
                continue
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-12, atol=1e-12)


def test_analytic_fast_path_declines_uncertainty_encodings():
    from pddp_tpu.examples.cartpole import CartpoleCost
    cost = CartpoleCost()
    z = jnp.zeros(8)
    out = cost.eval_derivatives(z, jnp.zeros(1), 0, terminal=False,
                                encoding=StateEncoding.VARIANCE_ONLY)
    assert out is None
