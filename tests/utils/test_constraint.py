"""Constraint tests (mirrors reference tests/utils/test_constraint.py:
boxqp solutions within bounds + valid result codes, tanh constrain within
bounds and differentiable); adds a QP correctness check vs a projected
reference solution and a vmap batching check."""

import jax
import jax.numpy as jnp
import numpy as np

from pddp_tpu.utils.constraint import boxqp, clamp, constrain


def test_constrain_within_bounds_and_differentiable():
    u = jnp.linspace(-5.0, 5.0, 11)
    lo, hi = -2.0, 3.0
    out = constrain(u, lo, hi)
    assert bool(jnp.all(out >= lo)) and bool(jnp.all(out <= hi))
    g = jax.grad(lambda x: constrain(x, lo, hi).sum())(u)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_clamp():
    u = jnp.array([-3.0, 0.5, 9.0])
    np.testing.assert_allclose(clamp(u, -1.0, 1.0),
                               jnp.array([-1.0, 0.5, 1.0]))


def _rand_qp(key, n):
    k1, k2 = jax.random.split(key)
    A = jax.random.normal(k1, (n, n))
    Q = A @ A.T + 0.5 * jnp.eye(n)
    c = jax.random.normal(k2, (n,))
    return Q, c


def test_boxqp_unconstrained_equals_newton():
    """With wide bounds the solution is the Newton point -Q^{-1} c."""
    Q, c = _rand_qp(jax.random.PRNGKey(0), 3)
    lo = -1e3 * jnp.ones(3)
    hi = 1e3 * jnp.ones(3)
    res = boxqp(jnp.zeros(3), Q, c, lo, hi)
    np.testing.assert_allclose(res.x, -jnp.linalg.solve(Q, c), atol=1e-6)
    assert int(res.result) >= 1


def test_boxqp_respects_bounds_and_optimality():
    Q, c = _rand_qp(jax.random.PRNGKey(1), 4)
    lo = -0.1 * jnp.ones(4)
    hi = 0.1 * jnp.ones(4)
    res = boxqp(jnp.zeros(4), Q, c, lo, hi)
    assert bool(jnp.all(res.x >= lo - 1e-9))
    assert bool(jnp.all(res.x <= hi + 1e-9))
    assert int(res.result) >= 1

    # KKT check: on free dims gradient ~ 0; on clamped dims it pushes out.
    g = Q @ res.x + c
    free = np.asarray(res.free)
    assert np.all(np.abs(np.asarray(g)[free]) < 1e-5)

    # Also beats random feasible points.
    def f(x):
        return 0.5 * x @ Q @ x + x @ c

    key = jax.random.PRNGKey(2)
    xs = jax.random.uniform(key, (64, 4), minval=-0.1, maxval=0.1)
    assert float(f(res.x)) <= float(jax.vmap(f)(xs).min()) + 1e-8


def test_boxqp_all_clamped():
    Q = jnp.eye(2)
    c = jnp.array([10.0, 10.0])  # pushes x to the lower bound
    res = boxqp(jnp.zeros(2), Q, c, -jnp.ones(2) * 0.5, jnp.ones(2) * 0.5)
    np.testing.assert_allclose(res.x, -0.5 * jnp.ones(2), atol=1e-9)


def test_boxqp_vmap():
    keys = jax.random.split(jax.random.PRNGKey(3), 5)
    Qs, cs = jax.vmap(lambda k: _rand_qp(k, 2))(keys)
    lo = -0.2 * jnp.ones(2)
    hi = 0.2 * jnp.ones(2)
    res = jax.vmap(lambda Q, c: boxqp(jnp.zeros(2), Q, c, lo, hi))(Qs, cs)
    assert res.x.shape == (5, 2)
    assert bool(jnp.all(res.x >= lo - 1e-9))
    assert bool(jnp.all(res.x <= hi + 1e-9))
