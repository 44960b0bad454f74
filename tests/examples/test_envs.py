"""Example-env tests (mirrors reference tests/examples/test_envs.py:
Env contract — reset/apply/get_state — plus simulator ground-truth parity)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pddp_tpu.encoding import StateEncoding
from pddp_tpu.examples.problems import SampleProblems
from pddp_tpu.gaussian_variable import GaussianVariable

PROBLEMS = list(SampleProblems)


def _env(problem, seed=0):
    env, cost, model = problem.setup(dt=0.05, seed=seed)
    return env, model


@pytest.mark.parametrize("problem", PROBLEMS)
def test_env_contract(problem):
    env, model = _env(problem)
    assert env.state_size == model.state_size
    assert env.action_size == model.action_size

    s = env.get_state()
    assert isinstance(s, GaussianVariable)
    assert s.mean().shape == (model.state_size,)
    # Observation-noise prior var=1e-2 (reference gym_env.py:75-85).
    np.testing.assert_allclose(s.var(), 1e-2 * np.ones(model.state_size))

    u = 0.1 * jnp.ones(model.action_size)
    env.apply(u)
    s2 = env.get_state()
    assert s2.mean().shape == (model.state_size,)
    assert bool(jnp.all(jnp.isfinite(s2.mean())))


@pytest.mark.parametrize("problem", PROBLEMS)
def test_env_step_matches_ground_truth_model(problem):
    """The env's transition IS the analytic model under IGNORE_UNCERTAINTY
    (reference example envs, e.g. pendulum/env.py:99-112)."""
    env, model = _env(problem)
    x0 = env.get_state().mean()
    u = 0.2 * jnp.ones(model.action_size)
    env.apply(u)
    x1 = env.get_state().mean()
    expected = model(x0, u, 0, encoding=StateEncoding.IGNORE_UNCERTAINTY)
    np.testing.assert_allclose(x1, expected, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("problem", PROBLEMS)
def test_reset_noise_and_determinism(problem):
    """Reset = reset_mean + 1e-2 N(0, I) (reference env.py:110-113), and
    the PRNG stream makes distinct resets distinct."""
    env, model = _env(problem, seed=1)
    x_a = env.get_state().mean()
    env.reset()
    x_b = env.get_state().mean()
    assert not np.allclose(x_a, x_b)
    # Both within a few stds of the documented reset mean.
    mean = env.reset_mean
    assert float(jnp.abs(x_a - mean).max()) < 0.1
    assert float(jnp.abs(x_b - mean).max()) < 0.1


def test_rendezvous_reset_mean():
    """Reference rendezvous/env.py:106-109 start state."""
    env, _ = _env(SampleProblems.RENDEZVOUS)
    expected = jnp.array([-10.0, -10.0, 10.0, 10.0, 0.0, -5.0, 5.0, 0.0])
    np.testing.assert_allclose(env.reset_mean, expected)


def test_env_context_manager():
    env, _ = _env(SampleProblems.PENDULUM)
    with env as e:
        assert e is env
