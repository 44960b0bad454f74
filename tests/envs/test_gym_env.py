"""GymEnv adapter tests against a duck-typed fake gym environment (no gym
dependency in this image; the adapter only relies on the space protocol —
reference gym_env.py:148-222)."""

import numpy as np
import jax.numpy as jnp

from pddp_tpu.envs.gym_env import GymEnv
from pddp_tpu.gaussian_variable import GaussianVariable


class _Box:
    def __init__(self, low, high, shape, dtype=np.float32):
        self.low = np.full(shape, low, dtype)
        self.high = np.full(shape, high, dtype)
        self.shape = shape
        self.dtype = dtype


class _FakeGymEnv:
    """Minimal gym.Env protocol: double-integrator."""

    def __init__(self):
        self.action_space = _Box(-2.0, 2.0, (1,))
        self.observation_space = _Box(-np.inf, np.inf, (2,))
        self._x = np.zeros(2, np.float64)
        self.closed = False
        self.last_action = None

    def step(self, action):
        self.last_action = action
        self._x = self._x + np.array([self._x[1], float(action[0])]) * 0.1
        return self._x.copy(), 0.0, False, {}

    def reset(self):
        self._x = np.array([0.5, -0.5])
        return self._x.copy()

    def close(self):
        self.closed = True


def test_sizes_from_spaces():
    env = GymEnv(_FakeGymEnv())
    assert env.action_size == 1
    assert env.state_size == 2


def test_reset_and_get_state():
    env = GymEnv(_FakeGymEnv())
    s = env.get_state()
    assert isinstance(s, GaussianVariable)
    np.testing.assert_allclose(s.mean(), [0.5, -0.5])
    np.testing.assert_allclose(s.var(), [1e-2, 1e-2])


def test_apply_converts_and_clamps_actions():
    fake = _FakeGymEnv()
    env = GymEnv(fake)
    env.apply(jnp.array([5.0]))  # beyond the space bound of 2.0
    assert isinstance(fake.last_action, np.ndarray)
    assert fake.last_action.dtype == np.float32
    np.testing.assert_allclose(fake.last_action, [2.0])  # clamped

    s = env.get_state()
    np.testing.assert_allclose(s.mean(), fake._x, rtol=1e-6)


def test_close_propagates():
    fake = _FakeGymEnv()
    env = GymEnv(fake)
    env.close()
    assert fake.closed


def test_gymnasium_tuple_reset():
    class _Gymnasium(_FakeGymEnv):
        def reset(self):
            return super().reset(), {"info": 1}

    env = GymEnv(_Gymnasium())
    np.testing.assert_allclose(env.get_state().mean(), [0.5, -0.5])
