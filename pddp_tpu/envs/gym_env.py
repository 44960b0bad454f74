"""OpenAI Gym adapter (host-side only).

Parity: /root/reference/pddp/envs/gym_env.py:24-222. Gym environments are
impure host objects, so this adapter lives strictly outside jit: it
converts JAX arrays to numpy actions (clamped to the action-space bounds,
reference :100-122) and observations back to arrays. The import of gym is
gated — the framework has no hard gym dependency.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..gaussian_variable import GaussianVariable
from .base import Env

__all__ = ["GymEnv"]


class GymEnv(Env):
    """Wraps any gym.Env behind the framework's Env contract."""

    def __init__(self, gym_env, render=False):
        self._env = gym_env
        self._render = render

        self._action_size = _size_from_space(gym_env.action_space)
        self._action_shape = _shape_from_space(gym_env.action_space)
        self._action_dtype = _dtype_from_space(gym_env.action_space)
        self._action_bounds = _bounds_from_space(gym_env.action_space)
        self._state_size = _size_from_space(gym_env.observation_space)

        self._state = jnp.zeros(self._state_size)
        self.reset()

    @property
    def action_size(self):
        return self._action_size

    @property
    def state_size(self):
        return self._state_size

    def apply(self, u):
        action = _action_from_u(np.asarray(u), self._action_shape,
                                self._action_dtype, self._action_bounds)
        result = self._env.step(action)
        obs = result[0]
        self._state = _state_from_observation(obs)
        if self._render:
            self._env.render()

    def get_state(self, var=1e-2) -> GaussianVariable:
        return GaussianVariable(self._state,
                                _var=var * jnp.ones_like(self._state))

    def reset(self):
        obs = self._env.reset()
        if isinstance(obs, tuple):  # gymnasium returns (obs, info)
            obs = obs[0]
        self._state = _state_from_observation(obs)
        if self._render:
            self._env.render()

    def close(self):
        self._env.close()


def _action_from_u(u, space_shape, space_dtype, space_bounds):
    action = u.reshape(space_shape)
    min_bounds, max_bounds = space_bounds
    action = np.clip(action, min_bounds, max_bounds)
    return action.astype(space_dtype)


def _state_from_observation(obs):
    if isinstance(obs, np.ndarray):
        state = obs.reshape(-1)
    elif isinstance(obs, (int, float, bool)):
        state = np.array([obs])
    else:
        state = np.asarray(obs).reshape(-1)
    return jnp.asarray(state, dtype=jnp.result_type(float))


def _size_from_space(space):
    if hasattr(space, "shape") and space.shape:
        return int(np.prod(space.shape))
    if hasattr(space, "n"):
        return 1
    raise NotImplementedError("Unsupported space: {}".format(space))


def _shape_from_space(space):
    if hasattr(space, "shape") and space.shape is not None:
        return tuple(space.shape)
    return ()


def _dtype_from_space(space):
    if hasattr(space, "dtype"):
        return space.dtype
    return np.float32


def _bounds_from_space(space):
    if hasattr(space, "low") and hasattr(space, "high"):
        return np.asarray(space.low), np.asarray(space.high)
    if hasattr(space, "n"):
        return np.array(0), np.array(space.n - 1)
    raise NotImplementedError("Unsupported space: {}".format(space))
