"""Environment contracts.

Re-implements /root/reference/pddp/envs/base.py:22-75 with a two-level
design suited to TPU execution:

 * ``Env``: the stateful, host-side contract (apply / get_state / reset /
   close, context-manager support) for API parity with the reference — used
   by the episodic PDDP loop at its host boundary.
 * ``SimEnv``: a pure-function simulator core (``initial_state`` /
   ``step_fn``) that can live *inside* jit/scan, so MPC data collection
   compiles into a single fused program instead of a Python loop crossing
   the host boundary every step (the reference's
   pddp.py:226-232 per-step gym round-trip).
"""

from __future__ import annotations

import abc

import jax
import jax.numpy as jnp

from ..gaussian_variable import GaussianVariable

__all__ = ["Env", "SimEnv"]


class Env(abc.ABC):
    """Base stateful environment (parity: reference envs/base.py:22-75)."""

    def __enter__(self):
        return self

    def __exit__(self, exc_type, value, traceback):
        self.close()

    @property
    @abc.abstractmethod
    def action_size(self):
        """Action size (int)."""

    @property
    @abc.abstractmethod
    def state_size(self):
        """State size (int)."""

    @abc.abstractmethod
    def apply(self, u):
        """Applies an action to the environment."""

    @abc.abstractmethod
    def get_state(self, var=1e-2) -> GaussianVariable:
        """Current state as a Gaussian with observation-noise prior `var`."""

    @abc.abstractmethod
    def reset(self):
        """Resets the environment."""

    def close(self):
        """Stops the current environment session."""


class SimEnv(Env):
    """Simulator environment wrapping a ground-truth dynamics model.

    The reference's example envs wrap gym.Env shells whose ``step`` calls
    the analytic model with IGNORE_UNCERTAINTY (e.g.
    pendulum/env.py:99-112); here the simulator *is* the pure function, and
    the gym shell disappears. Subclasses define ``reset_mean`` (and
    optionally override ``step_fn``).

    The stateful Env API is a thin host-side convenience over the pure
    core; the pure core (`initial_state`, `step_fn`) is what jitted
    collection loops use.
    """

    #: per-reset Gaussian init noise std (reference env.py:110-113 patterns)
    reset_noise: float = 1e-2

    def __init__(self, model, dt=None, seed=0):
        self.model = model
        self.dt = dt if dt is not None else getattr(model, "dt", None)
        self._key = jax.random.PRNGKey(seed)
        self._step_jit = jax.jit(self.step_fn)
        self.reset()

    # -- pure functional core ------------------------------------------------

    @property
    def reset_mean(self):
        """Mean initial state (Array<state_size>)."""
        return jnp.zeros(self.model.state_size)

    def initial_state(self, key):
        """Pure reset: initial state sample for a PRNG key."""
        mean = self.reset_mean
        noise = self.reset_noise * jax.random.normal(
            key, mean.shape, dtype=jnp.result_type(float))
        return mean + noise

    def step_fn(self, x, u):
        """Pure step: ground-truth next state (mean dynamics)."""
        from ..encoding import StateEncoding
        return self.model(x, u, 0, encoding=StateEncoding.IGNORE_UNCERTAINTY)

    # -- stateful Env API ----------------------------------------------------

    @property
    def action_size(self):
        return self.model.action_size

    @property
    def state_size(self):
        return self.model.state_size

    def apply(self, u):
        self._x = self._step_jit(self._x, jnp.asarray(u))

    def get_state(self, var=1e-2) -> GaussianVariable:
        return GaussianVariable(self._x, _var=var * jnp.ones_like(self._x))

    def reset(self):
        self._key, sub = jax.random.split(self._key)
        self._x = self.initial_state(sub)

    def close(self):
        pass
