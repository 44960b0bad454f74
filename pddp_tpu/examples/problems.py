"""Sample problem registry.

Parity: /root/reference/pddp/examples/problems.py:21-90 — an enum of
canonical (env, cost, model) triples for quick experiment setup.
"""

from __future__ import annotations

from enum import IntEnum

from . import cartpole, double_cartpole, pendulum, rendezvous

__all__ = ["SampleProblems"]


class SampleProblems(IntEnum):
    """Sample problem enum."""

    CARTPOLE = 1
    DOUBLE_CARTPOLE = 2
    PENDULUM = 3
    RENDEZVOUS = 4

    def setup(self, dt, render=False, seed=0, **kwargs):
        """Sets up an example problem.

        Returns:
            Tuple (env, cost, model).
        """
        env_class = self.get_env_class()
        cost_class = self.get_cost_class()
        model_class = self.get_model_class()

        model = model_class(dt=dt, **kwargs)
        cost = cost_class()
        env = env_class(dt=dt, model=model_class(dt=dt, **kwargs),
                        render=render, seed=seed)
        return env, cost, model

    def get_env_class(self):
        return {
            SampleProblems.CARTPOLE: cartpole.CartpoleEnv,
            SampleProblems.DOUBLE_CARTPOLE: double_cartpole.DoubleCartpoleEnv,
            SampleProblems.PENDULUM: pendulum.PendulumEnv,
            SampleProblems.RENDEZVOUS: rendezvous.RendezvousEnv,
        }[self]

    def get_cost_class(self):
        return {
            SampleProblems.CARTPOLE: cartpole.CartpoleCost,
            SampleProblems.DOUBLE_CARTPOLE: double_cartpole.DoubleCartpoleCost,
            SampleProblems.PENDULUM: pendulum.PendulumCost,
            SampleProblems.RENDEZVOUS: rendezvous.RendezvousCost,
        }[self]

    def get_model_class(self):
        return {
            SampleProblems.CARTPOLE: cartpole.CartpoleDynamicsModel,
            SampleProblems.DOUBLE_CARTPOLE:
                double_cartpole.DoubleCartpoleDynamicsModel,
            SampleProblems.PENDULUM: pendulum.PendulumDynamicsModel,
            SampleProblems.RENDEZVOUS: rendezvous.RendezvousDynamicsModel,
        }[self]
