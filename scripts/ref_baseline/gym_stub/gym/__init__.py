"""Import-time stand-in for the legacy ``gym`` package.

The reference (``/root/reference/pddp/envs/gym_env.py:17`` and the
``pddp/examples/*/env.py`` modules) imports ``gym`` at module scope, so
``import pddp`` fails without it.  gym is not installed in this image and
the benchmark never steps an environment — this stub provides just enough
surface (``gym.Env``, ``gym.spaces``, ``gym.utils.seeding``) to satisfy
those imports.  It is used ONLY by scripts/ref_baseline/measure_reference.py
and is never importable from the repo's own package.
"""

from . import spaces, utils


class Env(object):
    """Minimal gym.Env contract (step/reset/render/close/seed)."""

    metadata = {"render.modes": []}
    reward_range = (-float("inf"), float("inf"))
    action_space = None
    observation_space = None

    def step(self, action):
        raise NotImplementedError

    def reset(self):
        raise NotImplementedError

    def render(self, mode="human"):
        raise NotImplementedError

    def close(self):
        pass

    def seed(self, seed=None):
        return [seed]


__all__ = ["Env", "spaces", "utils"]
