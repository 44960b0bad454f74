"""Environments."""

from .base import Env, SimEnv
from .gym_env import GymEnv

__all__ = ["Env", "SimEnv", "GymEnv"]
