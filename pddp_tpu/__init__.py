"""pddp_tpu: TPU-native Probabilistic Differential Dynamic Programming.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
PDDP library (anassinator/pddp): probabilistic trajectory optimization for
systems with unknown dynamics (Pan & Theodorou, NIPS 2014). Dynamics,
costs, and environments are pure jittable functions; derivatives come from
vmapped forward-mode autodiff; the Riccati recursion runs as a lax.scan;
line search, particles, and entire solves batch via vmap and shard over
device meshes.
"""

from .__version__ import __version__
from .encoding import StateEncoding
from .gaussian_variable import GaussianVariable

from . import controllers, costs, envs, examples, models, ops, parallel, utils

__all__ = [
    "__version__",
    "StateEncoding",
    "GaussianVariable",
    "controllers",
    "costs",
    "envs",
    "examples",
    "models",
    "ops",
    "parallel",
    "utils",
]
