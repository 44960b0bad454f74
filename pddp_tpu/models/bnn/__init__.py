"""Bayesian neural network dynamics models."""

from .losses import gaussian_log_likelihood
from .model import (BNNDynamicsModel, ParticlesBNNDynamicsModel,
                    bnn_dynamics_model_factory, fit_bnn, load_bnn_npz,
                    particles_covar, save_bnn_npz)
from .network import (BayesianMLP, BDropout, CDropout, Linear, TLNDropout,
                      bayesian_mlp)

# Reference-name aliases (pddp/models/bnn/__init__.py exports BSequential
# and bayesian_model; the pytree re-design renamed them).
BSequential = BayesianMLP
bayesian_model = bayesian_mlp

__all__ = [
    "BSequential",
    "bayesian_model",
    "gaussian_log_likelihood",
    "BNNDynamicsModel",
    "ParticlesBNNDynamicsModel",
    "bnn_dynamics_model_factory",
    "fit_bnn",
    "save_bnn_npz",
    "load_bnn_npz",
    "particles_covar",
    "BayesianMLP",
    "BDropout",
    "CDropout",
    "TLNDropout",
    "Linear",
    "bayesian_mlp",
]
