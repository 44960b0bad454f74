"""Bayesian neural network dynamics models."""

from .losses import gaussian_log_likelihood
from .model import (BNNDynamicsModel, ParticlesBNNDynamicsModel,
                    bnn_dynamics_model_factory, fit_bnn, particles_covar)
from .network import (BayesianMLP, BDropout, CDropout, Linear, TLNDropout,
                      bayesian_mlp)

__all__ = [
    "gaussian_log_likelihood",
    "BNNDynamicsModel",
    "ParticlesBNNDynamicsModel",
    "bnn_dynamics_model_factory",
    "fit_bnn",
    "particles_covar",
    "BayesianMLP",
    "BDropout",
    "CDropout",
    "TLNDropout",
    "Linear",
    "bayesian_mlp",
]
