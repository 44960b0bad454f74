"""Dynamics models."""

from . import bnn
from .base import DynamicsModel

__all__ = ["DynamicsModel", "bnn"]
