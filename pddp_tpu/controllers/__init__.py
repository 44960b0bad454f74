"""Controllers."""

from .base import Controller
from .ilqr import ILQROptions, ILQRResult, iLQRController, iLQRState
from .pddp import PDDPController

__all__ = [
    "Controller",
    "ILQROptions",
    "ILQRResult",
    "iLQRController",
    "iLQRState",
    "PDDPController",
]
