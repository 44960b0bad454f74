"""Controllers."""

from .base import Controller
from .ilqr import ILQROptions, ILQRResult, iLQRController, iLQRState

__all__ = [
    "Controller",
    "ILQROptions",
    "ILQRResult",
    "iLQRController",
    "iLQRState",
]
