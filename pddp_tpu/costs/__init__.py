"""Cost functions."""

from .base import AggregateCost, Cost
from .quadratic import QRCost, SaturatingQRCost

__all__ = ["AggregateCost", "Cost", "QRCost", "SaturatingQRCost"]
