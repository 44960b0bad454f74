"""TPU-native compute ops: parallel-in-time Riccati, fused kernels."""

from .riccati import parallel_backward

__all__ = ["parallel_backward"]
