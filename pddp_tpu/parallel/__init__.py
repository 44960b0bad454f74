"""Multi-chip scaling utilities."""

from .batch import batched_solve, dp_train_step, make_mesh, replicate

__all__ = ["batched_solve", "dp_train_step", "make_mesh", "replicate"]
