"""Utility modules (lazily imported to avoid circular imports with the
encoding core, which itself depends on utils.linalg)."""

import importlib

_SUBMODULES = (
    "angular",
    "autodiff",
    "classproperty",
    "compilation_cache",
    "checkpoint",
    "constraint",
    "evaluation",
    "linalg",
    "particles",
    "profiling",
    "trajectory",
)

__all__ = list(_SUBMODULES)


def __getattr__(name):
    if name in _SUBMODULES:
        return importlib.import_module("." + name, __name__)
    raise AttributeError("module {!r} has no attribute {!r}".format(
        __name__, name))
