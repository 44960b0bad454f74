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


#: Reference-layout aliases: the reference exposes these under
#: pddp.utils.* (pddp/utils/__init__.py); this package hoists them to the
#: top level (the z-codec is the universal currency, SURVEY §1), but
#: keeps the old import paths working as real alias modules
#: (utils/encoding.py, utils/gaussian_variable.py).
_TOPLEVEL_ALIASES = ("encoding", "gaussian_variable")

__all__ = __all__ + list(_TOPLEVEL_ALIASES)


def __getattr__(name):
    if name in _SUBMODULES or name in _TOPLEVEL_ALIASES:
        return importlib.import_module("." + name, __name__)
    raise AttributeError("module {!r} has no attribute {!r}".format(
        __name__, name))
