"""classproperty descriptor (parity: reference pddp/utils/classproperty.py).

In this framework sizes are plain class attributes on the pytree model
classes (models/base.py:41-44), so the descriptor is rarely needed — it is
provided for users porting reference-style models whose ``state_size`` /
``action_size`` are computed classproperties (e.g.
/root/reference/pddp/examples/pendulum/model.py:62-70).
"""

from __future__ import annotations

__all__ = ["classproperty"]


class classproperty(property):
    """A property accessible on the class itself.

    Usage::

        class Model:
            @classproperty
            def state_size(cls):
                return 2
    """

    def __get__(self, obj, objtype=None):
        return super().__get__(objtype)

    def __set__(self, obj, value):
        raise AttributeError("can't set classproperty")
