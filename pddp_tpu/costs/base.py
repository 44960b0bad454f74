"""Composable cost functions.

Re-implements /root/reference/pddp/costs/base.py: a ``Cost`` is a callable
pytree mapping (encoded state, action, time index) -> expected scalar cost,
and costs compose through operator overloading into ``AggregateCost`` trees
(reference :25-97, :125-181). The aggregation op is stored as a static
string so the composed cost remains a hashable-structure pytree that jits
and vmaps like any other.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from ..encoding import StateEncoding
from ..struct import pytree_dataclass, static_field

__all__ = ["Cost", "AggregateCost"]

_OPS = {
    "add": jnp.add,
    "sub": jnp.subtract,
    "mul": jnp.multiply,
    "div": jnp.divide,
    "pow": jnp.power,
}


class Cost:
    """Base cost function (mixin for pytree dataclasses).

    Subclasses implement ``__call__(z, u, i, terminal, encoding)`` returning
    the expectation of the cost, broadcasting over leading batch dims.
    """

    def __call__(self, z, u, i, terminal=False,
                 encoding: StateEncoding = StateEncoding.DEFAULT, **kwargs):
        raise NotImplementedError

    # -- cost algebra (reference costs/base.py:25-97) ------------------------

    def __add__(self, other):
        return AggregateCost(self, other, op="add")

    def __radd__(self, other):
        return AggregateCost(other, self, op="add")

    def __sub__(self, other):
        return AggregateCost(self, other, op="sub")

    def __rsub__(self, other):
        return AggregateCost(other, self, op="sub")

    def __mul__(self, other):
        return AggregateCost(self, other, op="mul")

    def __rmul__(self, other):
        return AggregateCost(other, self, op="mul")

    def __truediv__(self, other):
        return AggregateCost(self, other, op="div")

    def __rtruediv__(self, other):
        return AggregateCost(other, self, op="div")

    def __pow__(self, other):
        return AggregateCost(self, other, op="pow")

    def __neg__(self):
        return AggregateCost(self, -1.0, op="mul")


@pytree_dataclass
class AggregateCost(Cost):
    """Pointwise combination of two costs (or a cost and a scalar).

    E[L(x, u)] = op(E[L_1(x, u)], E[L_2(x, u)])   (reference :125-181)
    """

    first: Any
    second: Any
    op: str = static_field(default="add")

    def __call__(self, z, u, i, terminal=False,
                 encoding: StateEncoding = StateEncoding.DEFAULT, **kwargs):
        if isinstance(self.first, Cost):
            first = self.first(z, u, i, terminal, encoding, **kwargs)
        else:
            first = self.first
        if isinstance(self.second, Cost):
            second = self.second(z, u, i, terminal, encoding, **kwargs)
        else:
            second = self.second
        return _OPS[self.op](first, second)
