"""Cost-algebra tests (mirrors reference tests/costs/test_aggregate.py:
op(cost1, cost2)(z,u,i) == op(cost1(z,u,i), cost2(z,u,i)))."""

import jax.numpy as jnp
import numpy as np
import pytest

from pddp_tpu.costs.base import AggregateCost, Cost
from pddp_tpu.costs.quadratic import QRCost
from pddp_tpu.encoding import StateEncoding, infer_encoded_state_size

ENCODINGS = [
    StateEncoding.IGNORE_UNCERTAINTY,
    StateEncoding.VARIANCE_ONLY,
    StateEncoding.UPPER_TRIANGULAR_CHOLESKY,
]

N = 3
M = 2


def _costs():
    Q1 = jnp.eye(N)
    Q2 = 2.0 * jnp.eye(N)
    R = 0.1 * jnp.eye(M)
    return QRCost(Q=Q1, R=R), QRCost(Q=Q2, R=3.0 * R)


def _zu(encoding):
    nz = infer_encoded_state_size(N, encoding)
    z = 0.1 * jnp.arange(1.0, nz + 1).at[N:].add(0.4)
    u = jnp.array([0.2, -0.3])
    return z, u


@pytest.mark.parametrize("encoding", ENCODINGS)
@pytest.mark.parametrize("op,fn", [
    ("add", np.add),
    ("sub", np.subtract),
    ("mul", np.multiply),
    ("div", np.divide),
])
def test_binary_ops_match_pointwise(encoding, op, fn):
    c1, c2 = _costs()
    z, u = _zu(encoding)
    agg = {
        "add": c1 + c2,
        "sub": c1 - c2,
        "mul": c1 * c2,
        "div": c1 / c2,
    }[op]
    assert isinstance(agg, AggregateCost)
    expected = fn(float(c1(z, u, 0, False, encoding)),
                  float(c2(z, u, 0, False, encoding)))
    np.testing.assert_allclose(float(agg(z, u, 0, False, encoding)),
                               expected, rtol=1e-6)


@pytest.mark.parametrize("encoding", ENCODINGS)
def test_scalar_ops(encoding):
    c1, _ = _costs()
    z, u = _zu(encoding)
    v = float(c1(z, u, 0, False, encoding))

    np.testing.assert_allclose(
        float((2.0 * c1)(z, u, 0, False, encoding)), 2.0 * v, rtol=1e-6)
    np.testing.assert_allclose(
        float((c1 + 1.5)(z, u, 0, False, encoding)), v + 1.5, rtol=1e-6)
    np.testing.assert_allclose(
        float((1.5 + c1)(z, u, 0, False, encoding)), 1.5 + v, rtol=1e-6)
    np.testing.assert_allclose(
        float((c1 ** 2)(z, u, 0, False, encoding)), v**2, rtol=1e-6)
    np.testing.assert_allclose(
        float((-c1)(z, u, 0, False, encoding)), -v, rtol=1e-6)
    np.testing.assert_allclose(
        float((1.0 - c1)(z, u, 0, False, encoding)), 1.0 - v, rtol=1e-6)
    np.testing.assert_allclose(
        float((c1 / 2.0)(z, u, 0, False, encoding)), v / 2.0, rtol=1e-6)


def test_nested_aggregate_is_pytree():
    """Nested cost expressions jit/vmap as ordinary pytrees."""
    import jax

    c1, c2 = _costs()
    agg = 2.0 * c1 + c2 / 4.0 - 1.0
    encoding = StateEncoding.VARIANCE_ONLY
    z, u = _zu(encoding)

    leaves = jax.tree_util.tree_leaves(agg)
    assert len(leaves) > 0

    f = jax.jit(lambda c, z, u: c(z, u, 0, False, encoding))
    expected = (2.0 * float(c1(z, u, 0, False, encoding))
                + float(c2(z, u, 0, False, encoding)) / 4.0 - 1.0)
    np.testing.assert_allclose(float(f(agg, z, u)), expected, rtol=1e-6)


def test_terminal_flag_propagates():
    c1, c2 = _costs()
    agg = c1 + c2
    encoding = StateEncoding.IGNORE_UNCERTAINTY
    z, _ = _zu(encoding)
    term = float(agg(z, None, 5, True, encoding))
    expected = (float(c1(z, None, 5, True, encoding))
                + float(c2(z, None, 5, True, encoding)))
    np.testing.assert_allclose(term, expected, rtol=1e-6)
