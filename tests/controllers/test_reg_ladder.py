"""Regularization-ladder equivalence: ILQROptions.reg_ladder batches R
consecutive rungs of the Tassa mu schedule (reference ilqr.py:124-145,
:364-390) into one inner step and must accept the FIRST rung the
sequential retry loop would have accepted — the iterates, eval counts,
states, and schedule positions are identical by construction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pddp_tpu.controllers.ilqr import ILQROptions, solve
from pddp_tpu.encoding import StateEncoding, encode
from pddp_tpu.examples.cartpole import CartpoleCost
from pddp_tpu.examples.pendulum import PendulumCost, PendulumDynamicsModel
from pddp_tpu.models.bnn import bnn_dynamics_model_factory
from pddp_tpu.struct import replace


def _solve_pair(model, cost, z0, U0, opts, encoding, ladder):
    r1 = jax.jit(lambda z, u: solve(model, cost, z, u, opts,
                                    encoding=encoding))(z0, U0)
    optsR = replace(opts, reg_ladder=ladder)
    rR = jax.jit(lambda z, u: solve(model, cost, z, u, optsR,
                                    encoding=encoding))(z0, U0)
    return r1, rR


def _assert_equivalent(r1, rR):
    assert int(r1.state) == int(rR.state)
    assert int(r1.iterations) == int(rR.iterations)
    assert int(r1.evals) == int(rR.evals)
    np.testing.assert_allclose(r1.J_opt, rR.J_opt, rtol=1e-9)
    np.testing.assert_allclose(r1.U, rR.U, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(r1.Z, rR.Z, rtol=1e-7, atol=1e-10)
    np.testing.assert_allclose(r1.mu, rR.mu, rtol=1e-9)
    np.testing.assert_allclose(r1.delta, rR.delta, rtol=1e-9)


def _bnn_problem():
    """Untrained BNN on the belief state: lots of rejected evals, so the
    ladder actually spans accept cycles (the bench workload in miniature)."""
    enc = StateEncoding.UPPER_TRIANGULAR_CHOLESKY
    cls = bnn_dynamics_model_factory(4, 1, [24, 24], angular_indices=(2,),
                                     non_angular_indices=(0, 1, 3))
    model = cls.init(jax.random.PRNGKey(0), n_particles=12, horizon=9)
    cost = CartpoleCost()
    z0 = encode(jnp.zeros(4), V=1e-2 * jnp.ones(4), encoding=enc)
    U0 = 0.1 * jnp.ones((8, 1))
    return model, cost, z0, U0, enc


@pytest.mark.proof
@pytest.mark.parametrize("ladder", [3, 4])
def test_ladder_matches_sequential_bnn(ladder):
    model, cost, z0, U0, enc = _bnn_problem()
    opts = ILQROptions(n_iterations=5, max_evals=15)
    r1, rR = _solve_pair(model, cost, z0, U0, opts, enc, ladder)
    _assert_equivalent(r1, rR)
    # The solve must actually have exercised retries for this test to
    # mean anything.
    assert int(r1.evals) > int(r1.iterations)


def test_ladder_matches_sequential_constrained_boxqp():
    model = PendulumDynamicsModel(dt=0.1)
    cost = PendulumCost()
    z0 = jnp.array([0.1, 0.0])
    U0 = 0.2 * jnp.ones((12, 1))
    opts = ILQROptions(n_iterations=6, max_evals=18,
                       u_min=jnp.array([-1.0]), u_max=jnp.array([1.0]))
    r1, rR = _solve_pair(model, cost, z0, U0, opts,
                         StateEncoding.IGNORE_UNCERTAINTY, 3)
    _assert_equivalent(r1, rR)


def test_ladder_matches_sequential_vzz_reg():
    model, cost, z0, U0, enc = _bnn_problem()
    opts = ILQROptions(n_iterations=4, max_evals=12, v_zz_reg=True)
    r1, rR = _solve_pair(model, cost, z0, U0, opts, enc, 4)
    _assert_equivalent(r1, rR)


def test_ladder_budget_truncation_mid_ladder():
    """max_evals lands mid-rung: the ladder must not evaluate rungs the
    sequential loop's budget would have cut off."""
    model, cost, z0, U0, enc = _bnn_problem()
    opts = ILQROptions(n_iterations=5, max_evals=4)
    r1, rR = _solve_pair(model, cost, z0, U0, opts, enc, 3)
    _assert_equivalent(r1, rR)
    assert int(rR.evals) <= 4


def test_ladder_max_reg_terminal():
    """A max_reg low enough that the schedule exhausts: both paths must
    stop at the same eval with state MAX_REG."""
    model, cost, z0, U0, enc = _bnn_problem()
    # mu escalates 1 -> 2 -> 8 -> 64...: max_reg=50 exceeds quickly if
    # nothing accepts; with a real problem some iterations accept first,
    # which is fine — the paths still must agree.
    opts = ILQROptions(n_iterations=8, max_evals=30, max_reg=50.0)
    r1, rR = _solve_pair(model, cost, z0, U0, opts, enc, 4)
    _assert_equivalent(r1, rR)
