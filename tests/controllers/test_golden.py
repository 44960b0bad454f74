"""Golden-trajectory regression tests.

Deterministic f64 solves (fixed z0, fixed seed, no env noise) pinned
against stored trajectories (tests/golden/solver_trajectories.npz) — the
cross-refactor safety net the reference approximates with its benchmark
suite (SURVEY §4.7). Coverage includes the unconstrained scan path, the
belief-space (Cholesky-encoded) solve, the constrained boxqp backward,
and the V_zz-regularized recursion (see tests/golden/cases.py).
Regenerate the goldens ONLY for intentional algorithmic changes:

    python tests/golden/regenerate.py
"""

import os

import numpy as np
import pytest

from pddp_tpu.controllers.ilqr import solve
from tests.golden.cases import build_cases, make_solve_args

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "golden",
                      "solver_trajectories.npz")


# One representative golden (the belief-space Cholesky-encoded solve) is
# included in the fast -m proof subset; the rest run in the full suite.
_PROOF_CASE = "pendulum_chol"


@pytest.mark.parametrize("name", [
    pytest.param(n, marks=(pytest.mark.proof,) if n == _PROOF_CASE else ())
    for n in sorted(build_cases())
])
def test_solver_matches_golden(name):
    model, cost, z0, U0, opts, enc = make_solve_args(name)
    r = solve(model, cost, z0, U0, opts, encoding=enc)

    g = np.load(GOLDEN)
    np.testing.assert_allclose(float(r.J_opt), g[name + "_J"], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(r.Z), g[name + "_Z"], rtol=1e-5,
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(r.U), g[name + "_U"], rtol=1e-5,
                               atol=1e-7)
    if opts.u_min is not None:
        assert np.all(np.asarray(r.U) <= np.asarray(opts.u_max) + 1e-9)
        assert np.all(np.asarray(r.U) >= np.asarray(opts.u_min) - 1e-9)
