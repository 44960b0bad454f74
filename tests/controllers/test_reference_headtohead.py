"""Seeded head-to-head parity against the executable torch reference.

tests/golden/reference_traces.json is produced by
scripts/ref_baseline/dump_reference_traces.py, which runs the REFERENCE's
own ``iLQRController.fit`` (/root/reference/pddp/controllers/ilqr.py:
237-316) on fixed z0 (zero reset variance), fixed stored U0, and tol=0,
recording every ``on_iteration`` event (one per backward+line-search
attempt, ilqr.py:213-233) plus the final Z/U.

These tests replay the IDENTICAL inputs through this framework's
``solve`` and pin, per config:

  * the total number of backward+line-search attempts (the retry/reg
    escalation structure — reference _step, ilqr.py:102-181),
  * the number and values of accepted-iteration costs J,
  * the final trajectory Z/U.

This supersedes the wide unseeded-notebook bands in
test_reference_parity.py: here both solvers see the same numbers, so the
remaining spread is torch-f32 vs jax-f64 roundoff. Measured divergence
(2026-08-19, torch 2.13 CPU traces): 5 of 6 trace-mode configs agree to
~1e-6 relative throughout; double_cartpole_constrained — a chaotic
system whose reference trace itself only survives small U0 (see the
dump script) — amplifies f32 roundoff to ~7% J by iteration 9, so its
tolerances are documented per-phase below. The rendezvous config (the
only nu>1, Q-coupled problem) runs in "optimum" mode — the reference's
nu>1 backward is numerically defective there (general-eig inverse on
clustered eigenvalues; full analysis in the SPEC comment), so the pin
is that this solver reaches at-least-as-good a final cost on the same
trajectory, not that it reproduces the reference's crawl.
"""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pddp_tpu.controllers.ilqr import (ILQROptions, default_fit_alphas,
                                       iLQRState, solve)
from pddp_tpu.encoding import StateEncoding
from pddp_tpu.examples.cartpole import CartpoleCost, CartpoleDynamicsModel
from pddp_tpu.examples.double_cartpole import (DoubleCartpoleCost,
                                               DoubleCartpoleDynamicsModel)
from pddp_tpu.examples.pendulum import PendulumCost, PendulumDynamicsModel
from pddp_tpu.examples.rendezvous import (RendezvousCost,
                                          RendezvousDynamicsModel)

TRACES = json.loads(
    (Path(__file__).resolve().parents[1] / "golden" /
     "reference_traces.json").read_text())["traces"]

# The whole module is part of the fast core-claims verification subset
# (-m proof): seeded head-to-head parity IS the core correctness claim.
pytestmark = pytest.mark.proof

PROBLEMS = {
    "pendulum": (PendulumDynamicsModel, PendulumCost),
    "cartpole": (CartpoleDynamicsModel, CartpoleCost),
    "double_cartpole": (DoubleCartpoleDynamicsModel, DoubleCartpoleCost),
    "rendezvous": (RendezvousDynamicsModel, RendezvousCost),
}

# Per-config tolerance spec, set from measured headroom (~10x margin):
#   evals_slack: |attempts_ours - attempts_ref| bound. Attempt counts are
#     integer-exact except cartpole_constrained, where the reference burns
#     3 extra rejections on near-tie candidates (f32 roundoff flips a
#     J_new < J_opt comparison) yet lands on the SAME accepted-J sequence.
#   j_rtol: bound on |J_ours - J_ref|/J_ref over ALL accepted iterations.
#   j_rtol_first2: tighter bound for iterations 0-1, before chaotic
#     amplification can act (meaningful only for double_cartpole).
#   zu_atol: final trajectory max-abs bound (None = skip; the chaotic
#     config's endpoint is not comparable across dtypes).
SPEC = {
    "pendulum_constrained": dict(evals_slack=0, j_rtol=3e-6,
                                 j_rtol_first2=3e-6, zu_atol=3e-5),
    "pendulum_free": dict(evals_slack=0, j_rtol=2e-5, j_rtol_first2=2e-5,
                          zu_atol=3e-5),
    "cartpole_constrained": dict(evals_slack=4, j_rtol=2e-5,
                                 j_rtol_first2=2e-5, zu_atol=5e-3),
    "cartpole_free_h200": dict(evals_slack=2, j_rtol=2e-5,
                               j_rtol_first2=2e-5, zu_atol=2e-3),
    "double_cartpole_constrained": dict(evals_slack=2, j_rtol=0.15,
                                        j_rtol_first2=5e-3, zu_atol=None),
    "double_cartpole_free": dict(evals_slack=2, j_rtol=2e-5,
                                 j_rtol_first2=2e-5, zu_atol=1e-3),
    # Rendezvous (the only nu>1 bundled problem, Q-coupled cost) pins
    # OPTIMUM QUALITY, not the eval trace: the reference's unconstrained
    # nu>1 backward inverts Q_uu through a GENERAL eigendecomposition
    # (torch-0.4 `eig`, /root/reference/pddp/controllers/ilqr.py:633-639),
    # and on this problem Q_uu's eigenvalues are clustered (4x ~0.2002 at
    # the terminal step), where a general eigensolver returns unit-norm
    # but NOT mutually-orthogonal eigenvectors — E diag(1/e) E^T is then
    # a silently wrong inverse. Measured 2026-08-21 (f64 both sides, the
    # dump's one per-config dtype override): the reference's iteration-1
    # gains deviate from the exact recursion by up to 1.4e9 (ours: 7e-7,
    # pinned independently by test_backward_modes' numpy recursion at
    # nu=2), so the reference crawls through 10 regularized accepts
    # (50313 -> 48055.588) while this solver's exact Newton step reaches
    # 48055.478 — BELOW the reference's final cost — in ONE iteration,
    # this problem being linear-quadratic. Pinned: our first accepted
    # cost beats the reference's final cost, same optimum basin, final
    # trajectories match within j_same_basin/z_atol/u_atol.
    "rendezvous": dict(mode="optimum", j_same_basin=1e-3, z_atol=0.02,
                       u_atol=2.0),
}


def _run_ours(trace):
    cfg = trace["config"]
    model_cls, cost_cls = PROBLEMS[cfg["problem"]]
    z0 = jnp.asarray(trace["z0"])
    U0 = jnp.asarray(trace["U0"])
    u_max = cfg["u_max"]
    opts = ILQROptions(
        n_iterations=cfg["n_iterations"], tol=0.0, max_reg=1e10,
        mu_min=1e-6, delta_0=2.0, alphas=default_fit_alphas(U0.dtype),
        u_min=None if u_max is None else jnp.asarray([-u_max]),
        u_max=None if u_max is None else jnp.asarray([u_max]),
        max_evals=300)
    events = []
    res = solve(
        model_cls(dt=cfg["dt"]), cost_cls(), z0, U0, opts,
        encoding=StateEncoding.IGNORE_UNCERTAINTY,
        on_iteration=lambda i, s, Z, U, J: events.append(
            (iLQRState(int(s)).name, float(J))))
    jax.effects_barrier()
    return res, events


@pytest.mark.parametrize("name", sorted(TRACES))
def test_headtohead(name):
    trace, spec = TRACES[name], SPEC[name]
    res, events = _run_ours(trace)

    if spec.get("mode") == "optimum":
        # Optimum-quality comparison (see the SPEC comment: the
        # reference's nu>1 eig-inverse is defective, so its eval path is
        # not a parity target). Our solve must reach a cost at least as
        # good as the reference's final cost, in the same basin, with
        # matching final trajectories.
        ref_final = min(e["J"] for e in trace["evals"]
                        if e["state"] in ("ACCEPTED", "CONVERGED"))
        our_acc = [j for s, j in events if s in ("ACCEPTED", "CONVERGED")]
        assert our_acc, events
        assert float(res.J_opt) <= ref_final * (1 + 1e-9), (
            float(res.J_opt), ref_final)
        # Same basin: not absurdly below the reference's optimum either.
        assert float(res.J_opt) >= ref_final * (1 - spec["j_same_basin"])
        # The exact Newton step converges this LQ problem immediately.
        assert our_acc[0] <= ref_final * (1 + 1e-9), our_acc[0]
        np.testing.assert_allclose(np.asarray(res.Z),
                                   np.asarray(trace["Z_final"]),
                                   atol=spec["z_atol"])
        np.testing.assert_allclose(np.asarray(res.U),
                                   np.asarray(trace["U_final"]),
                                   atol=spec["u_atol"])
        return

    # Retry structure: same number of backward+line-search attempts.
    ref_evals = len(trace["evals"])
    assert abs(int(res.evals) - ref_evals) <= spec["evals_slack"], (
        int(res.evals), ref_evals)

    # Accepted-iteration cost sequence: same length, values within rtol.
    ref_acc = [e["J"] for e in trace["evals"]
               if e["state"] in ("ACCEPTED", "CONVERGED")]
    our_acc = [j for s, j in events if s in ("ACCEPTED", "CONVERGED")]
    assert len(our_acc) == len(ref_acc), (our_acc, ref_acc)
    assert len(ref_acc) > 0
    for it, (ours, ref) in enumerate(zip(our_acc, ref_acc)):
        rtol = spec["j_rtol_first2"] if it < 2 else spec["j_rtol"]
        assert abs(ours - ref) <= rtol * abs(ref), (it, ours, ref)

    # Both must end in the same terminal/accepted state.
    assert iLQRState(int(res.state)).name == trace["final_state"]

    # Final trajectory.
    if spec["zu_atol"] is not None:
        np.testing.assert_allclose(np.asarray(res.U),
                                   np.asarray(trace["U_final"]),
                                   atol=spec["zu_atol"])
        np.testing.assert_allclose(np.asarray(res.Z),
                                   np.asarray(trace["Z_final"]),
                                   atol=spec["zu_atol"])


def test_traces_are_fresh_enough():
    """Guard against silently consuming a stale/quick regeneration: every
    config listed in SPEC must exist in the dump with a non-trivial eval
    trace and provenance."""
    meta = json.loads(
        (Path(__file__).resolve().parents[1] / "golden" /
         "reference_traces.json").read_text())
    assert set(SPEC) == set(meta["traces"])
    assert meta["provenance"]["torch"]
    for name, tr in meta["traces"].items():
        assert len(tr["evals"]) >= 5, name
        assert tr["U_final"] is not None, name
