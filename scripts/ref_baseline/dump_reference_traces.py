"""Dump seeded head-to-head traces from the torch reference's own solver.

Runs the reference's ``iLQRController.fit``
(/root/reference/pddp/controllers/ilqr.py:237-316) on FIXED inputs —
fixed z0 (no env reset noise), fixed stored U0, ``tol=0`` (no early
convergence) — and records the complete per-eval trace: one
``on_iteration`` callback fires per backward+line-search attempt
(ilqr.py:213-233), giving the exact (state, J_opt) sequence including
regularization retries, plus Z/U snapshots at every accepted iteration.

tests/controllers/test_reference_headtohead.py replays the SAME inputs
through this framework's ``solve`` and pins the sequences against each
other — superseding the wide unseeded-notebook bands in
test_reference_parity.py (round-2 verdict item 2).

Configs mirror the known-dynamics notebooks
(notebooks/known_dynamics/*.ipynb: pendulum N=40 dt=0.1 |u|<=2.5,
cartpole N=25 dt=0.1 |u|<=10, double_cartpole N=50 dt=0.05 |u|<=20),
plus unconstrained variants and the bench H=200 cartpole config.

Usage: python scripts/ref_baseline/dump_reference_traces.py \
           [--out tests/golden/reference_traces.json]
"""

from __future__ import annotations

import argparse
import json
import platform
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent
sys.path.insert(0, str(HERE / "gym_stub"))
sys.path.insert(0, "/root/reference")
sys.path.insert(0, str(HERE))

import torch  # noqa: E402

import torch04_compat  # noqa: E402

torch04_compat.install()
torch.set_flush_denormal(True)

import pddp  # noqa: E402
from pddp.examples.cartpole import (CartpoleCost,  # noqa: E402
                                    CartpoleDynamicsModel)
from pddp.examples.double_cartpole import (  # noqa: E402
    DoubleCartpoleCost, DoubleCartpoleDynamicsModel)
from pddp.examples.pendulum import (PendulumCost,  # noqa: E402
                                    PendulumDynamicsModel)
from pddp.examples.rendezvous import (RendezvousCost,  # noqa: E402
                                      RendezvousDynamicsModel)
from pddp.utils.encoding import StateEncoding  # noqa: E402
from pddp.utils.gaussian_variable import GaussianVariable  # noqa: E402

PROBLEMS = {
    "pendulum": (PendulumDynamicsModel, PendulumCost),
    "cartpole": (CartpoleDynamicsModel, CartpoleCost),
    "double_cartpole": (DoubleCartpoleDynamicsModel, DoubleCartpoleCost),
    "rendezvous": (RendezvousDynamicsModel, RendezvousCost),
}

# (name, problem, N, dt, z0 mean, U0 spec, u_max or None, n_iterations)
# z0 values are FIXED (no reset noise); mild asymmetries avoid starting
# exactly on an unstable equilibrium. U0 "randn:<seed>:<scale>" draws
# from torch.manual_seed(<seed>) and is stored verbatim in the dump, so
# the JAX side replays the identical numbers.
CONFIGS = [
    ("pendulum_constrained", "pendulum", 40, 0.1, [0.0, 0.0],
     "randn:11:0.1", 2.5, 15),
    ("pendulum_free", "pendulum", 40, 0.1, [0.1, 0.0],
     "randn:12:0.5", None, 10),
    ("cartpole_constrained", "cartpole", 25, 0.1, [0.0, 0.0, 0.1, 0.0],
     "randn:13:0.1", 10.0, 15),
    ("cartpole_free_h200", "cartpole", 200, 0.05, [0.0, 0.0, 0.1, 0.0],
     "ones:0.1", None, 10),
    # Scale 0.1: at randn scale 0.5 the REFERENCE ITSELF diverges (an
    # accepted iterate's next forward rollout reaches inf, then
    # Q_uu.eig raises on NaNs — the chaotic double pendulum is that
    # sensitive); head-to-head needs a trace the reference completes.
    ("double_cartpole_constrained", "double_cartpole", 50, 0.05,
     [0.0, 0.0, 0.05, 0.0, -0.05, 0.0], "randn:14:0.1", 20.0, 10),
    ("double_cartpole_free", "double_cartpole", 50, 0.05,
     [0.0, 0.0, 0.05, 0.0, -0.05, 0.0], "randn:15:0.2", None, 8),
    # The notebook config (rendezvous.ipynb: N=200, DT=0.1) from the
    # reference env's reset state (env.py:107). Dumped in f64 (the one
    # per-config dtype override): the open-loop J0 is ~1.5e19, so in f32
    # the reference's optimization path is roundoff-dominated — it crawls
    # through 10 accepted iterations while any f64 solver jumps to the
    # optimum of this LINEAR-quadratic problem in ~1 step (measured
    # 2026-08-21: per-step dynamics agree to 2e-7 yet the f32 path
    # diverges structurally). In f64 the reference's own path is
    # well-defined and the Q-coupled head-to-head is meaningful.
    ("rendezvous", "rendezvous", 200, 0.1,
     [-10.0, -10.0, 10.0, 10.0, 0.0, -5.0, 5.0, 0.0],
     "randn:16:0.1", None, 10, "f64"),
]


class _FixedStateEnv(object):
    """fit() only calls env.get_state() (ilqr.py:285); zero variance so
    z0 is exactly the given mean under IGNORE_UNCERTAINTY."""

    def __init__(self, mean):
        self._mean = mean

    def get_state(self):
        return GaussianVariable(self._mean, var=torch.zeros_like(self._mean))


def _make_u0(spec, N, action_size):
    if spec.startswith("randn:"):
        _, seed, scale = spec.split(":")
        torch.manual_seed(int(seed))
        return float(scale) * torch.randn(N, action_size)
    if spec.startswith("ones:"):
        return float(spec.split(":")[1]) * torch.ones(N, action_size)
    raise ValueError(spec)


def run_config(name, problem, N, dt, z0_mean, u0_spec, u_max, n_iterations,
               dtype="f32"):
    prev_dtype = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64 if dtype == "f64"
                            else torch.float32)
    try:
        return _run_config(name, problem, N, dt, z0_mean, u0_spec, u_max,
                           n_iterations, dtype)
    finally:
        torch.set_default_dtype(prev_dtype)


def _run_config(name, problem, N, dt, z0_mean, u0_spec, u_max, n_iterations,
                dtype):
    model_cls, cost_cls = PROBLEMS[problem]
    model = model_cls(dt)
    cost = cost_cls()
    env = _FixedStateEnv(torch.tensor(z0_mean))
    ctrl = pddp.controllers.iLQRController(env, model, cost)
    U0 = _make_u0(u0_spec, N, model.action_size)

    evals = []
    accepted = []

    def on_iteration(i, state, Z, U, J_opt):
        evals.append({"i": int(i), "state": state.name,
                      "J": float(J_opt)})
        if state.name in ("ACCEPTED", "CONVERGED") and N <= 50:
            accepted.append({"i": int(i),
                             "Z": Z.numpy().tolist(),
                             "U": U.numpy().tolist()})

    t0 = time.perf_counter()
    Z, U, state = ctrl.fit(
        U0.clone(), encoding=StateEncoding.IGNORE_UNCERTAINTY,
        n_iterations=n_iterations, tol=0.0, quiet=True,
        on_iteration=on_iteration,
        u_min=None if u_max is None else torch.tensor([-u_max]),
        u_max=None if u_max is None else torch.tensor([u_max]))
    wall = time.perf_counter() - t0

    print(f"{name}: {len(evals)} evals, "
          f"J {evals[0]['J']:.4f} -> {evals[-1]['J']:.4f}, "
          f"final {state.name}, {wall:.1f}s", file=sys.stderr)
    return {
        "config": {
            "problem": problem, "N": N, "dt": dt,
            "encoding": "IGNORE_UNCERTAINTY",
            "n_iterations": n_iterations, "tol": 0.0,
            "u_max": u_max, "dtype": dtype,
        },
        "z0": z0_mean,
        "U0": U0.numpy().tolist(),
        "evals": evals,
        "accepted": accepted,
        "Z_final": None if Z is None else Z.detach().numpy().tolist(),
        "U_final": None if U is None else U.detach().numpy().tolist(),
        "final_state": state.name,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=str(
        Path(__file__).resolve().parents[2] / "tests" / "golden" /
        "reference_traces.json"))
    parser.add_argument("--only", default=None,
                        help="run a single named config")
    args = parser.parse_args()

    traces = {}
    if args.only and Path(args.out).exists():
        # Merge mode: --only re-dumps one config in place of clobbering
        # the other traces.
        traces = json.loads(Path(args.out).read_text())["traces"]
    for cfg in CONFIGS:
        if args.only and cfg[0] != args.only:
            continue
        traces[cfg[0]] = run_config(*cfg)

    out = {
        "provenance": {
            "torch": torch.__version__,
            "host": platform.node(),
            "cpu": platform.processor() or platform.machine(),
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
            "generator": "scripts/ref_baseline/dump_reference_traces.py",
        },
        "traces": traces,
    }
    Path(args.out).write_text(json.dumps(out) + "\n")
    print(f"wrote {args.out} ({Path(args.out).stat().st_size} bytes)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
