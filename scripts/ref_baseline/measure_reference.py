"""Measure the torch reference's wall-clock on THIS host (CPU).

BASELINE.md prescribes self-measuring the reference on this machine since
upstream publishes no numbers.  The reference cannot import as-is (torch
0.4 LAPACK wrappers, unpackaged ``gym``, py2-era collections ABCs), so
this script installs the sibling shims (torch04_compat.py, gym_stub/) and
drives the reference's OWN ``iLQRController.fit``
(`/root/reference/pddp/controllers/ilqr.py:237-317`) on the two headline
workloads bench.py measures on the TPU:

  * cartpole H=200 known dynamics, IGNORE_UNCERTAINTY (bench
    ``ddp_iteration_ms_cartpole_h200``);
  * BNN cartpole (100 particles, [200,200]) H=25,
    UPPER_TRIANGULAR_CHOLESKY, the reference example's config
    (`/root/reference/examples/cartpole.py:17-23,126-150`) (bench
    ``pddp_bnn_iteration_ms_h25_p100``).

Per-eval time = fit wall-clock / number of ``on_iteration`` callbacks
(one callback per backward+line-search attempt, including the
regularization-retry attempts, which do less work — so this UNDERSTATES
the reference's per-iteration cost; the comparison stays honest).

Usage:  python scripts/ref_baseline/measure_reference.py [--quick]
Prints one JSON line per metric.  Results are recorded in
REF_MEASURED.json at the repo root and discussed in docs/PERFORMANCE.md.
"""

from __future__ import annotations

import argparse
import datetime
import json
import platform
import socket
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
torch.set_flush_denormal(True)  # as the reference examples do

import pddp  # noqa: E402
from pddp.examples.cartpole import (CartpoleCost,
                                    CartpoleDynamicsModel)  # noqa: E402
from pddp.models.bnn import bnn_dynamics_model_factory  # noqa: E402
from pddp.utils.encoding import StateEncoding  # noqa: E402
from pddp.utils.gaussian_variable import GaussianVariable  # noqa: E402


class _FixedStateEnv(object):
    """Env stand-in: fit() only calls env.get_state() (ilqr.py:285)."""

    def __init__(self, mean, var=None):
        self._mean = mean
        self._var = var if var is not None else torch.zeros_like(mean)

    def get_state(self):
        return GaussianVariable(self._mean, var=self._var)


def time_fit(controller, U0, encoding, n_iterations):
    """Run fit() with tol=0 (no early convergence) and count evals."""
    evals = [0]
    costs = []

    def on_iteration(i, state, Z, U, J_opt):
        evals[0] += 1
        costs.append(float(J_opt))

    t0 = time.perf_counter()
    Z, U, state = controller.fit(U0.clone(), encoding=encoding,
                                 n_iterations=n_iterations, tol=0.0,
                                 quiet=True, on_iteration=on_iteration)
    wall = time.perf_counter() - t0
    return {
        "fit_wall_s": round(wall, 3),
        "n_iterations": n_iterations,
        "evals": evals[0],
        "ms_per_eval": round(1e3 * wall / max(evals[0], 1), 3),
        "ms_per_iteration": round(1e3 * wall / n_iterations, 3),
        "J_first": round(costs[0], 4),
        "J_final": round(costs[-1], 4),
        "final_state": state.name,
    }


def measure_ddp(n_iterations):
    """Cartpole H=200 known-dynamics fit (bench.bench_iteration_ms config)."""
    model = CartpoleDynamicsModel(0.05)
    cost = CartpoleCost()
    env = _FixedStateEnv(torch.tensor([0.0, 0.0, 0.1, 0.0]))
    ctrl = pddp.controllers.iLQRController(env, model, cost)
    U0 = 0.1 * torch.ones(200, 1)
    return time_fit(ctrl, U0, StateEncoding.IGNORE_UNCERTAINTY, n_iterations)


def measure_pddp(n_iterations):
    """BNN cartpole H=25 p=100 fit (bench.bench_pddp_iteration_ms config)."""
    model = bnn_dynamics_model_factory(
        4, 1, [200, 200], CartpoleDynamicsModel.angular_indices,
        CartpoleDynamicsModel.non_angular_indices)(n_particles=100)
    model.eval()
    cost = CartpoleCost()
    env = _FixedStateEnv(torch.zeros(4), var=1e-2 * torch.ones(4))
    ctrl = pddp.controllers.iLQRController(
        env, model, cost,
        model_opts={"use_predicted_std": False,
                    "infer_noise_variables": True})
    U0 = 0.1 * torch.ones(25, 1)
    return time_fit(ctrl, U0, StateEncoding.UPPER_TRIANGULAR_CHOLESKY,
                    n_iterations)


def _cpu_model():
    """Human-readable CPU model (Linux /proc/cpuinfo; fallback platform)."""
    try:
        for line in Path("/proc/cpuinfo").read_text().splitlines():
            if line.lower().startswith("model name"):
                return line.split(":", 1)[1].strip()
    except OSError:
        pass
    return platform.processor() or platform.machine()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true",
                        help="fewer iterations (CI smoke)")
    parser.add_argument("--out", default=None,
                        help="also record results to this JSON file "
                             "(e.g. REF_MEASURED.json at the repo root)")
    args = parser.parse_args()
    torch.manual_seed(0)

    # Provenance: the checked-in REF_MEASURED.json is host-specific —
    # speedup_vs_reference_* extras in bench.py silently go stale if the
    # bench runs elsewhere, so record where/when the numbers came from
    # (bench.py echoes these as a reference_measured_on extra). Quick-mode
    # smoke runs are tagged so bench.py never consumes them as a baseline.
    provenance = dict(
        host=socket.gethostname(),
        cpu=_cpu_model(),
        timestamp=datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"),
    )
    if args.quick:
        provenance["quick"] = True

    results = []

    ddp = measure_ddp(3 if args.quick else 25)
    results.append(dict(
        metric="ref_ddp_iteration_ms_cartpole_h200",
        value=ddp["ms_per_eval"], unit="ms", torch=torch.__version__,
        detail=ddp, **provenance))
    print(json.dumps(results[-1]))

    pddp_ = measure_pddp(2 if args.quick else 5)
    results.append(dict(
        metric="ref_pddp_bnn_iteration_ms_h25_p100",
        value=pddp_["ms_per_eval"], unit="ms", torch=torch.__version__,
        detail=pddp_, **provenance))
    print(json.dumps(results[-1]))

    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=2) + "\n")


if __name__ == "__main__":
    main()
