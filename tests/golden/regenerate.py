"""Regenerates the golden solver trajectories.

Run from the repo root after an INTENTIONAL algorithmic change:

    python tests/golden/regenerate.py

Case definitions live in tests/golden/cases.py (shared with
tests/controllers/test_golden.py).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from pddp_tpu.controllers.ilqr import solve
from tests.golden.cases import build_cases, make_solve_args


def main():
    runs = {}
    cases = build_cases()
    for name in sorted(cases):
        model, cost, z0, U0, opts, enc = make_solve_args(name, cases)
        r = solve(model, cost, z0, U0, opts, encoding=enc)
        runs[name + "_Z"] = np.asarray(r.Z)
        runs[name + "_U"] = np.asarray(r.U)
        runs[name + "_J"] = np.asarray(r.J_opt)
        print(name, "J =", float(r.J_opt), "iters =", int(r.iterations))

    out = os.path.join(os.path.dirname(__file__),
                       "solver_trajectories.npz")
    np.savez(out, **runs)
    print("wrote", out)


if __name__ == "__main__":
    main()
