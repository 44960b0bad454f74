"""Smoke tests for the script/notebook layer (round-1 verdict item 10).

The reference gets this implicitly because its tests mirror the
notebooks; here the example scripts are real runnable artifacts, so CI
must catch rot: each smoke test runs a script headless on CPU with tiny
iteration counts (the scripts honor PDDP_FORCE_CPU, see
examples/utils.py:18-21), and one notebook is executed via nbconvert.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


def _run(args, timeout=900, extra_env=None):
    env = dict(
        os.environ,
        PDDP_FORCE_CPU="1",
        MPLBACKEND="Agg",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS=(os.environ.get("XLA_FLAGS", "") +
                   " --xla_force_host_platform_device_count=8").strip(),
    )
    # Undo the x64 default the test conftest sets for THIS process; the
    # scripts run in their own process with their own defaults.
    env.update(extra_env or {})
    return subprocess.run(args, cwd=REPO, env=env, timeout=timeout,
                          capture_output=True, text=True)


@pytest.mark.slow
def test_known_dynamics_script_runs():
    r = _run([sys.executable, "examples/known_dynamics.py", "pendulum", "3"])
    assert r.returncode == 0, r.stderr[-3000:]
    assert "pendulum: J =" in r.stdout, r.stdout[-2000:]


@pytest.mark.slow
def test_parallel_solves_script_runs():
    # Positional args: [batch] [horizon].
    r = _run([sys.executable, "examples/parallel_solves.py", "16", "12"])
    assert r.returncode == 0, r.stderr[-3000:]


@pytest.mark.slow
def test_known_dynamics_notebook_executes():
    """Executes the pendulum known-dynamics notebook headless via
    nbconvert (the notebooks force CPU when PDDP_NOTEBOOK_FORCE_CPU is
    set — see notebooks/known_dynamics/pendulum.ipynb cell 1)."""
    nb = os.path.join(REPO, "notebooks", "known_dynamics", "pendulum.ipynb")
    out = "/tmp/pendulum_executed.ipynb"
    r = _run([sys.executable, "-m", "nbconvert", "--to", "notebook",
              "--execute", nb, "--output", out,
              "--ExecutePreprocessor.timeout=840"],
             extra_env={"PDDP_NOTEBOOK_FORCE_CPU": "1"})
    assert r.returncode == 0, (r.stderr[-3000:] or r.stdout[-3000:])
