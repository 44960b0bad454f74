"""Cartpole swing-up with PDDP (learned BNN dynamics).

Parity: /root/reference/examples/cartpole.py — full PDDP on the cartpole:
episodic data collection, [200, 200] CDropout BNN with 100 particles,
iLQR trajectory optimization on the learned model, MPC data collection,
sigma-band path plots, and a final policy execution.
"""

from __future__ import annotations

import os as _os
import sys as _sys

_here = _os.path.dirname(_os.path.abspath(__file__))
for _p in (_here, _os.path.dirname(_here)):  # examples dir + repo root
    if _p not in _sys.path:
        _sys.path.insert(0, _p)


from pddp_tpu.examples.problems import SampleProblems

from experiment import run

if __name__ == "__main__":
    run(SampleProblems.CARTPOLE)
