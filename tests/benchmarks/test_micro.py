"""In-suite micro-benchmarks (reference pattern: pytest-benchmark tests in
tests/controllers/test_ilqr.py:112-124, tests/models/test_bnn.py:84-91,
tests/costs/test_quadratic.py:89-102, tests/utils/test_encoding.py:206-214).

pytest-benchmark is not available in this environment, so these use a
small block_until_ready timing helper and report via printed lines (run
with ``-s``). They are *skipped by default* — set ``PDDP_TPU_BENCH=1`` to
run them (they measure whatever backend the conftest selects; on the CI
CPU config the numbers are only indicative, the real harness is bench.py
on TPU).
"""

import os
import time

import jax
import jax.numpy as jnp
import pytest

from pddp_tpu.controllers.ilqr import backward, forward
from pddp_tpu.costs import QRCost
from pddp_tpu.encoding import (StateEncoding, encode,
                               infer_encoded_state_size)
from pddp_tpu.examples.pendulum import PendulumCost, PendulumDynamicsModel

pytestmark = pytest.mark.skipif(
    not os.environ.get("PDDP_TPU_BENCH"),
    reason="micro-benchmarks: set PDDP_TPU_BENCH=1 to run")


def _bench(label, fn, *args, n=100, warmup=3, repeats=3):
    # Best-of-repeats over many calls: the TPU tunnel's latency is bursty
    # (CLAUDE.md — never trust a single short run).
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n * 1e3)
    print(f"\n[bench] {label}: {best:.3f} ms")
    return best


@pytest.fixture(scope="module")
def pendulum_setup():
    encoding = StateEncoding.DEFAULT
    model = PendulumDynamicsModel(dt=0.1)
    cost = PendulumCost()
    n = infer_encoded_state_size(2, encoding)
    z0 = encode(jnp.zeros(2), C=1e-2 * jnp.eye(2), encoding=encoding)
    U = 0.1 * jnp.ones((25, 1))
    return encoding, model, cost, z0, U, n


def test_benchmark_forward(pendulum_setup):
    encoding, model, cost, z0, U, _ = pendulum_setup
    fwd = jax.jit(lambda z, u: forward(z, u, model, cost, encoding))
    _bench("forward derivatives H=25 pendulum", fwd, z0, U)


def test_benchmark_backward(pendulum_setup):
    encoding, model, cost, z0, U, _ = pendulum_setup
    derivs = forward(z0, U, model, cost, encoding)
    bwd = jax.jit(lambda *d: backward(*d, reg=0.1))
    _bench("Riccati backward H=25 pendulum", bwd, *derivs)


def test_benchmark_bnn_forward():
    from pddp_tpu.models.bnn import bnn_dynamics_model_factory
    cls = bnn_dynamics_model_factory(2, 1, [200, 200])
    model = cls.init(jax.random.PRNGKey(0), n_particles=100, horizon=25)
    encoding = StateEncoding.DEFAULT
    z = encode(jnp.zeros(2), C=1e-2 * jnp.eye(2), encoding=encoding)
    u = jnp.zeros(1)
    state0 = model.init_state()
    fwd = jax.jit(lambda z, u: model.step(z, u, 0, state0, encoding)[0])
    _bench("BNN forward 100 particles", fwd, z, u)


def test_benchmark_cost_eval():
    cost = QRCost(jnp.eye(2), jnp.eye(1))
    encoding = StateEncoding.DEFAULT
    z = encode(jnp.zeros(2), C=1e-2 * jnp.eye(2), encoding=encoding)
    u = jnp.zeros(1)
    fn = jax.jit(lambda z, u: cost(z, u, 0, encoding=encoding))
    _bench("QRCost eval", fn, z, u)


def test_benchmark_encode():
    mean = jnp.zeros(4)
    C = 1e-2 * jnp.eye(4)
    fn = jax.jit(lambda m, C: encode(m, C=C,
                                     encoding=StateEncoding.DEFAULT))
    _bench("encode n=4 cholesky", fn, mean, C)
