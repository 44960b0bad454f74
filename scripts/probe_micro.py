"""Finer-grained Mosaic probes under the tria stage of
scripts/probe_fused_stateful.py (which SIGABRTs the compile helper's
subprocess on TPU).  Each stage is one suspect construct in a minimal
Pallas kernel:

    t0     3-D passthrough (sanity)
    t1     single tria_solve, no vmap, (NX,NX) x (NX,P), trans=True
    t2     vmapped tria_solve over A, no transposes, no fallback
    t3     isfinite + where fallback alone on (A,P,NX)
    t4     vmapped solve WITH .T in/out transposes (the OLD kernel form)
    t5     vmapped tria_solve_right (the new transpose-free form)
    t6     the new fallback: elementwise where sanitize + scalar blend
    t7     t5 + t6 together (the full new _effective_eps inference path)

Results (TPU v5e, Mosaic via the remote helper, 2026-08-19): t0 PASS,
t1 HANGS the helper subprocess (un-vmapped (4,100) transposed solve),
t2 PASS, t3 SIGABRT (broadcast jnp.where fallback), t4 untested (queued
behind t1's hang).  t5-t7 probe the redesigned constructs that
models/bnn/model.py:_effective_eps now uses.

Round-4 results (2026-08-21): t5 PASS exact; t6/t7 SIGABRT —
InferVectorLayout aborts on the 0-D ``jnp.all`` reduction
(layout.h:320 rank check).  The staged single-axis keepdims variants
compile exactly (probe_micro3 t6d/t7c), and _effective_eps now uses
that form; see docs/PERFORMANCE.md §7b for the full probe matrix.

Run:  timeout 300 python scripts/probe_micro.py <stage>
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("PROBE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pddp_tpu.utils.linalg import tria_solve

N, P, A, NX = 25, 100, 10, 4

key = jax.random.PRNGKey(1)
U1 = jnp.triu(jnp.eye(NX) + 0.1 * jax.random.normal(key, (NX, NX)))
UA = jnp.triu(jnp.eye(NX) + 0.1 * jax.random.normal(key, (A, NX, NX)))
B1 = jax.random.normal(key, (NX, P))
DA = jax.random.normal(key, (A, P, NX))
E0 = jax.random.normal(key, (P, NX))


def run(body, inputs, out_shape, interpret):
    return pl.pallas_call(
        body,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*inputs)


def compare(name, fn):
    t0 = time.time()
    compiled = os.environ.get("PROBE_CPU") != "1"
    got = np.asarray(fn(not compiled))
    print(f"{name}: compiled ok in {time.time() - t0:.1f}s", flush=True)
    want = np.asarray(fn(True))
    err = float(np.max(np.abs(got - want)))
    print(f"{name}: max|compiled - interpret| = {err:.3e}", flush=True)
    assert np.isfinite(got).all()


def t0():
    def body(d_ref, out_ref):
        out_ref[...] = d_ref[...] * 2.0
    compare("t0", lambda i: run(body, [DA],
            jax.ShapeDtypeStruct((A, P, NX), jnp.float32), i))


def t1():
    def body(U_ref, b_ref, out_ref):
        out_ref[...] = tria_solve(U_ref[...], b_ref[...], trans=True)
    compare("t1", lambda i: run(body, [U1, B1],
            jax.ShapeDtypeStruct((NX, P), jnp.float32), i))


def t2():
    def body(U_ref, d_ref, out_ref):
        def one(Ui, di):
            return tria_solve(Ui, di, trans=True)  # (NX, P)
        out_ref[...] = jax.vmap(one)(U_ref[...],
                                     jnp.swapaxes(d_ref[...], -1, -2))
    compare("t2", lambda i: run(body, [UA, DA],
            jax.ShapeDtypeStruct((A, NX, P), jnp.float32), i))


def t3():
    def body(d_ref, e0_ref, out_ref):
        x = d_ref[...]
        bad = ~jnp.all(jnp.isfinite(x), axis=(-1, -2), keepdims=True)
        out_ref[...] = jnp.where(bad, e0_ref[...][None], x)
    compare("t3", lambda i: run(body, [DA, E0],
            jax.ShapeDtypeStruct((A, P, NX), jnp.float32), i))


def t4():
    def body(U_ref, d_ref, out_ref):
        def one(Ui, di):
            return tria_solve(Ui, di.T, trans=True).T  # (P, NX)
        out_ref[...] = jax.vmap(one)(U_ref[...], d_ref[...])
    compare("t4", lambda i: run(body, [UA, DA],
            jax.ShapeDtypeStruct((A, P, NX), jnp.float32), i))


def t5():
    from pddp_tpu.utils.linalg import tria_solve_right

    def body(U_ref, d_ref, out_ref):
        def one(Ui, di):
            return tria_solve_right(Ui, di)  # (P, NX)
        out_ref[...] = jax.vmap(one)(U_ref[...], d_ref[...])
    compare("t5", lambda i: run(body, [UA, DA],
            jax.ShapeDtypeStruct((A, P, NX), jnp.float32), i))


def t6():
    def body(d_ref, e0_ref, out_ref):
        def one(x, e0):
            finite = jnp.isfinite(x)
            x_safe = jnp.where(finite, x, jnp.zeros_like(x))
            bad = ~jnp.all(finite)
            w = bad.astype(x.dtype)
            return e0 * w + x_safe * (1.0 - w)
        out_ref[...] = jax.vmap(one, in_axes=(0, None))(d_ref[...],
                                                        e0_ref[...])
    compare("t6", lambda i: run(body, [DA, E0],
            jax.ShapeDtypeStruct((A, P, NX), jnp.float32), i))


def t7():
    from pddp_tpu.utils.linalg import tria_solve_right

    def body(U_ref, d_ref, e0_ref, out_ref):
        def one(Ui, di):
            eps_inf = tria_solve_right(Ui, di)
            finite = jnp.isfinite(eps_inf)
            eps_safe = jnp.where(finite, eps_inf,
                                 jnp.zeros_like(eps_inf))
            bad = ~jnp.all(finite)
            w = bad.astype(eps_inf.dtype)
            return e0_ref[...] * w + eps_safe * (1.0 - w)
        out_ref[...] = jax.vmap(one)(U_ref[...], d_ref[...])
    compare("t7", lambda i: run(body, [UA, DA, E0],
            jax.ShapeDtypeStruct((A, P, NX), jnp.float32), i))


STAGES = {"t0": t0, "t1": t1, "t2": t2, "t3": t3, "t4": t4,
          "t5": t5, "t6": t6, "t7": t7}

if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    STAGES[sys.argv[1]]()
    print(f"PROBE {sys.argv[1]}: PASS", flush=True)
