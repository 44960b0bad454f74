"""Round-4 Mosaic probe variants for the t6 fallback-blend failure.

probe_micro.py t6/t7 SIGABRT Mosaic's InferVectorLayout with
``Check failed: arr.size() >= layout_rank(implicit_dim) (1 vs 2)``: the
per-candidate finite check ``~jnp.all(finite)`` reduces to a 0-D scalar
(rank-1 under vmap), and TPU vector layouts are inherently 2-D.  Each
variant here keeps every intermediate >= 2-D:

    t6b  vmapped blend, reduction with keepdims -> (1, 1) weight
    t6c  un-vmapped blend over the full (A, P, NX) block, (A, 1, 1) weight
    t7b  t5's vmapped tria_solve_right + the t6b blend (full inference path)

Failures raise catchable Python exceptions (the SIGABRT is in the remote
compile service's subprocess), so all stages run in one process.

Run:  timeout 600 python scripts/probe_micro2.py [stage ...]
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

from pddp_tpu.utils.linalg import tria_solve_right

N, P, A, NX = 25, 100, 10, 4

key = jax.random.PRNGKey(1)
UA = jnp.triu(jnp.eye(NX) + 0.1 * jax.random.normal(key, (A, NX, NX)))
DA = jax.random.normal(key, (A, P, NX))
E0 = jax.random.normal(key, (P, NX))
# A copy with one non-finite lane so the fallback path is value-checked.
DA_BAD = DA.at[3, 7, 2].set(jnp.nan)


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


def _blend_keepdims(x, e0):
    """(P, NX) blend with every intermediate >= 2-D."""
    finite = jnp.isfinite(x)
    x_safe = jnp.where(finite, x, jnp.zeros_like(x))
    # (1, 1) weight: 1.0 where any element was non-finite.
    w = 1.0 - jnp.min(finite.astype(x.dtype), axis=(0, 1), keepdims=True)
    return e0 * w + x_safe * (1.0 - w)


def t6b(d):
    def body(d_ref, e0_ref, out_ref):
        out_ref[...] = jax.vmap(_blend_keepdims, in_axes=(0, None))(
            d_ref[...], e0_ref[...])
    compare("t6b", lambda i: run(body, [d, E0],
            jax.ShapeDtypeStruct((A, P, NX), jnp.float32), i))


def t6c(d):
    def body(d_ref, e0_ref, out_ref):
        x = d_ref[...]
        finite = jnp.isfinite(x)
        x_safe = jnp.where(finite, x, jnp.zeros_like(x))
        w = 1.0 - jnp.min(finite.astype(x.dtype).reshape(A, P * NX),
                          axis=1, keepdims=True).reshape(A, 1, 1)
        out_ref[...] = e0_ref[...][None] * w + x_safe * (1.0 - w)
    compare("t6c", lambda i: run(body, [d, E0],
            jax.ShapeDtypeStruct((A, P, NX), jnp.float32), i))


def t7b(d):
    def body(U_ref, d_ref, e0_ref, out_ref):
        def one(Ui, di):
            eps_inf = tria_solve_right(Ui, di)
            return _blend_keepdims(eps_inf, e0_ref[...])
        out_ref[...] = jax.vmap(one)(U_ref[...], d_ref[...])
    compare("t7b", lambda i: run(body, [UA, d, E0],
            jax.ShapeDtypeStruct((A, P, NX), jnp.float32), i))


STAGES = {"t6b": t6b, "t6c": t6c, "t7b": t7b}

if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    names = sys.argv[1:] or list(STAGES)
    for name in names:
        for tag, d in (("clean", DA), ("bad", DA_BAD)):
            try:
                STAGES[name](d)
                print(f"PROBE {name}[{tag}]: PASS", flush=True)
            except Exception as e:
                msg = str(e).splitlines()[0][:200] if str(e) else repr(e)
                print(f"PROBE {name}[{tag}]: FAIL {msg}", flush=True)
