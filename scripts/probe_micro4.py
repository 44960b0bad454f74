"""Round-4 Mosaic probes, part 4: concatenation of slices.

probe_fused_stateful.py `mm` dies in Mosaic on
``tpu.concatenate`` of four (A,1) diagonal slices whose vector layouts
keep their source lane offsets ({0,0},{1,1},{2,2},{3,3}) — the op
requires uniform input layouts.  Slices feeding *arithmetic* are fine
(probe_micro.py t5); only slice->concatenate dies.  These stages test
offset-normalization tricks:

    s1   raw triu flatten: concat of U[..., i, i:] slices  (expect FAIL)
    s2   triu flatten with identity-matmul relayout of each slice
    s3   triu unflatten (zero-pad + concat + stack) with relayout
    s4   diagonal via masked sum  jnp.sum(C * eye, axis=-1)
    s5   roundtrip: flatten(s2) -> unflatten(s3) == identity

The identity matrices are built in-kernel from broadcasted_iota (Pallas
kernels cannot capture array constants).

Run:  timeout 600 python scripts/probe_micro4.py [stage ...]
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
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, P, A, NX = 25, 100, 10, 4
M = NX * (NX + 1) // 2

key = jax.random.PRNGKey(1)
UA = jnp.triu(jnp.eye(NX) + 0.1 * jax.random.normal(key, (A, NX, NX)))
CA = jnp.matmul(jnp.swapaxes(UA, -1, -2), UA)
FLAT = jax.random.normal(key, (A, M))


def _eye_iota(w, dtype):
    r = lax.broadcasted_iota(jnp.int32, (w, w), 0)
    c = lax.broadcasted_iota(jnp.int32, (w, w), 1)
    return (r == c).astype(dtype)


def _relayout(x):
    """Forces a fresh (offset-0) vector layout via an identity matmul."""
    return lax.dot_general(x, _eye_iota(x.shape[-1], x.dtype),
                           (((x.ndim - 1,), (0,)), ((), ())),
                           preferred_element_type=x.dtype)


def flatten_triu_raw(U):
    return jnp.concatenate([U[..., i, i:] for i in range(NX)], axis=-1)


def flatten_triu_rl(U):
    return jnp.concatenate([_relayout(U[..., i, i:]) for i in range(NX)],
                           axis=-1)


def unflatten_triu_rl(X):
    rows = []
    ofs = 0
    for i in range(NX):
        width = NX - i
        row_vals = _relayout(X[..., ofs:ofs + width])
        if i:
            pad = jnp.zeros(X.shape[:-1] + (i,), X.dtype)
            row_vals = jnp.concatenate([pad, row_vals], axis=-1)
        rows.append(row_vals)
        ofs += width
    return jnp.stack(rows, axis=-2)


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


def s1():
    def body(U_ref, out_ref):
        out_ref[...] = flatten_triu_raw(U_ref[...])
    compare("s1", lambda i: run(body, [UA],
            jax.ShapeDtypeStruct((A, M), jnp.float32), i))


def s2():
    def body(U_ref, out_ref):
        out_ref[...] = flatten_triu_rl(U_ref[...])
    compare("s2", lambda i: run(body, [UA],
            jax.ShapeDtypeStruct((A, M), jnp.float32), i))


def s3():
    def body(X_ref, out_ref):
        out_ref[...] = unflatten_triu_rl(X_ref[...])
    compare("s3", lambda i: run(body, [FLAT],
            jax.ShapeDtypeStruct((A, NX, NX), jnp.float32), i))


def s4():
    def body(C_ref, out_ref):
        C = C_ref[...]
        out_ref[...] = jnp.sum(C * _eye_iota(NX, C.dtype), axis=-1)
    compare("s4", lambda i: run(body, [CA],
            jax.ShapeDtypeStruct((A, NX), jnp.float32), i))


def s5():
    def body(U_ref, out_ref):
        out_ref[...] = unflatten_triu_rl(flatten_triu_rl(U_ref[...]))
    compare("s5", lambda i: run(body, [UA],
            jax.ShapeDtypeStruct((A, NX, NX), jnp.float32), i))


STAGES = {"s1": s1, "s2": s2, "s3": s3, "s4": s4, "s5": s5}

if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for name in (sys.argv[1:] or list(STAGES)):
        try:
            STAGES[name]()
            print(f"PROBE {name}: PASS", flush=True)
        except Exception as e:
            msg = ""
            for line in str(e).splitlines():
                if ("Check failed" in line or "tpu." in line
                        or "exit" in line):
                    msg = line.strip()[:160]
                    break
            print(f"PROBE {name}: FAIL {msg}", flush=True)
