"""Round-4 Mosaic probes, part 5: concat-free triu codecs.

probe_micro4.py verdicts (TPU v5e 2026-08-21): s1 (concat of offset
slices) FAILS as diagnosed; s2 (identity-matmul relayout before concat)
HANGS the Mosaic compile >9 min.  So the fused-kernel path must avoid
slice concatenation altogether.  These stages rebuild the triu codecs as
masked-sum / tiny-matmul compositions — reductions and dot_generals
always produce fresh offset-0 layouts, and no op ever concatenates:

    f1   flatten_triu:   flat = sum_k row_k @ S_k   (row_k via masked sum)
    f2   unflatten_triu: U = sum_k onehot_k[:,None] * (flat @ S_k^T)
    f3   roundtrip f2(f1(U)) == U
    f4   diagonal via masked sum (probe_micro4 s4, rerun standalone)

S_k (n, m) places row k's upper-triangle elements at their flat offsets;
built from broadcasted_iota so nothing is captured.

Run:  timeout 600 python scripts/probe_micro5.py [stage ...]
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


def _iota2(shape, dim):
    return lax.broadcasted_iota(jnp.int32, shape, dim)


def _sel(k, n, m, dtype):
    """S_k (n, m): S_k[j, l] = 1 iff l == triu_offset(k) + (j - k), j >= k."""
    ofs = k * n - (k * (k - 1)) // 2
    j = _iota2((n, m), 0)
    l = _iota2((n, m), 1)
    return ((l == ofs + j - k) & (j >= k)).astype(dtype)


def _onehot_col(k, n, dtype):
    return (_iota2((n, 1), 0) == k).astype(dtype)


def flatten_triu_mm(U):
    """(..., n, n) -> (..., m) with no slice/concat ops."""
    n = U.shape[-1]
    m = n * (n + 1) // 2
    out = None
    for k in range(n):
        row_k = jnp.sum(U * _onehot_col(k, n, U.dtype), axis=-2)  # (..., n)
        piece = lax.dot_general(row_k, _sel(k, n, m, U.dtype),
                                (((row_k.ndim - 1,), (0,)), ((), ())),
                                preferred_element_type=U.dtype)
        out = piece if out is None else out + piece
    return out


def unflatten_triu_mm(X, n):
    """(..., m) -> upper-triangular (..., n, n), no slice/concat ops."""
    m = n * (n + 1) // 2
    out = None
    for k in range(n):
        Sk_T = jnp.swapaxes(_sel(k, n, m, X.dtype), 0, 1)       # (m, n)
        row_vals = lax.dot_general(X, Sk_T,
                                   (((X.ndim - 1,), (0,)), ((), ())),
                                   preferred_element_type=X.dtype)
        U_k = _onehot_col(k, n, X.dtype) * row_vals[..., None, :]
        out = U_k if out is None else out + U_k
    return out


def run(body, inputs, out_shape, interpret):
    return pl.pallas_call(
        body,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*inputs)


def compare(name, fn, want=None):
    t0 = time.time()
    compiled = os.environ.get("PROBE_CPU") != "1"
    got = np.asarray(fn(not compiled))
    print(f"{name}: compiled ok in {time.time() - t0:.1f}s", flush=True)
    ref = np.asarray(fn(True)) if want is None else np.asarray(want)
    err = float(np.max(np.abs(got - ref)))
    print(f"{name}: max|compiled - ref| = {err:.3e}", flush=True)
    assert np.isfinite(got).all()
    assert err < 1e-6


def f1():
    def body(U_ref, out_ref):
        out_ref[...] = flatten_triu_mm(U_ref[...])
    from pddp_tpu.encoding import _flatten_triu
    compare("f1", lambda i: run(body, [UA],
            jax.ShapeDtypeStruct((A, M), jnp.float32), i),
            want=_flatten_triu(UA))


def f2():
    def body(X_ref, out_ref):
        out_ref[...] = unflatten_triu_mm(X_ref[...], NX)
    from pddp_tpu.encoding import _unflatten_triu
    compare("f2", lambda i: run(body, [FLAT],
            jax.ShapeDtypeStruct((A, NX, NX), jnp.float32), i),
            want=_unflatten_triu(FLAT, NX))


def f3():
    def body(U_ref, out_ref):
        out_ref[...] = unflatten_triu_mm(flatten_triu_mm(U_ref[...]), NX)
    compare("f3", lambda i: run(body, [UA],
            jax.ShapeDtypeStruct((A, NX, NX), jnp.float32), i),
            want=UA)


def f4():
    def body(C_ref, out_ref):
        C = C_ref[...]
        eye = (_iota2((NX, NX), 0) == _iota2((NX, NX), 1)).astype(C.dtype)
        out_ref[...] = jnp.sum(C * eye, axis=-1)
    compare("f4", lambda i: run(body, [CA],
            jax.ShapeDtypeStruct((A, NX), jnp.float32), i))


STAGES = {"f1": f1, "f2": f2, "f3": f3, "f4": f4}

# -- part 5b: exact variants (f1-f3 compiled but rounded ~4e-3: the MXU
# multiplies f32 at bf16 input precision by default; selection must be
# exact). g* = VPU masked-sum (elementwise + single-axis reductions);
# h1 = dot_general with precision=HIGHEST.


def flatten_triu_vpu(U):
    n = U.shape[-1]
    m = n * (n + 1) // 2
    out = None
    for k in range(n):
        row_k = jnp.sum(U * _onehot_col(k, n, U.dtype), axis=-2)
        piece = jnp.sum(row_k[..., :, None] * _sel(k, n, m, U.dtype),
                        axis=-2)                                 # (..., m)
        out = piece if out is None else out + piece
    return out


def unflatten_triu_vpu(X, n):
    m = n * (n + 1) // 2
    out = None
    for k in range(n):
        row_vals = jnp.sum(X[..., None, :] * _sel(k, n, m, X.dtype),
                           axis=-1)                              # (..., n)
        U_k = _onehot_col(k, n, X.dtype) * row_vals[..., None, :]
        out = U_k if out is None else out + U_k
    return out


def g1():
    def body(U_ref, out_ref):
        out_ref[...] = flatten_triu_vpu(U_ref[...])
    from pddp_tpu.encoding import _flatten_triu
    compare("g1", lambda i: run(body, [UA],
            jax.ShapeDtypeStruct((A, M), jnp.float32), i),
            want=_flatten_triu(UA))


def g2():
    def body(X_ref, out_ref):
        out_ref[...] = unflatten_triu_vpu(X_ref[...], NX)
    from pddp_tpu.encoding import _unflatten_triu
    compare("g2", lambda i: run(body, [FLAT],
            jax.ShapeDtypeStruct((A, NX, NX), jnp.float32), i),
            want=_unflatten_triu(FLAT, NX))


def g3():
    def body(U_ref, out_ref):
        out_ref[...] = unflatten_triu_vpu(flatten_triu_vpu(U_ref[...]), NX)
    compare("g3", lambda i: run(body, [UA],
            jax.ShapeDtypeStruct((A, NX, NX), jnp.float32), i),
            want=UA)


def h1():
    def body(U_ref, out_ref):
        U = U_ref[...]
        n = U.shape[-1]
        m = n * (n + 1) // 2
        out = None
        for k in range(n):
            row_k = jnp.sum(U * _onehot_col(k, n, U.dtype), axis=-2)
            piece = lax.dot_general(row_k, _sel(k, n, m, U.dtype),
                                    (((row_k.ndim - 1,), (0,)), ((), ())),
                                    precision=lax.Precision.HIGHEST,
                                    preferred_element_type=U.dtype)
            out = piece if out is None else out + piece
        out_ref[...] = out
    from pddp_tpu.encoding import _flatten_triu
    compare("h1", lambda i: run(body, [UA],
            jax.ShapeDtypeStruct((A, M), jnp.float32), i),
            want=_flatten_triu(UA))


STAGES.update({"g1": g1, "g2": g2, "g3": g3, "h1": h1})


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
    os._exit(0)  # skip the multi-minute tunnel teardown
