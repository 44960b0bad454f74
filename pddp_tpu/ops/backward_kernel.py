"""Fused Pallas Riccati backward kernel (scalar-action fast path).

The sequential Riccati recursion (controllers/ilqr.py:backward; reference
pddp/controllers/ilqr.py:529-674) is latency-bound as a ``lax.scan``: each
of the N dependent steps is a handful of tiny matrix ops far below TPU
tile sizes. This kernel runs the whole reverse recursion inside ONE Pallas
program with V_z/V_zz resident in VMEM.

Scope: unconstrained, Q_uu-regularized, action_size == 1 — which makes the
eigenvalue clamping of Q_uu (reference :631-634) the closed form
``max(Q_uu, floor) + reg`` and needs no in-kernel linalg. This covers
the pendulum / cartpole / double-cartpole families and the headline
benchmark; other cases use the sequential scan or the associative-scan
parallel backward (ops/riccati.py).

Numerics are identical to backward(...) with the same reg (verified in
tests/ops/test_backward_kernel.py).

Scope note: a *single-solve latency* optimization — under vmap (P5 batched
solves) pallas_call serializes over the batch; use riccati_mode="scan"
(already batch-wide) for large solve batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_backward_nu1", "supports_pallas_backward"]


def supports_pallas_backward(L_u):
    return L_u.shape[-1] == 1


def pallas_backward_nu1(Z, F_z, F_u, L, L_z, L_u, L_zz, L_uz, L_uu, reg=0.0,
                        interpret=None):
    """Riccati backward for nu == 1, same interface/returns as
    controllers.ilqr.backward (unconstrained): (k (N,1), K (N,1,nz), ok).
    """
    del L, Z
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N = L_u.shape[0]
    nz = F_z.shape[-1]
    dtype = F_z.dtype
    reg_arr = jnp.asarray(reg, dtype).reshape(1, 1)

    def kernel(F_z_ref, F_u_ref, L_z_ref, L_u_ref, L_zz_ref, L_uz_ref,
               L_uu_ref, reg_ref, k_out, K_out):
        r = reg_ref[0, 0]
        V_z = L_z_ref[pl.ds(N, 1), :]            # (1, nz)
        V_zz = L_zz_ref[N]                       # (nz, nz)

        def body(t, carry):
            V_z, V_zz = carry
            i = N - 1 - t
            F_z_i = F_z_ref[i]                   # (nz, nz)
            F_u_i = F_u_ref[i]                   # (nz, 1)
            L_z_i = L_z_ref[pl.ds(i, 1), :]      # (1, nz)
            L_u_i = L_u_ref[pl.ds(i, 1), :]      # (1, 1)
            L_zz_i = L_zz_ref[i]                 # (nz, nz)
            L_uz_i = L_uz_ref[i]                 # (1, nz)
            L_uu_i = L_uu_ref[i]                 # (1, 1)

            dot = lambda a, b: jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=dtype)

            Q_z = L_z_i + dot(V_z, F_z_i)                       # (1, nz)
            Q_u = L_u_i + dot(V_z, F_u_i)                       # (1, 1)
            V_zz_F_z = dot(V_zz, F_z_i)                         # (nz, nz)
            Q_zz = L_zz_i + dot(F_z_i.T, V_zz_F_z)
            Q_zz = 0.5 * (Q_zz + Q_zz.T)
            Q_uz = L_uz_i + dot(F_u_i.T, V_zz_F_z)              # (1, nz)
            Q_uu = L_uu_i + dot(F_u_i.T, dot(V_zz, F_u_i))      # (1, 1)

            # nu=1 eigenvalue clamp + Tikhonov (ilqr._psd_clamp_with_reg).
            e = jnp.where(Q_uu < 0, 1e-12, Q_uu) + r
            inv = 1.0 / e[0, 0]
            k_i = -Q_u * inv                                    # (1, 1)
            K_i = -Q_uz * inv                                   # (1, nz)

            # V updates with the unregularized Q and correction terms
            # (reference :664-672).
            V_z_new = (Q_z + K_i * (Q_u[0, 0] + Q_uu[0, 0] * k_i[0, 0])
                       + Q_uz * k_i[0, 0])
            KTK = dot(K_i.T, K_i)                               # (nz, nz)
            KTQ = dot(K_i.T, Q_uz)
            V_zz_new = Q_zz + Q_uu[0, 0] * KTK + KTQ + KTQ.T
            V_zz_new = 0.5 * (V_zz_new + V_zz_new.T)

            k_out[pl.ds(i, 1), :] = k_i
            K_out[i] = K_i
            return V_z_new, V_zz_new

        lax.fori_loop(0, N, body, (V_z, V_zz))

    k, K = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((N, 1), dtype),
            jax.ShapeDtypeStruct((N, 1, nz), dtype),
        ),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7
            + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        ),
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(2)),
        interpret=interpret,
    )(F_z, F_u, L_z, L_u, L_zz, L_uz, L_uu, reg_arr)

    ok = jnp.all(jnp.isfinite(k)) & jnp.all(jnp.isfinite(K))
    return k, K, ok
