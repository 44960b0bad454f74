"""Fused Pallas Riccati backward kernel.

The sequential Riccati recursion (controllers/ilqr.py:backward; reference
pddp/controllers/ilqr.py:529-674) is latency-bound as a ``lax.scan``: each
of the N dependent steps is a handful of tiny matrix ops far below TPU
tile sizes. This kernel runs the whole reverse recursion inside ONE Pallas
program with V_z/V_zz resident in VMEM.

Scope: unconstrained, Q_uu-regularized, action_size <= SMALL_EIGH_N. The
eigenvalue clamping of Q_uu (reference :631-634) is the closed form
``max(Q_uu, floor) + reg`` for nu == 1 and a fixed-sweep Jacobi
eigendecomposition (utils.linalg.small_eigh — fully unrolled, Mosaic
compatible) for larger action blocks, so all four example problems
(pendulum/cartpole/double-cartpole nu=1, rendezvous nu=4) take the fused
path. Constrained (boxqp) and V_zz-regularized solves use the sequential
scan.

Numerics match backward(...) with the same reg (verified in
tests/ops/test_backward_kernel.py; nu > 1 agrees to eigensolver
tolerance).

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

from ..utils.linalg import SMALL_EIGH_N, small_eigh

__all__ = ["pallas_backward", "pallas_backward_nu1",
           "supports_pallas_backward"]


def supports_pallas_backward(L_u):
    return L_u.shape[-1] <= SMALL_EIGH_N


def pallas_backward(Z, F_z, F_u, L, L_z, L_u, L_zz, L_uz, L_uu, reg=0.0,
                    interpret=None):
    """Riccati backward for nu <= SMALL_EIGH_N, same interface/returns as
    controllers.ilqr.backward (unconstrained): (k (N,nu), K (N,nu,nz), ok).
    """
    del L, Z
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, nu = L_u.shape
    nz = F_z.shape[-1]
    dtype = F_z.dtype
    reg_arr = jnp.asarray(reg, dtype).reshape(1, 1)
    floor = 1e-12  # Python literal: captured array constants break Mosaic.

    def kernel(F_z_ref, F_u_ref, L_z_ref, L_u_ref, L_zz_ref, L_uz_ref,
               L_uu_ref, reg_ref, k_out, K_out):
        r = reg_ref[0, 0]
        V_z = L_z_ref[pl.ds(N, 1), :]            # (1, nz)
        V_zz = L_zz_ref[N]                       # (nz, nz)

        def body(t, carry):
            V_z, V_zz = carry
            i = N - 1 - t
            F_z_i = F_z_ref[i]                   # (nz, nz)
            F_u_i = F_u_ref[i]                   # (nz, nu)
            L_z_i = L_z_ref[pl.ds(i, 1), :]      # (1, nz)
            L_u_i = L_u_ref[pl.ds(i, 1), :]      # (1, nu)
            L_zz_i = L_zz_ref[i]                 # (nz, nz)
            L_uz_i = L_uz_ref[i]                 # (nu, nz)
            L_uu_i = L_uu_ref[i]                 # (nu, nu)

            dot = lambda a, b: jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=dtype)

            Q_z = L_z_i + dot(V_z, F_z_i)                       # (1, nz)
            Q_u = L_u_i + dot(V_z, F_u_i)                       # (1, nu)
            V_zz_F_z = dot(V_zz, F_z_i)                         # (nz, nz)
            Q_zz = L_zz_i + dot(F_z_i.T, V_zz_F_z)
            Q_zz = 0.5 * (Q_zz + Q_zz.T)
            Q_uz = L_uz_i + dot(F_u_i.T, V_zz_F_z)              # (nu, nz)
            Q_uu = L_uu_i + dot(F_u_i.T, dot(V_zz, F_u_i))      # (nu, nu)

            # Eigenvalue clamp + Tikhonov (ilqr._psd_clamp_with_reg):
            # closed form for scalar actions, unrolled fixed-sweep Jacobi
            # (small_eigh) otherwise.
            if nu == 1:
                e = jnp.where(Q_uu < 0, floor, Q_uu) + r
                inv = 1.0 / e[0, 0]
                k_i = -Q_u.T * inv                              # (1, 1)
                K_i = -Q_uz * inv                               # (1, nz)
            else:
                Q_uu = 0.5 * (Q_uu + Q_uu.T)
                e, E = small_eigh(Q_uu, sort=False)
                e = jnp.where(e < 0, floor, e) + r              # (nu,)
                Q_uu_inv = dot(E / e[None, :], E.T)             # (nu, nu)
                kK = -dot(Q_uu_inv,
                          jnp.concatenate([Q_u.T, Q_uz], axis=1))
                k_i = kK[:, 0:1]                                # (nu, 1)
                K_i = kK[:, 1:]                                 # (nu, nz)

            # V updates with the unregularized Q and correction terms
            # (reference :664-672).
            Q_uu_k = dot(Q_uu, k_i)                             # (nu, 1)
            V_z_new = (Q_z + dot((Q_u.T + Q_uu_k).T, K_i)
                       + dot(k_i.T, Q_uz))                      # (1, nz)
            KTQuu = dot(K_i.T, Q_uu)                            # (nz, nu)
            KTQ = dot(K_i.T, Q_uz)                              # (nz, nz)
            V_zz_new = Q_zz + dot(KTQuu, K_i) + KTQ + KTQ.T
            V_zz_new = 0.5 * (V_zz_new + V_zz_new.T)

            k_out[pl.ds(i, 1), :] = k_i.T
            K_out[i] = K_i
            return V_z_new, V_zz_new

        lax.fori_loop(0, N, body, (V_z, V_zz))

    k, K = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((N, nu), dtype),
            jax.ShapeDtypeStruct((N, nu, nz), dtype),
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


def pallas_backward_nu1(*args, **kwargs):
    """Backward-compatible alias (the kernel covers nu <= SMALL_EIGH_N)."""
    return pallas_backward(*args, **kwargs)
