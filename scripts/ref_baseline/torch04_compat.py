"""torch-0.4-era linalg shims so the reference runs on modern torch.

The reference was written against torch 0.4.x and calls four LAPACK
wrappers that were removed around torch 1.2
(`/root/reference/pddp/controllers/ilqr.py:595-616`,
`pddp/utils/constraint.py:222-239`, `pddp/utils/particles.py:93-101`,
`pddp/models/bnn/modules.py:337-346`, `pddp/utils/encoding.py:560`,
`pddp/costs/quadratic.py:162`, `pddp/examples/double_cartpole/model.py:177`):

  * ``potrf(a, upper=True)``        -> Cholesky factor (upper by default!)
  * ``potrs(b, u, upper=True)``     -> solve via a Cholesky factor
  * ``gesv(b, A)``                  -> ``(X, LU)`` with ``A X = b``
  * ``trtrs(b, A, upper=True, transpose=False, unitriangular=False)``
                                    -> ``(X, A)`` triangular solve

``install()`` monkeypatches the module-level functions and the Tensor
methods with equivalents built on ``torch.linalg``.  Used ONLY by
scripts/ref_baseline/measure_reference.py to time the reference on this
host; nothing in pddp_tpu imports this.
"""

import collections
import collections.abc

import torch


def _as_matrix(b):
    return b.unsqueeze(-1) if b.dim() == 1 else b


def _potrf(a, upper=True):
    c = torch.linalg.cholesky(a)
    return c.transpose(-2, -1) if upper else c


def _potrs(b, u, upper=True):
    return torch.cholesky_solve(_as_matrix(b), u, upper=upper)


def _gesv(b, A):
    return torch.linalg.solve(A, _as_matrix(b)), A


def _trtrs(b, A, upper=True, transpose=False, unitriangular=False):
    if transpose:
        A = A.transpose(-2, -1)
        upper = not upper
    x = torch.linalg.solve_triangular(
        A, _as_matrix(b), upper=upper, unitriangular=unitriangular)
    return x, A


def _eig(a, eigenvectors=False):
    """Legacy torch.eig: eigenvalues as an (n, 2) [real, imag] tensor."""
    w, v = torch.linalg.eig(a)
    e = torch.stack([w.real, w.imag], dim=-1)
    return e, (v.real if eigenvectors else torch.empty(0, dtype=a.dtype))


def _fix_index(idx):
    """torch-0.4 mask indexing: ByteTensor (uint8) indices meant boolean
    masks; modern torch raises 'masked_fill_ only supports boolean masks'.
    The reference's boxqp builds its clamped/free masks as uint8
    explicitly (pddp/utils/constraint.py:173-174) and indexes with them
    (:219,231,237-239), so every constrained backward pass hits this."""
    if isinstance(idx, torch.Tensor) and idx.dtype == torch.uint8:
        return idx.bool()
    if isinstance(idx, tuple):
        return tuple(_fix_index(i) for i in idx)
    return idx


def install():
    """Register the legacy names on torch and torch.Tensor (idempotent)."""
    # Python-2-era ABC aliases (removed in py3.10): the reference does
    # `from collections import Iterable` (pddp/models/bnn/modules.py:30).
    for abc_name in ("Iterable", "Mapping", "Sequence", "Callable"):
        if not hasattr(collections, abc_name):
            setattr(collections, abc_name, getattr(collections.abc, abc_name))
    # torch.eig/Tensor.eig still EXIST in torch 2.x but raise a removal
    # error (reference ilqr.py:631 calls it) — override unconditionally.
    torch.eig = _eig
    torch.Tensor.eig = _eig
    for name, fn in (("potrf", _potrf), ("potrs", _potrs), ("gesv", _gesv),
                     ("trtrs", _trtrs)):
        if not hasattr(torch, name):
            setattr(torch, name, fn)
        if not hasattr(torch.Tensor, name):
            # Methods bind self as the first positional arg, which matches
            # the legacy signatures (b.potrs(u), b.gesv(A), a.potrf()).
            setattr(torch.Tensor, name, fn)
    # uint8 (ByteTensor) mask indexing, removed around torch 1.2.
    if not getattr(torch.Tensor, "_pddp_uint8_mask_shim", False):
        orig_getitem = torch.Tensor.__getitem__
        orig_setitem = torch.Tensor.__setitem__

        def getitem(self, idx):
            return orig_getitem(self, _fix_index(idx))

        def setitem(self, idx, value):
            return orig_setitem(self, _fix_index(idx), value)

        torch.Tensor.__getitem__ = getitem
        torch.Tensor.__setitem__ = setitem
        torch.Tensor._pddp_uint8_mask_shim = True
