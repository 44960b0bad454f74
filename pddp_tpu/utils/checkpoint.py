"""Checkpoint / resume utilities.

The reference has no explicit checkpointing; persistence is implicitly
torch.nn.Module ``state_dict`` (controllers/models/costs are Modules —
/root/reference/pddp/controllers/base.py:21, models/base.py:23) plus the
warm-start state ``_Z_nominal/_U_nominal/_K`` (ilqr.py:98-100, 167-169).
Here everything is already a pytree, so checkpointing is generic:

 * ``save_pytree`` / ``restore_pytree``: orbax-backed persistence of any
   model/cost/options pytree (static fields are structure, array leaves
   are data).
 * ``iLQRController.state_dict()`` / ``load_state_dict()`` (on the
   controller classes) round-trip the warm-start state so MPC sessions
   resume exactly.
"""

from __future__ import annotations

import os

import jax
import numpy as np

__all__ = ["save_pytree", "restore_pytree", "save_state_dict",
           "load_state_dict"]


def save_pytree(path, tree):
    """Persists a pytree's array leaves with orbax.

    Static metadata (sizes, flags) is part of the pytree *structure* and
    is not stored: restore takes a structurally identical template, the
    same contract as torch's load_state_dict.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    # Leaves are stored positionally: pytree *structure* (including static
    # metadata) comes from the restore template, exactly like torch's
    # load_state_dict contract. Zero-padded keys keep ordering stable.
    leaves = jax.tree_util.tree_leaves(tree)
    flat = {
        "leaf_{:06d}".format(i): np.asarray(leaf)
        for i, leaf in enumerate(leaves)
    }
    ckptr.save(path, flat, force=True)


def restore_pytree(path, like):
    """Restores a pytree saved by :func:`save_pytree`.

    Args:
        path: checkpoint directory.
        like: template pytree with the target structure (and shardings).

    Returns:
        The restored pytree with ``like``'s structure and dtypes.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    new_leaves = [restored[k] for k in sorted(restored)]
    if len(new_leaves) != len(leaves):
        raise ValueError(
            "Checkpoint has {} leaves; template has {}".format(
                len(new_leaves), len(leaves)))
    new_leaves = [
        jax.numpy.asarray(n, getattr(l, "dtype", None))
        for n, l in zip(new_leaves, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_state_dict(path, state_dict):
    """Persists a flat dict of arrays (controller warm-start state)."""
    np.savez(path, **{
        k: np.asarray(v) for k, v in state_dict.items() if v is not None
    })


def load_state_dict(path):
    """Loads a flat dict of arrays saved by :func:`save_state_dict`."""
    with np.load(path) as data:
        return {k: jax.numpy.asarray(data[k]) for k in data.files}
