"""Checkpoint / resume for particle filter states (SURVEY.md §5).

The reference has no serialization (state is an in-memory Julia struct);
on preemptible TPU pods checkpointing is table stakes. Because a
:class:`~..smc.state.ParticleFilterState` is a pytree of arrays, orbax
makes this nearly free: we save the flattened leaves plus the treedef-
defining model identity, and restore onto the running model's structure.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

__all__ = ["save_state", "restore_state"]


def save_state(path: str, state) -> None:
    """Save a ParticleFilterState (or any pytree of arrays) to ``path``.

    Uses orbax when available, else a portable .npz of the flattened leaves.
    """
    leaves, treedef = jax.tree_util.tree_flatten(state)
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), [np.asarray(l) for l in leaves],
                   force=True)
        ckptr.wait_until_finished()
    except Exception:
        np.savez(path if path.endswith(".npz") else path + ".npz",
                 **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})


def restore_state(path: str, like) -> Any:
    """Restore a state saved by :func:`save_state`; ``like`` provides the
    pytree structure (e.g. a freshly initialized state of the same model
    and particle count)."""
    leaves, treedef = jax.tree_util.tree_flatten(like)
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(os.path.abspath(path),
                                 [np.asarray(l) for l in leaves])
    except Exception:
        f = np.load(path if path.endswith(".npz") else path + ".npz")
        restored = [f[f"leaf_{i}"] for i in range(len(leaves))]
    import jax.numpy as jnp
    restored = [jnp.asarray(r, l.dtype if hasattr(l, "dtype") else None)
                for r, l in zip(restored, leaves)]
    return jax.tree_util.tree_unflatten(treedef, restored)
