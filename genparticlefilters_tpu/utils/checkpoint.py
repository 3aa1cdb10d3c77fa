"""Checkpoint / resume for particle filter states (SURVEY.md §5).

The reference has no serialization (state is an in-memory Julia struct);
on preemptible TPU pods checkpointing is table stakes. Because a
:class:`~..smc.state.ParticleFilterState` is a pytree of arrays, orbax
makes this nearly free: we save the flattened leaves plus the treedef-
defining model identity, and restore onto the running model's structure.

Backend selection: orbax when importable, else a portable ``.npz`` of the
flattened leaves. The fallback triggers ONLY on orbax being absent — a real
orbax failure (permissions, partial write, corrupt checkpoint) propagates
to the caller instead of being silently masked by a divergent npz copy.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

__all__ = ["save_state", "restore_state"]


def _orbax_checkpointer():
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        return None
    return ocp.StandardCheckpointer()


def save_state(path: str, state) -> None:
    """Save a ParticleFilterState (or any pytree of arrays) to ``path``.

    Uses orbax when available, else a portable .npz of the flattened leaves.
    Orbax I/O errors propagate (no silent fallback). Zero-size leaves
    (e.g. the slimmed step-trace score placeholders) carry no data and are
    skipped — :func:`restore_state` reconstructs them from ``like``."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    data = [np.asarray(l) for l in leaves if np.asarray(l).size > 0]
    ckptr = _orbax_checkpointer()
    if ckptr is not None:
        ckptr.save(os.path.abspath(path), data, force=True)
        ckptr.wait_until_finished()
        return
    np.savez(path if path.endswith(".npz") else path + ".npz",
             **{f"leaf_{i}": l for i, l in enumerate(data)})


def restore_state(path: str, like) -> Any:
    """Restore a state saved by :func:`save_state`; ``like`` provides the
    pytree structure (e.g. a freshly initialized state of the same model
    and particle count). Orbax I/O errors propagate; the npz path is only
    consulted when orbax is absent or the orbax checkpoint directory does
    not exist (a save made by the npz fallback)."""
    leaves, treedef = jax.tree_util.tree_flatten(like)
    nonzero = [l for l in leaves if np.asarray(l).size > 0]
    ckptr = _orbax_checkpointer()
    if ckptr is not None and os.path.isdir(os.path.abspath(path)):
        data = ckptr.restore(os.path.abspath(path),
                             [np.asarray(l) for l in nonzero])
    else:
        f = np.load(path if path.endswith(".npz") else path + ".npz")
        data = [f[f"leaf_{i}"] for i in range(len(nonzero))]
    import jax.numpy as jnp
    it = iter(data)
    restored = [l if np.asarray(l).size == 0 else
                jnp.asarray(next(it), l.dtype if hasattr(l, "dtype") else None)
                for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, restored)
