"""Packed time-major step storage for :class:`~.combinators.Unfold` traces.

Every per-step per-particle 4-byte leaf of an Unfold's stacked storage —
site values, stacked sub-trace leaves, and the stacked retval carries —
lives in ONE int32 matrix ``mat [T*R, N]`` (``R`` rows per step, particle
axis on lanes; per-particle form under ``vmap``: ``mat [T*R]``). Why this
layout (the round-5 structural rework, see docs/performance.md):

- **trace extension / window rejuvenation write one contiguous [k·R, N]
  slab** per ``Extend(k)``/window instead of one (8,128)-tile
  read-modify-write row write per leaf per step;
- **the resampling gather reads ``mat`` in place as a single [T*R, N]
  piece** — the per-leaf ``moveaxis``/reshape/concat packing pass
  disappears entirely (on the MOT config the moveaxis alone materializes
  two ~320 MB transposes per resample at N=1M);
- **the gathered matrix is the new ``mat``** — no unpack pass either.

Stacked leaves that cannot pack stay ordinary pytree leaves in
``extras``: values shared across particles (fully-constrained
observation sites, spec ``None`` — see core/batching.py), zero-size
placeholders, and dtypes outside {f32, i32, u32, bool}.

The same :class:`StorageLayout` (static, hashable — it is the pytree aux
data) describes both the batched form (``mat [T*R, N]``) and the
per-particle form under ``vmap`` (``mat [T*R]``); which form an instance
is in is decided by ``mat.ndim``, so ``jax.vmap`` with the particle axis
at ``mat``-axis 1 maps one form onto the other mechanically.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["StepStorage", "StorageLayout", "LeafSpec", "make_storage",
           "unpack_tree", "read_step", "write_steps", "zeros_column",
           "read_leaf_rows", "pack_column", "materialize_storages"]

_KIND_MAT = 0
_KIND_EXTRA = 1
_KIND_ZERO = 2

_PACKABLE = ("float32", "int32", "uint32", "bool")


class LeafSpec(NamedTuple):
    """Static descriptor of one leaf of the logical stacked tree."""
    kind: int           # _KIND_MAT | _KIND_EXTRA | _KIND_ZERO
    off: int            # mat: row offset within a step slab; extra: index
    width: int          # mat: rows per step (= prod(tail))
    dtype: str          # canonical dtype name of the logical leaf
    tail: Tuple[int, ...]  # per-step value shape EXCLUDING the particle axis
    pax: object         # particle-axis position in the batched stacked leaf
                        # (int) or None if the leaf never holds one


class StorageLayout(NamedTuple):
    """Static layout: logical treedef + per-leaf specs. Hashable (pytree
    aux data); equality is structural."""
    treedef: object
    specs: Tuple[LeafSpec, ...]
    T: int
    R: int


@jax.tree_util.register_pytree_node_class
class StepStorage:
    """Pytree node: ``mat`` (packed rows, int32 ``[T*R, N]`` batched /
    ``[T*R]`` per-particle; ``None`` when no leaf packs) + ``extras``
    (tuple of ordinary stacked leaves)."""

    __slots__ = ("mat", "extras", "layout")

    def __init__(self, mat, extras, layout: StorageLayout):
        self.mat = mat
        self.extras = extras
        self.layout = layout

    def tree_flatten(self):
        return (self.mat, self.extras), self.layout

    @classmethod
    def tree_unflatten(cls, layout, children):
        return cls(children[0], children[1], layout)

    def __repr__(self):
        m = None if self.mat is None else getattr(self.mat, "shape", "?")
        return (f"StepStorage(mat={m}, extras={len(self.extras)}, "
                f"T={self.layout.T}, R={self.layout.R})")

    # -- form probes -------------------------------------------------------
    @property
    def batched(self):
        """True when ``mat`` carries the particle (lane) axis. Storages
        without any packed leaf are form-degenerate; both answers are
        then equivalent (every leaf lives in ``extras``)."""
        return self.mat is not None and jnp.ndim(self.mat) == 2

    @property
    def n(self):
        return self.mat.shape[-1] if self.batched else None


def _to_i32(x, dtype):
    if dtype == "float32":
        return lax.bitcast_convert_type(x, jnp.int32)
    if dtype == "bool":
        return x.astype(jnp.int32)
    if dtype == "int32":
        return x
    return x.astype(jnp.int32)


def _from_i32(x, dtype):
    if dtype == "float32":
        return lax.bitcast_convert_type(x, jnp.float32)
    if dtype == "bool":
        return x != 0
    if dtype == "int32":
        return x
    return x.astype(jnp.dtype(dtype))


def _prod(t):
    p = 1
    for v in t:
        p *= int(v)
    return p


def make_storage(tree, spec, T: int, batched: bool) -> StepStorage:
    """Build packed storage from the logical stacked tree + its particle-
    axis spec tree (a prefix-compatible pytree of int/None, e.g. from
    ``gen_spec``/``trace_axes`` at axis offset 1).

    ``batched`` says which form the logical tree is in (it cannot be
    inferred from shapes: a per-particle ``[T, K, 2]`` leaf and a batched
    ``[T, N, ...]`` leaf look alike). Batched: a leaf packs iff it has a
    4-byte-class dtype, leading ``T``, a non-``None`` particle axis per
    ``spec``, and non-zero size; its spec position IS the particle axis.
    Per-particle (under ``vmap``, where every leaf is per-particle and no
    sharing exists): same rule, with the spec position recording where
    ``vmap`` will INSERT the particle axis when stacking. The packing
    transform per batched leaf ``[T, ...pre, N, ...post]`` is
    ``moveaxis(pax → last) → [T, w, N]``; all leaves concat on the row
    axis and reshape to ``[T*R, N]``."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    spec_elems = treedef.flatten_up_to(spec)
    specs = []
    mat_parts = []       # per leaf [T, w, N] or [T, w]
    extras = []
    off = 0
    for l, ax in zip(leaves, spec_elems):
        shape = jnp.shape(l)
        dt = getattr(l, "dtype", None)
        dname = None if dt is None else jnp.dtype(dt).name
        pax = ax if isinstance(ax, int) else None
        packable = (dname in _PACKABLE and len(shape) >= 1
                    and shape[0] == T and pax is not None
                    and (not batched or len(shape) > pax))
        if batched and packable:
            tail = tuple(shape[1:pax] + shape[pax + 1:])
        elif packable:
            tail = tuple(shape[1:])
        if packable and _prod(shape) == 0:
            specs.append(LeafSpec(_KIND_ZERO, -1, 0, dname, tail, pax))
            continue
        if not packable:
            specs.append(LeafSpec(_KIND_EXTRA, len(extras), 0, dname,
                                  (), pax))
            extras.append(l)
            continue
        x = _to_i32(jnp.asarray(l), dname)
        if batched:
            if pax != len(shape) - 1:
                x = jnp.moveaxis(x, pax, -1)
            n = shape[pax]
            part = x.reshape(T, -1, n)
        else:
            part = x.reshape(T, -1)
        w = _prod(tail)
        specs.append(LeafSpec(_KIND_MAT, off, w, dname, tail, pax))
        off += w
        mat_parts.append(part)
    R = off
    if mat_parts:
        cat = jnp.concatenate(mat_parts, axis=1) if len(mat_parts) > 1 \
            else mat_parts[0]
        mat = cat.reshape((T * R,) + cat.shape[2:])
    else:
        mat = None
    layout = StorageLayout(treedef, tuple(specs), T, R)
    return StepStorage(mat, tuple(extras), layout)


def _stacked_from_rows(rows, s: LeafSpec, T: int, batched):
    """[T*w(,N)] rows -> the logical stacked leaf."""
    if batched:
        n = rows.shape[-1]
        x = rows.reshape((T,) + s.tail + (n,))
        if s.pax != x.ndim - 1:
            x = jnp.moveaxis(x, -1, s.pax)
    else:
        x = rows.reshape((T,) + s.tail)
    return _from_i32(x, s.dtype)


def unpack_tree(st: StepStorage):
    """Materialize the full logical stacked tree (cold paths: choicemaps,
    statistics, full-scan interpreters that want leaf views)."""
    lo = st.layout
    T, R = lo.T, lo.R
    batched = st.mat is not None and jnp.ndim(st.mat) == 2
    n = st.mat.shape[-1] if batched else None
    m3 = None
    if st.mat is not None:
        m3 = st.mat.reshape((T, R) + st.mat.shape[1:])
    out = []
    for s in lo.specs:
        if s.kind == _KIND_EXTRA:
            out.append(st.extras[s.off])
        elif s.kind == _KIND_ZERO:
            if batched:
                shape = ((T,) + s.tail + (n,))
                x = jnp.zeros(shape, jnp.dtype(s.dtype))
                if s.pax != len(shape) - 1:
                    x = jnp.moveaxis(x, -1, s.pax)
            else:
                x = jnp.zeros((T,) + s.tail, jnp.dtype(s.dtype))
            out.append(x)
        else:
            rows = m3[:, s.off:s.off + s.width]
            rows = rows.reshape((T * s.width,) + rows.shape[2:])
            out.append(_stacked_from_rows(rows, s, T, batched))
    return jax.tree_util.tree_unflatten(lo.treedef, out)


def read_leaf_rows(st: StepStorage, leaf_index: int, t, k: int = 1):
    """Rows of one mat leaf for ``k`` steps starting at traced step ``t``:
    returns ``[k*w(,N)]`` raw int32 rows (callers reshape via the spec)."""
    lo = st.layout
    s = lo.specs[leaf_index]
    start = t * lo.R + s.off
    if k == 1:
        if jnp.ndim(st.mat) == 2:
            return lax.dynamic_slice(
                st.mat, (start, 0), (s.width, st.mat.shape[1]))
        return lax.dynamic_slice(st.mat, (start,), (s.width,))
    raise NotImplementedError


def _column_from_rows(rows, s: LeafSpec, batched):
    """[w(,N)] slab rows -> the logical per-step column value."""
    if batched:
        n = rows.shape[-1]
        x = rows.reshape(s.tail + (n,))
        # column pax: stacked pax minus the dropped time axis
        cax = s.pax - 1
        if cax != x.ndim - 1:
            x = jnp.moveaxis(x, -1, cax)
    else:
        x = rows.reshape(s.tail)
    return _from_i32(x, s.dtype)


def _rows_from_column(v, s: LeafSpec, batched, n):
    """Logical per-step column value -> [w(,N)] slab rows. Under-shaped
    column values (shared/scalar values written into a per-particle leaf,
    e.g. proto-zeros or an unbatched state0 carry) broadcast in."""
    x = _to_i32(jnp.asarray(v, jnp.dtype(s.dtype)), s.dtype)
    if batched:
        cax = s.pax - 1
        full = s.tail[:cax] + (n,) + s.tail[cax:]
        if tuple(jnp.shape(x)) != full:
            x = jnp.broadcast_to(x, full)
        if cax != len(full) - 1:
            x = jnp.moveaxis(x, cax, -1)
        return x.reshape(s.width, n)
    if tuple(jnp.shape(x)) != s.tail:
        x = jnp.broadcast_to(x, s.tail)
    return x.reshape(s.width)


def read_step(st: StepStorage, t):
    """The logical per-step column tree at traced step ``t`` (the packed
    analogue of ``_tree_read_at``): one dynamic row-slab slice of ``mat``
    plus per-extra leading-axis reads."""
    lo = st.layout
    batched = st.mat is not None and jnp.ndim(st.mat) == 2
    slab = None
    if st.mat is not None:
        if batched:
            slab = lax.dynamic_slice(st.mat, (t * lo.R, 0),
                                     (lo.R, st.mat.shape[1]))
        else:
            slab = lax.dynamic_slice(st.mat, (t * lo.R,), (lo.R,))
    n = st.mat.shape[-1] if batched else None
    out = []
    for s in lo.specs:
        if s.kind == _KIND_MAT:
            out.append(_column_from_rows(slab[s.off:s.off + s.width], s,
                                         batched))
        elif s.kind == _KIND_ZERO:
            if batched and s.pax is not None:
                shape = s.tail + (n,)
                x = jnp.zeros(shape, jnp.dtype(s.dtype))
                cax = s.pax - 1
                if cax != len(shape) - 1:
                    x = jnp.moveaxis(x, -1, cax)
            else:
                x = jnp.zeros(s.tail, jnp.dtype(s.dtype))
            out.append(x)
        else:
            e = st.extras[s.off]
            out.append(lax.dynamic_index_in_dim(e, t, axis=0,
                                                keepdims=False))
    return jax.tree_util.tree_unflatten(lo.treedef, out)


def zeros_column(st: StepStorage):
    """A structural-zeros per-step column tree (the extension proto)."""
    lo = st.layout
    batched = st.mat is not None and jnp.ndim(st.mat) == 2
    n = st.mat.shape[-1] if batched else None
    out = []
    for s in lo.specs:
        if s.kind == _KIND_EXTRA:
            e = st.extras[s.off]
            out.append(jnp.zeros(jnp.shape(e)[1:],
                                 getattr(e, "dtype", jnp.float32)))
        else:
            if batched and s.pax is not None:
                shape = s.tail + (n,)
                x = jnp.zeros(shape, jnp.dtype(s.dtype))
                cax = s.pax - 1
                if cax != len(shape) - 1:
                    x = jnp.moveaxis(x, -1, cax)
            else:
                x = jnp.zeros(s.tail, jnp.dtype(s.dtype))
            out.append(x)
    return jax.tree_util.tree_unflatten(lo.treedef, out)


def pack_column(st: StepStorage, col_tree):
    """Logical per-step column tree -> ``(slab [R(,N)], extra_cols)``."""
    lo = st.layout
    batched = st.mat is not None and jnp.ndim(st.mat) == 2
    n = st.mat.shape[-1] if batched else None
    cols = lo.treedef.flatten_up_to(col_tree)
    parts = []
    extra_cols = [None] * len(st.extras)
    for v, s in zip(cols, lo.specs):
        if s.kind == _KIND_MAT:
            parts.append(_rows_from_column(v, s, batched, n))
        elif s.kind == _KIND_EXTRA:
            extra_cols[s.off] = v
    if not parts:
        return None, extra_cols
    slab = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    return slab, extra_cols


def write_steps(st: StepStorage, t0, cols) -> StepStorage:
    """Write ``k = len(cols)`` consecutive per-step column trees starting
    at traced step ``t0``: ONE ``[k*R(,N)]`` dynamic-update-slice on
    ``mat`` (the packed analogue of k× ``_tree_write_at``) plus per-extra
    leading-axis row writes."""
    lo = st.layout
    mat = st.mat
    extras = list(st.extras)
    slabs = []
    for j, col in enumerate(cols):
        slab, extra_cols = pack_column(st, col)
        if slab is not None:
            slabs.append(slab)
        for i, v in enumerate(extra_cols):
            if v is None:
                continue
            e = extras[i]
            extras[i] = lax.dynamic_update_index_in_dim(
                e, jnp.asarray(v, e.dtype), t0 + j, axis=0)
    if slabs and mat is not None:
        big = jnp.concatenate(slabs, axis=0) if len(slabs) > 1 else slabs[0]
        if jnp.ndim(mat) == 2:
            mat = lax.dynamic_update_slice(mat, big, (t0 * lo.R, 0))
        else:
            mat = lax.dynamic_update_slice(mat, big, (t0 * lo.R,))
    return StepStorage(mat, tuple(extras), lo)


def materialize_storages(tree):
    """Replace every :class:`StepStorage` in a pytree with its materialized
    logical stacked tree (used by layout-equivalence checks so batched and
    per-particle packings compare in logical form)."""
    def one(x):
        if isinstance(x, StepStorage):
            return materialize_storages(unpack_tree(x))
        return x
    return jax.tree_util.tree_map(
        one, tree, is_leaf=lambda x: isinstance(x, StepStorage))
