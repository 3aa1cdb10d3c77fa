"""Choice maps as fixed-shape pytrees with presence masks.

The reference manipulates Gen.jl's dynamic, heap-allocated ``ChoiceMap``s
(constructed via ``choicemap``, combined via ``merge``; see e.g.
/root/reference/src/initialize.jl:55-58 and /root/reference/src/utils.jl:84-98).
TPU-native equivalent: a ``ChoiceMap`` is a flat immutable mapping from a
*static* address tuple to an ``Entry(value, mask)``:

- ``value`` is a JAX array (possibly with leading "combinator" axes, e.g. the
  time axis of an :class:`~..core.combinators.Unfold` sub-trace);
- ``mask`` is a boolean presence mask broadcastable against the leading axes
  of ``value`` (the static python bool ``True`` means "fully present" and
  costs nothing under jit).

Integer address components (e.g. ``("line", 5, "y")``) select into the leading
combinator axes of dense entries, mirroring Gen's hierarchical
``:line => 5 => :y`` addresses. Sparse user constraints keep their integer
components until a combinator interpreter densifies them against its static
length.

Everything here is jit-safe: merging is mask algebra (`jnp.where`), never
Python control flow over traced data.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Tuple, Union

import jax
import jax.numpy as jnp

__all__ = [
    "Address", "Entry", "ChoiceMap", "choicemap", "EMPTY",
    "Selection", "select", "ALL", "NONE",
]

AddressComponent = Union[str, int]
Address = Tuple[AddressComponent, ...]


def normalize_address(addr) -> Address:
    if isinstance(addr, tuple):
        return addr
    return (addr,)


class Entry:
    """A value plus a presence mask over its leading (combinator) axes."""

    __slots__ = ("value", "mask")

    def __init__(self, value, mask=True):
        self.value = value
        self.mask = mask

    def __repr__(self):
        return f"Entry({self.value!r}, mask={self.mask!r})"

    def mask_array(self):
        """Mask broadcast to the value's shape as a bool array."""
        if self.mask is True:
            return jnp.ones(jnp.shape(self.value), dtype=bool)
        m = jnp.asarray(self.mask, dtype=bool)
        extra = len(jnp.shape(self.value)) - m.ndim
        if extra > 0:
            m = m.reshape(m.shape + (1,) * extra)
        return jnp.broadcast_to(m, jnp.shape(self.value))


def _entry_flatten(e):
    if e.mask is True:
        return (e.value,), True
    return (e.value, e.mask), False


def _entry_unflatten(static_full, children):
    if static_full:
        return Entry(children[0], True)
    return Entry(children[0], children[1])


jax.tree_util.register_pytree_node(Entry, _entry_flatten, _entry_unflatten)


class ChoiceMap:
    """Immutable flat map from address tuples to entries."""

    __slots__ = ("entries",)

    def __init__(self, entries: Dict[Address, Entry] | None = None):
        self.entries = dict(entries) if entries else {}

    # -- construction -----------------------------------------------------
    @staticmethod
    def from_pairs(pairs: Iterable[Tuple[Any, Any]]) -> "ChoiceMap":
        entries = {}
        for addr, value in pairs:
            entries[normalize_address(addr)] = (
                value if isinstance(value, Entry) else Entry(jnp.asarray(value))
            )
        return ChoiceMap(entries)

    def set(self, addr, value, mask=True) -> "ChoiceMap":
        entries = dict(self.entries)
        entries[normalize_address(addr)] = Entry(value, mask)
        return ChoiceMap(entries)

    # -- queries ----------------------------------------------------------
    def is_empty(self) -> bool:
        """Structurally empty (no entries at all)."""
        return not self.entries

    def addresses(self):
        return self.entries.keys()

    def has(self, addr) -> bool:
        return normalize_address(addr) in self.entries

    def scope(self, name: AddressComponent) -> "ChoiceMap":
        """Sub-map of entries under the first address component ``name``."""
        out = {}
        for k, v in self.entries.items():
            if k and k[0] == name:
                out[k[1:]] = v
        return ChoiceMap(out)

    def leaf(self) -> Entry | None:
        """Entry at the empty address (after full scoping), if any."""
        return self.entries.get(())

    def int_keyed(self):
        """Entries whose first component is an int: {int: sub-ChoiceMap}."""
        out: Dict[int, Dict[Address, Entry]] = {}
        for k, v in self.entries.items():
            if k and isinstance(k[0], int):
                out.setdefault(k[0], {})[k[1:]] = v
        return {i: ChoiceMap(d) for i, d in out.items()}

    def str_keyed(self) -> "ChoiceMap":
        """Entries whose first component is NOT an int."""
        return ChoiceMap({k: v for k, v in self.entries.items()
                          if not (k and isinstance(k[0], int))})

    def locate(self, addr):
        """Resolve ``addr`` to ``(entry_key, idxs, entry)`` where
        ``entry_key`` is the stored address whose entry matched, ``idxs``
        the int components consumed as dense combinator-axis indices, and
        ``entry`` the raw (unindexed) Entry — or None when absent."""
        comps = normalize_address(addr)
        d = {k: (k, v) for k, v in self.entries.items()}
        idxs = []
        for c in comps:
            if isinstance(c, int) and not any(
                    k and k[0] == c for k in d):
                idxs.append(c)
            else:
                d = {k[1:]: kv for k, kv in d.items() if k and k[0] == c}
        kv = d.get(())
        if kv is None:
            return None
        return kv[0], tuple(idxs), kv[1]

    def resolve(self, addr, batch_axes: int = 0):
        """Look up ``addr``; int components index the leading combinator
        axes of dense entries, AFTER skipping ``batch_axes`` leading batch
        (e.g. particle) axes. Returns ``Entry`` or None."""
        loc = self.locate(addr)
        if loc is None:
            return None
        _, idxs, e = loc
        idxs = list(idxs)
        if idxs:
            sel = (slice(None),) * batch_axes + tuple(idxs)
            value = jnp.asarray(e.value)[sel]
            if e.mask is True:
                mask = True
            else:
                m = jnp.asarray(e.mask, dtype=bool)
                msel = tuple(s for s in sel[: m.ndim])
                mask = m[msel]
            return Entry(value, mask)
        return e

    def __getitem__(self, addr):
        e = self.resolve(addr)
        if e is None:
            raise KeyError(addr)
        return e.value

    def get_mask(self, addr):
        e = self.resolve(addr)
        if e is None:
            raise KeyError(addr)
        return e.mask

    # -- algebra ----------------------------------------------------------
    def merge(self, other: "ChoiceMap") -> "ChoiceMap":
        """Merge; where both maps have a (masked) entry at the same address,
        ``other`` wins wherever its mask is set.

        Mirrors Gen's ``merge(observations, prop_choices)`` usage
        (/root/reference/src/initialize.jl:57) but with mask algebra so the
        merged entry stays a fixed-shape array under jit.
        """
        entries = dict(self.entries)
        for k, e2 in other.entries.items():
            e1 = entries.get(k)
            if e1 is None:
                entries[k] = e2
            else:
                if e2.mask is True:
                    entries[k] = e2
                else:
                    m2 = e2.mask_array()
                    value = jnp.where(
                        m2, jnp.broadcast_to(jnp.asarray(e2.value, dtype=jnp.result_type(e1.value, e2.value)), m2.shape),
                        jnp.broadcast_to(jnp.asarray(e1.value, dtype=jnp.result_type(e1.value, e2.value)), m2.shape))
                    if e1.mask is True:
                        mask = True
                    else:
                        mask = jnp.logical_or(e1.mask_array(), m2)
                    entries[k] = Entry(value, mask)
        return ChoiceMap(entries)

    def prefix(self, name: AddressComponent) -> "ChoiceMap":
        """Re-key every entry under the address prefix ``name``."""
        return ChoiceMap({(name,) + k: v for k, v in self.entries.items()})

    def map_values(self, fn) -> "ChoiceMap":
        return ChoiceMap({k: Entry(fn(v.value), v.mask)
                          for k, v in self.entries.items()})

    def __repr__(self):
        items = ", ".join(f"{k}: {v!r}" for k, v in self.entries.items())
        return f"ChoiceMap({{{items}}})"

    def total_mask_any(self):
        """Traced bool: does any entry have a set mask bit? (jit-safe
        emptiness check for masked discards; see pf_update's discard check,
        /root/reference/src/update.jl:18-20)."""
        if not self.entries:
            return jnp.asarray(False)
        flags = []
        for e in self.entries.values():
            if e.mask is True:
                return jnp.asarray(True)
            flags.append(jnp.any(e.mask_array()))
        return jnp.any(jnp.stack(flags))


def _cm_flatten(cm):
    keys = tuple(sorted(cm.entries.keys(), key=repr))
    children = tuple(cm.entries[k] for k in keys)
    return children, keys


def _cm_unflatten(keys, children):
    return ChoiceMap(dict(zip(keys, children)))


jax.tree_util.register_pytree_node(ChoiceMap, _cm_flatten, _cm_unflatten)

EMPTY = ChoiceMap()


def choicemap(*pairs) -> ChoiceMap:
    """Construct a :class:`ChoiceMap` from ``(addr, value)`` pairs.

    Mirrors Gen's ``choicemap((addr, val), ...)``.
    """
    if len(pairs) == 1 and isinstance(pairs[0], (list,)):
        pairs = tuple(pairs[0])
    return ChoiceMap.from_pairs(pairs)


# ---------------------------------------------------------------------------
# Selections
# ---------------------------------------------------------------------------

class Selection:
    """A (possibly masked) set of addresses, used by ``regenerate``.

    ``entries`` maps address tuples to boolean masks (python ``True`` or a
    bool array over leading combinator axes). ``all_`` selects everything.
    Mirrors Gen's ``select(addrs...)`` (used at /root/reference/README.md:72).
    """

    __slots__ = ("entries", "all_")

    def __init__(self, entries=None, all_: bool = False):
        self.entries = dict(entries) if entries else {}
        self.all_ = all_

    def scope(self, name: AddressComponent) -> "Selection":
        if self.all_:
            return ALL
        out = {}
        for k, v in self.entries.items():
            if k and k[0] == name:
                out[k[1:]] = v
        return Selection(out)

    def int_keyed(self):
        out: Dict[int, Dict[Address, Any]] = {}
        for k, v in self.entries.items():
            if k and isinstance(k[0], int):
                out.setdefault(k[0], {})[k[1:]] = v
        return {i: Selection(d) for i, d in out.items()}

    def str_keyed(self) -> "Selection":
        if self.all_:
            return ALL
        return Selection({k: v for k, v in self.entries.items()
                          if not (k and isinstance(k[0], int))})

    def mask_at_leaf(self):
        """Selection mask at the empty address: True / False / bool array."""
        if self.all_:
            return True
        return self.entries.get((), False)

    def is_empty(self) -> bool:
        return not self.all_ and not self.entries

    def __repr__(self):
        if self.all_:
            return "Selection(ALL)"
        return f"Selection({list(self.entries.keys())})"


def _sel_flatten(s):
    keys = tuple(sorted(s.entries.keys(), key=repr))
    static_vals = []
    children = []
    for k in keys:
        v = s.entries[k]
        if v is True or v is False:
            static_vals.append(v)
            children.append(None)
        else:
            static_vals.append(None)
            children.append(v)
    return tuple(children), (keys, tuple(static_vals), s.all_)


def _sel_unflatten(aux, children):
    keys, static_vals, all_ = aux
    entries = {}
    for k, sv, c in zip(keys, static_vals, children):
        entries[k] = sv if sv is not None else c
    return Selection(entries, all_)


jax.tree_util.register_pytree_node(Selection, _sel_flatten, _sel_unflatten)

ALL = Selection(all_=True)
NONE = Selection()


def select(*addrs) -> Selection:
    """Construct a Selection from addresses (str or tuples, ints allowed)."""
    return Selection({normalize_address(a): True for a in addrs})
