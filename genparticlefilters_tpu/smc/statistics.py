"""Weighted posterior statistics (ref: /root/reference/src/statistics.jl).

``mean``/``var``/``proportionmap`` over a trace address (or the return
value), with an optional mapped function over one or more addresses — the
reference's 15 method overloads (src/statistics.jl:13-130) collapse into
three address-polymorphic functions. ``mean``/``var`` are jittable reductions
over the particle axis; ``proportionmap`` is a host-side diagnostic (returns
a Python dict keyed by unique values, like StatsBase's weighted countmap).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .state import get_norm_weights, batched_choice

__all__ = ["mean", "var", "proportionmap"]


def _values(state, addr, fn, addrs):
    if addr is None:
        from ..core.batching import spec_map, moveaxis_to_front
        traces = state.traces
        vals = traces.get_retval()
        # present retvals particle-first regardless of storage layout
        # (retval_axes: the spec of the MATERIALIZED retval — packed
        # storages keep the stored-form spec empty at the retval slot)
        rspec = traces.gen_fn.retval_axes(traces)
        vals = spec_map(
            lambda v, ax: v if ax is None else moveaxis_to_front(v, ax),
            vals, rspec)
        if fn is not None:
            vals = fn(vals)
    else:
        vals = batched_choice(state, addr)
        if fn is not None:
            extra = [batched_choice(state, a) for a in addrs]
            vals = fn(vals, *extra)
    return vals


def _wsum_leaf(w, x):
    x = jnp.asarray(x, jnp.float32)
    wshape = w.shape + (1,) * (x.ndim - 1)
    return jnp.sum(w.reshape(wshape) * x, axis=0)


def _wsum(w, x):
    """Weighted sum over the particle axis, mapped over pytree leaves (a
    tuple-valued Unfold retval yields a tuple of means)."""
    return jax.tree_util.tree_map(lambda v: _wsum_leaf(w, v), x)


def mean(state, addr=None, fn: Callable | None = None, *addrs):
    """Weighted empirical mean at ``addr`` (or of the retval / a mapped
    function of several addresses). Ref: src/statistics.jl:13-38."""
    if callable(addr) and fn is None:
        # mean(fn, state-style) convenience: mean(state, fn=...) preferred
        fn, addr = addr, None
    w = get_norm_weights(state)
    vals = _values(state, addr, fn, addrs)
    return _wsum(w, vals)


def var(state, addr=None, fn: Callable | None = None, *addrs):
    """Weighted (uncorrected) empirical variance. Ref: src/statistics.jl:48-82."""
    if callable(addr) and fn is None:
        fn, addr = addr, None
    w = get_norm_weights(state)
    vals = _values(state, addr, fn, addrs)
    mu = _wsum(w, vals)
    return jax.tree_util.tree_map(
        lambda v, m: _wsum_leaf(w, (jnp.asarray(v, jnp.float32) - m) ** 2),
        vals, mu)


def proportionmap(state, addr=None, fn: Callable | None = None, *addrs):
    """Dict mapping each unique value at ``addr`` to its total normalized
    weight (ref: src/statistics.jl:91-130). Host-side (not jittable)."""
    if callable(addr) and fn is None:
        fn, addr = addr, None
    w = np.asarray(get_norm_weights(state))
    vals = np.asarray(_values(state, addr, fn, addrs))
    out = {}
    for v, wi in zip(vals.tolist(), w.tolist()):
        key = tuple(v) if isinstance(v, list) else v
        out[key] = out.get(key, 0.0) + wi
    return out
