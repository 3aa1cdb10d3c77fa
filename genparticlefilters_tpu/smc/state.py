"""Particle filter state container, views, and diagnostics.

Reference: ``ParticleFilterState`` (fields visible at
/root/reference/src/initialize.jl:4-10) holds traces, a double buffer,
log weights, a running log-marginal-likelihood estimate, and parent indices;
``ParticleFilterSubState`` (/root/reference/src/view.jl:16-51) is a view over
an index range enabling block-wise operation.

TPU-native: the state is a registered **pytree dataclass** whose trace leaves
carry a leading particle axis — a functional value, not a mutable container,
so there is no double buffer (``update_refs!``, src/utils.jl:9-20, becomes
ordinary functional update) and the particle axis can be sharded over a
device mesh with ``jax.sharding``. A SubState is a (state, static-indices)
pair; block ops gather, operate, and scatter back — the exact semantics of
shard-local resampling (SURVEY.md §2, parallelism strategies).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import jax.random as jr

from ..core.batching import (axes_spec, choice_axes, tree_take, tree_put,
                             moveaxis_to_front)
from ..core.choicemap import ChoiceMap, normalize_address
from ..core.gfi import Trace
from ..utils.weights import (lognorm, softmax, ess_from_log_weights,
                             logsumexp)

__all__ = [
    "ParticleFilterState", "ParticleFilterSubState", "ParticleFilterView",
    "pf_state",
    "get_traces", "get_log_weights", "get_parents",
    "get_log_norm_weights", "get_norm_weights",
    "effective_sample_size", "get_ess",
    "log_ml_estimate", "get_lml_est",
    "sample_unweighted_traces", "num_particles",
    "batched_choice", "batched_choice_entry",
]


@jax.tree_util.register_pytree_node_class
class ParticleFilterState:
    """traces (leading particle axis) + log_weights [N] + log_ml_est + parents [N]."""

    __slots__ = ("traces", "log_weights", "log_ml_est", "parents")

    def __init__(self, traces: Trace, log_weights, log_ml_est, parents):
        self.traces = traces
        self.log_weights = log_weights
        self.log_ml_est = log_ml_est
        self.parents = parents

    def tree_flatten(self):
        return ((self.traces, self.log_weights, self.log_ml_est,
                 self.parents), None)

    @classmethod
    def tree_unflatten(cls, _, children):
        return cls(*children)

    # -- basic accessors --------------------------------------------------
    @property
    def n_particles(self) -> int:
        return self.log_weights.shape[0]

    def replace(self, **kw) -> "ParticleFilterState":
        vals = {s: getattr(self, s) for s in self.__slots__}
        vals.update(kw)
        return ParticleFilterState(**vals)

    # -- views (ref: src/view.jl:35-48) -----------------------------------
    def view(self, idxs) -> "ParticleFilterSubState":
        return ParticleFilterSubState(self, idxs)

    def __getitem__(self, idxs):
        return self.view(idxs)

    def __repr__(self):
        return (f"ParticleFilterState(n={self.n_particles}, "
                f"log_ml_est={self.log_ml_est})")


class ParticleFilterSubState:
    """A static-index view into a state; block ops return the updated
    source state (functional analogue of src/view.jl)."""

    __slots__ = ("source", "idxs")

    def __init__(self, source: ParticleFilterState, idxs):
        if isinstance(idxs, slice):
            idxs = jnp.arange(source.n_particles)[idxs]
        self.source = source
        self.idxs = jnp.asarray(idxs, jnp.int32)

    @property
    def n_particles(self) -> int:
        return self.idxs.shape[0]

    @property
    def traces(self) -> Trace:
        return tree_take(self.source.traces, self.idxs)

    @property
    def log_weights(self):
        return self.source.log_weights[self.idxs]

    @property
    def parents(self):
        return self.source.parents[self.idxs]

    def scatter(self, traces=None, log_weights=None, parents=None
                ) -> ParticleFilterState:
        """Write block values back into the source, returning a new state."""
        src = self.source
        new_traces = src.traces
        if traces is not None:
            new_traces = tree_put(src.traces, traces, self.idxs)
        lw = src.log_weights
        if log_weights is not None:
            lw = lw.at[self.idxs].set(log_weights)
        pr = src.parents
        if parents is not None:
            pr = pr.at[self.idxs].set(parents)
        return ParticleFilterState(new_traces, lw, src.log_ml_est, pr)

    def __repr__(self):
        return f"ParticleFilterSubState(n={self.n_particles})"


def _sub_flatten(s):
    return (s.source, s.idxs), None


def _sub_unflatten(_, children):
    return ParticleFilterSubState(children[0], children[1])


jax.tree_util.register_pytree_node(
    ParticleFilterSubState, _sub_flatten, _sub_unflatten)


#: isinstance-union of full states and views (ref: src/view.jl:28-33)
ParticleFilterView = (ParticleFilterState, ParticleFilterSubState)


def pf_state(traces: Trace, log_weights=None) -> ParticleFilterState:
    """Construct a state from batched traces (ref: src/initialize.jl:4-10)."""
    n = jax.tree_util.tree_leaves(traces.score)[0].shape[0]
    if log_weights is None:
        log_weights = jnp.zeros((n,), jnp.float32)
    return ParticleFilterState(
        traces, jnp.asarray(log_weights, jnp.float32),
        jnp.asarray(0.0, jnp.float32),
        jnp.arange(n, dtype=jnp.int32))


# ---------------------------------------------------------------------------
# Diagnostics (ref: src/utils.jl:142-194)
# ---------------------------------------------------------------------------

def get_traces(state):
    return state.traces


def get_log_weights(state):
    return state.log_weights


def get_parents(state):
    return state.parents


def num_particles(state):
    return state.n_particles


def get_log_norm_weights(state):
    """Normalized log weights (ref: src/utils.jl:148)."""
    return lognorm(state.log_weights)


def get_norm_weights(state):
    """Normalized weights (ref: src/utils.jl:156)."""
    return softmax(state.log_weights)


def effective_sample_size(state):
    """ESS = 1/Σ ŵ² (ref: src/utils.jl:163-164)."""
    return ess_from_log_weights(state.log_weights)


get_ess = effective_sample_size


def log_ml_estimate(state):
    """Current LML estimate.

    Full state: ``log_ml_est + logsumexp(w) − log n`` (Gen's estimator;
    consistent with the resample-time fold at src/resample.jl:178-182).
    Sub-state: ``source.log_ml_est + logsumexp(w_block) − log n_block``
    (ref: src/utils.jl:174-178).
    """
    n = state.n_particles
    if isinstance(state, ParticleFilterSubState):
        base = state.source.log_ml_est
    else:
        base = state.log_ml_est
    return base + logsumexp(state.log_weights) - jnp.log(float(n))


get_lml_est = log_ml_estimate


def sample_unweighted_traces(key, state, n_samples: int) -> Trace:
    """Sample traces i.i.d. by normalized weight (ref: src/utils.jl:189-194).

    ``multinomial_parents`` emits the draws in clustered (index-sorted)
    order, which is fine for resampling but not for the reference's iid-list
    contract (any prefix of the result is itself an iid sample) — so the
    slots are randomly permuted here, an O(n_samples log² n_samples) sort
    paid only in this user-facing API, never in the resampling hot path."""
    from .resample import multinomial_parents
    kd, kp = jr.split(key)
    idx = multinomial_parents(kd, get_norm_weights(state), n_samples)
    return tree_take(state.traces, jr.permutation(kp, idx))


# ---------------------------------------------------------------------------
# Batched address resolution (used by statistics)
# ---------------------------------------------------------------------------

def batched_choice_entry(choices: ChoiceMap, addr, entry_axes=None,
                         n_particles=None):
    """Resolve ``addr`` against a choicemap, returning ``(value, mask)``.

    ``entry_axes`` maps each stored entry address to its particle-axis
    position (see :func:`~..core.batching.choice_axes` — Unfold entries are
    time-major, so theirs is 1). When given, the returned value/mask are
    PARTICLE-FIRST (``[N, ...]``) regardless of storage layout, and int
    address components index the combinator axes after the particle axis is
    moved to the front. ``entry_axes=None`` means an unbatched
    (per-particle) choicemap: plain combinator-axis indexing."""
    loc = choices.locate(addr)
    if loc is None:
        raise KeyError(addr)
    key, idxs, e = loc
    v = jnp.asarray(e.value)
    m = e.mask if e.mask is True else e.mask_array()
    if entry_axes is not None:
        ax = entry_axes.get(key, 0)

        def pick(x):
            # shape-aware: an entry that cannot hold the particle axis at
            # ``ax`` (rank too small, or wrong extent when n is known) is
            # SHARED across particles (e.g. a fully-constrained observation
            # stored once) — index combinator axes directly
            batched = jnp.ndim(x) > ax and (
                n_particles is None or jnp.shape(x)[ax] == n_particles)
            if batched:
                x = moveaxis_to_front(x, ax)
                return x[(slice(None),) + tuple(idxs)] if idxs else x
            return x[tuple(idxs)] if idxs else x

        return pick(v), (True if m is True else pick(m))
    if idxs:
        v = v[tuple(idxs)]
        if m is not True:
            m = m[tuple(idxs)]
    return v, m


def batched_choice(state, addr):
    """Per-particle values at ``addr``: shape [N, ...] (particle-first
    regardless of the internal time-major storage layout). Sites stored
    SHARED across particles (fully-constrained observations) are broadcast
    to [N, ...] here, so user-facing shapes are layout-independent."""
    traces = state.traces
    choices = traces.get_choices()
    axes = choice_axes(traces.gen_fn, traces)
    n = (state.n_particles if hasattr(state, "n_particles")
         else jax.tree_util.tree_leaves(traces.score)[0].shape[0])
    v, _ = batched_choice_entry(choices, addr, axes, n_particles=n)
    key, _, e = choices.locate(addr)
    ax = axes.get(key, 0)
    shared = jnp.ndim(e.value) <= ax or jnp.shape(e.value)[ax] != n
    if shared:  # broadcast for a layout-independent user-facing view
        v = jnp.broadcast_to(v, (n,) + jnp.shape(v))
    return v
