"""Resampling (ref: /root/reference/src/resample.jl).

Methods: multinomial (ref lines 48-65), residual (85-120), stratified
(143-175), plus systematic (single shared uniform; standard variance
reduction, used by BASELINE config 2). All support ``priority_fn`` and the
``check`` policy, fold the LML estimate *before* resampling
(``update_lml_est!``, ref lines 178-182), and reproduce the post-resample
weight semantics exactly (ref lines 190-218): zeros (or weight/priority
ratio summing to n) for full states; block-total-preserving weights for
sub-states, whose LML is never touched (ref lines 185-187).

TPU-native formulation: every data-dependent Julia loop becomes a
sort/cumsum/searchsorted composition with static shapes — residual's
variable copy counts via ``searchsorted(cumsum(⌊Nw⌋), j)``, stratified/
systematic via inverse-CDF lookups of per-stratum uniforms — so resampling
jits, vmaps, and shards. The ancestor gather ``traces[parents]`` is a single
``jax.lax.gather`` over the particle axis (cross-shard exchange lives in
``parallel/``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.random as jr

from ..utils.weights import safe_softmax, apply_check, logsumexp
from .state import ParticleFilterState, ParticleFilterSubState

__all__ = ["pf_resample", "pf_multinomial_resample", "pf_residual_resample",
           "pf_stratified_resample", "pf_systematic_resample",
           "multinomial_parents", "residual_parents", "stratified_parents",
           "systematic_parents"]


# ---------------------------------------------------------------------------
# Parent-index kernels (pure [N]-weights -> [N]-parents functions)
# ---------------------------------------------------------------------------

def multinomial_parents(key, weights, n_out: int | None = None):
    """IID categorical ancestors (ref: src/resample.jl:59)."""
    n_out = weights.shape[0] if n_out is None else n_out
    return jr.categorical(key, jnp.log(weights), shape=(n_out,)).astype(
        jnp.int32)


def residual_parents(key, weights, n_out: int | None = None):
    """⌊n·w⌋ deterministic copies first (in particle order), remainder
    multinomial on the residuals (ref: src/resample.jl:96-115)."""
    n = weights.shape[0]
    n_out = n if n_out is None else n_out
    scaled = n_out * weights
    counts = jnp.floor(scaled).astype(jnp.int32)
    n_det = jnp.sum(counts)
    cum = jnp.cumsum(counts)
    j = jnp.arange(n_out, dtype=jnp.int32)
    det_parent = jnp.clip(
        jnp.searchsorted(cum, j, side="right"), 0, n - 1).astype(jnp.int32)
    resid = scaled - jnp.floor(scaled)
    resid_total = jnp.sum(resid)
    logits = jnp.where(resid_total > 0, jnp.log(resid), 0.0)
    r_parent = jr.categorical(key, logits, shape=(n_out,)).astype(jnp.int32)
    return jnp.where(j < n_det, det_parent, r_parent)


def _inverse_cdf_parents(weights, u, order):
    cum = jnp.cumsum(weights[order])
    idx = jnp.clip(jnp.searchsorted(cum, u, side="left"),
                   0, weights.shape[0] - 1)
    return order[idx].astype(jnp.int32)


def stratified_parents(key, weights, n_out: int | None = None,
                       log_priorities=None, sort_particles: bool = True):
    """One uniform per stratum [i/n,(i+1)/n), optional sort by weight desc
    first (ref: src/resample.jl:154-170)."""
    n = weights.shape[0]
    n_out = n if n_out is None else n_out
    if sort_particles:
        keysort = weights if log_priorities is None else log_priorities
        order = jnp.argsort(-keysort, stable=True).astype(jnp.int32)
    else:
        order = jnp.arange(n, dtype=jnp.int32)
    u = (jnp.arange(n_out, dtype=jnp.float32)
         + jr.uniform(key, (n_out,), dtype=jnp.float32)) / n_out
    return _inverse_cdf_parents(weights, u, order)


def systematic_parents(key, weights, n_out: int | None = None,
                       log_priorities=None, sort_particles: bool = True):
    """Single shared uniform offset across all strata (lowest-variance
    single-pass scheme; companion to stratified)."""
    n = weights.shape[0]
    n_out = n if n_out is None else n_out
    if sort_particles:
        keysort = weights if log_priorities is None else log_priorities
        order = jnp.argsort(-keysort, stable=True).astype(jnp.int32)
    else:
        order = jnp.arange(n, dtype=jnp.int32)
    u0 = jr.uniform(key, (), dtype=jnp.float32)
    u = (jnp.arange(n_out, dtype=jnp.float32) + u0) / n_out
    return _inverse_cdf_parents(weights, u, order)


# ---------------------------------------------------------------------------
# State-level resampling
# ---------------------------------------------------------------------------

def _gather_traces(traces, parents):
    return jax.tree_util.tree_map(lambda l: l[parents], traces)


def _new_weights_full(n, log_weights, log_priorities, parents, custom):
    """Post-resample weights, full state (ref: src/resample.jl:190-202)."""
    if not custom:
        return jnp.zeros((n,), log_weights.dtype)
    lw = log_weights[parents] - log_priorities[parents]
    return lw + (jnp.log(float(n)) - logsumexp(lw))


def _new_weights_sub(n, log_weights, log_priorities, parents, custom):
    """Post-resample weights, sub-state: preserve the block's total weight
    (ref: src/resample.jl:205-218)."""
    if not custom:
        avg = logsumexp(log_weights) - jnp.log(float(n))
        return jnp.full((n,), avg, log_weights.dtype)
    lw = log_weights[parents] - log_priorities[parents]
    return lw + (logsumexp(log_weights) - logsumexp(lw))


def _resample_impl(key, state, parent_fn, priority_fn, check):
    is_sub = isinstance(state, ParticleFilterSubState)
    log_weights = state.log_weights
    n = state.n_particles
    custom = priority_fn is not None
    log_priorities = priority_fn(log_weights) if custom else log_weights
    weights, invalid = safe_softmax(log_priorities)
    apply_check(invalid, check)

    parents = parent_fn(key, weights, log_priorities)
    new_traces = _gather_traces(state.traces, parents)
    if is_sub:
        new_lw = _new_weights_sub(n, log_weights, log_priorities, parents,
                                  custom)
        # sub-states never touch the global LML (ref: src/resample.jl:185-187);
        # record parents as global indices so full-state ancestry holds
        src = state.scatter(traces=new_traces, log_weights=new_lw,
                            parents=state.idxs[parents])
        return src
    # fold LML before resampling (ref: src/resample.jl:178-182)
    new_lml = state.log_ml_est + logsumexp(log_weights) - jnp.log(float(n))
    new_lw = _new_weights_full(n, log_weights, log_priorities, parents,
                               custom)
    return ParticleFilterState(new_traces, new_lw, new_lml, parents)


def pf_multinomial_resample(key, state, priority_fn=None, check="warn"):
    return _resample_impl(
        key, state, lambda k, w, lp: multinomial_parents(k, w),
        priority_fn, check)


def pf_residual_resample(key, state, priority_fn=None, check="warn"):
    return _resample_impl(
        key, state, lambda k, w, lp: residual_parents(k, w),
        priority_fn, check)


def pf_stratified_resample(key, state, priority_fn=None, check="warn",
                           sort_particles: bool = True):
    return _resample_impl(
        key, state,
        lambda k, w, lp: stratified_parents(
            k, w, log_priorities=lp, sort_particles=sort_particles),
        priority_fn, check)


def pf_systematic_resample(key, state, priority_fn=None, check="warn",
                           sort_particles: bool = True):
    return _resample_impl(
        key, state,
        lambda k, w, lp: systematic_parents(
            k, w, log_priorities=lp, sort_particles=sort_particles),
        priority_fn, check)


_METHODS = {
    "multinomial": pf_multinomial_resample,
    "residual": pf_residual_resample,
    "stratified": pf_stratified_resample,
    "systematic": pf_systematic_resample,
}


def pf_resample(key, state, method: str = "multinomial", **kwargs):
    """Dispatch by method name (ref: src/resample.jl:19-30)."""
    try:
        fn = _METHODS[method]
    except KeyError:
        raise ValueError(f"Resampling method {method!r} not recognized.")
    return fn(key, state, **kwargs)
