"""Shard-local resampling and cross-shard exchange.

The reference's sub-state resampling semantics
(/root/reference/src/resample.jl:205-218: preserve each block's total
weight, never touch the global LML) are exactly the correctness spec for
**shard-local resampling**: with the particle axis sharded over a mesh,
``pf_resample_blockwise(n_blocks = mesh size)`` compiles to per-device
resampling with ZERO inter-chip communication — the ancestor gather stays
inside each shard. Global diagnostics (ESS, LML, normalization) on sharded
arrays lower to single ``all-reduce``s over ICI, which XLA inserts
automatically.

Periodic cross-shard mixing (``pf_shuffle_blocks``: a block-transpose
all-to-all, or a ``pf_rotate_blocks`` ppermute-style ring rotation) bounds
the weight imbalance between shards; exact global resampling
(:func:`~..smc.resample.pf_resample`) remains available when the full
ancestry permutation (an all-to-all) is worth the bandwidth.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.random as jr

from ..smc.resample import (multinomial_parents, residual_parents,
                            stratified_parents, systematic_parents,
                            _gather_traces)
from ..smc.state import ParticleFilterState
from ..utils.weights import safe_softmax, logsumexp

__all__ = ["pf_resample_blockwise", "pf_shuffle_blocks", "pf_rotate_blocks",
           "block_log_weight_imbalance"]

_PARENT_FNS = {
    "multinomial": lambda k, w, lp: multinomial_parents(k, w),
    "residual": lambda k, w, lp: residual_parents(k, w),
    "stratified": lambda k, w, lp: stratified_parents(k, w,
                                                      log_priorities=lp),
    "systematic": lambda k, w, lp: systematic_parents(k, w,
                                                      log_priorities=lp),
}


def pf_resample_blockwise(key, state: ParticleFilterState, n_blocks: int,
                          method: str = "systematic", priority_fn=None
                          ) -> ParticleFilterState:
    """Resample independently inside each of ``n_blocks`` contiguous blocks
    of the particle axis, preserving each block's total weight (sub-state
    semantics, ref src/resample.jl:205-218). With the particle axis sharded
    over a mesh of ``n_blocks`` devices this is collective-free."""
    n = state.n_particles
    if n % n_blocks != 0:
        raise ValueError(f"n_particles={n} not divisible by {n_blocks}")
    b = n // n_blocks
    try:
        parent_fn = _PARENT_FNS[method]
    except KeyError:
        raise ValueError(f"Resampling method {method!r} not recognized.")
    custom = priority_fn is not None
    lw = state.log_weights.reshape(n_blocks, b)
    lp = priority_fn(lw) if custom else lw
    keys = jr.split(key, n_blocks)

    def per_block(k, lwb, lpb):
        w, _ = safe_softmax(lpb)
        local = parent_fn(k, w, lpb)
        if custom:
            nlw = lwb[local] - lpb[local]
            nlw = nlw + (logsumexp(lwb) - logsumexp(nlw))
        else:
            nlw = jnp.full((b,), logsumexp(lwb) - jnp.log(float(b)),
                           lwb.dtype)
        return local, nlw

    local, new_lw = jax.vmap(per_block)(keys, lw, lp)
    offsets = (jnp.arange(n_blocks, dtype=jnp.int32) * b)[:, None]
    parents = (local + offsets).reshape(n)
    return ParticleFilterState(
        _gather_traces(state.traces, parents),
        new_lw.reshape(n), state.log_ml_est, parents)


def _apply_perm(state: ParticleFilterState, perm) -> ParticleFilterState:
    return ParticleFilterState(
        _gather_traces(state.traces, perm),
        state.log_weights[perm], state.log_ml_est, perm)


def pf_shuffle_blocks(state: ParticleFilterState, n_blocks: int
                      ) -> ParticleFilterState:
    """Deterministic block-transpose mix: new block j holds one particle
    from each old block (stride permutation). On a sharded particle axis
    this is an all-to-all; run it every few steps to decorrelate shards."""
    n = state.n_particles
    perm = jnp.arange(n, dtype=jnp.int32).reshape(
        n_blocks, n // n_blocks).T.reshape(n)
    return _apply_perm(state, perm)


def pf_rotate_blocks(state: ParticleFilterState, n_blocks: int,
                     shift: int = 1) -> ParticleFilterState:
    """Ring-rotate whole blocks by ``shift`` (ppermute over ICI when
    sharded): block j's particles move to block (j+shift) mod K."""
    n = state.n_particles
    b = n // n_blocks
    blocks = jnp.arange(n, dtype=jnp.int32).reshape(n_blocks, b)
    perm = jnp.roll(blocks, shift=-shift, axis=0).reshape(n)
    return _apply_perm(state, perm)


def block_log_weight_imbalance(state: ParticleFilterState, n_blocks: int):
    """max−min of per-block total log weight: the trigger diagnostic for
    cross-shard exchange."""
    b = state.n_particles // n_blocks
    totals = logsumexp(state.log_weights.reshape(n_blocks, b), axis=1)
    return jnp.max(totals) - jnp.min(totals)
