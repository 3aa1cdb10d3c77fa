"""Particle filter update / propagate step (ref: /root/reference/src/update.jl).

The reference's per-particle ``update``/translator loop (src/update.jl:15-22,
37-41) becomes one ``jax.vmap`` over the particle axis; the buffer swap
``update_refs!`` disappears (functional state). All seven reference method
overloads are provided through one dispatcher:

- ``pf_update(key, state, new_args, argdiffs, observations)`` — default
  proposal (src/update.jl:12-25)
- ``... , proposal, proposal_args[, transform]`` — ExtendingTraceTranslator
  (src/update.jl:79-96)
- ``... , fwd, fwd_args, bwd, bwd_args[, transform]`` — UpdatingTraceTranslator
  / SMCP³ (src/update.jl:141-161)
- ``pf_update(key, state, translator=...)`` — arbitrary translator
  (src/update.jl:35-44)
- any of the above with ``strata=...`` — stratified update, default layout
  ``interleaved`` (src/update.jl:193-228), weight + log(n_strata)

Works on full states and on :class:`ParticleFilterSubState` views (block-wise
update; ref test coverage at test/update.jl:179-189).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.random as jr

from ..core.batching import vmap_gfi
from ..core.choicemap import ChoiceMap, EMPTY
from ..core.gfi import GenFn
from ..utils.stratification import (stratum_assignment, stack_strata,
                                    gather_strata)
from .state import ParticleFilterState, ParticleFilterSubState
from .translate import (ExtendingTraceTranslator, UpdatingTraceTranslator,
                        _check_no_discard)

__all__ = ["pf_update"]


def _block(state):
    """(traces, log_weights, n, scatter_fn) for full state or substate."""
    if isinstance(state, ParticleFilterSubState):
        def scatter(traces, lw):
            return state.scatter(traces=traces, log_weights=lw)
        return state.traces, state.log_weights, state.n_particles, scatter
    def scatter(traces, lw):
        return state.replace(traces=traces, log_weights=lw)
    return state.traces, state.log_weights, state.n_particles, scatter


def _translator_batch_safe(model_gf, translator) -> bool:
    """A translator update may run under ONE batched interpretation when
    the model and every proposal it invokes are marked ``batch_safe`` (and
    the translator is one of the known classes whose body is
    batch-polymorphic). Custom callables fall back to the always-correct
    vmapped path."""
    from .translate import GeneralTraceTranslator
    if not getattr(model_gf, "batch_safe", False):
        return False
    if isinstance(translator, ExtendingTraceTranslator):
        qs = (translator.q_forward,)
    elif isinstance(translator, UpdatingTraceTranslator):
        qs = (translator.q_forward, translator.q_backward)
    elif isinstance(translator, GeneralTraceTranslator):
        qs = (translator.q_forward, translator.q_backward,
              translator.new_model)
    else:
        return False
    return all(q is None or getattr(q, "batch_safe", False) for q in qs)


def _per_particle_strata(key, strata, n, layout):
    strata = list(strata)
    n_strata = len(strata)
    assign = stratum_assignment(key, n, n_strata, layout)
    stacked = stack_strata(strata)
    return gather_strata(stacked, assign), jnp.log(float(n_strata))


def pf_update(key, state, new_args=None, argdiffs=None,
              observations: ChoiceMap = EMPTY,
              proposal: GenFn | None = None, proposal_args=None,
              bwd_proposal: GenFn | None = None, bwd_args=None,
              transform=None, translator=None, strata=None,
              layout: str = "interleaved", check: bool | None = None,
              prev_observations: ChoiceMap = EMPTY,
              translator_kwargs=None):
    """Propagate every particle one step and reweight. Returns a new state."""
    traces, log_weights, n, scatter = _block(state)

    if translator is None and proposal is not None and bwd_proposal is None:
        translator = ExtendingTraceTranslator(
            p_new_args=new_args, p_argdiffs=argdiffs,
            new_observations=observations, q_forward=proposal,
            q_forward_args=tuple(proposal_args or ()), transform=transform)
        new_args = None
    elif translator is None and bwd_proposal is not None:
        translator = UpdatingTraceTranslator(
            p_new_args=new_args, p_argdiffs=argdiffs,
            new_observations=observations, q_forward=proposal,
            q_forward_args=tuple(proposal_args or ()),
            q_backward=bwd_proposal, q_backward_args=tuple(bwd_args or ()),
            transform=transform)
        new_args = None

    # stratified constraint fan-out (ref: src/update.jl:193-228)
    if strata is not None:
        key, ka = jr.split(key)
        per_particle, log_nk = _per_particle_strata(ka, strata, n, layout)
    else:
        per_particle, log_nk = None, 0.0

    if translator is not None:
        keys = jr.split(key, n)
        tkw = dict(translator_kwargs or {})
        if check is not None:
            tkw["check"] = check
        if isinstance(translator, UpdatingTraceTranslator) and (
                prev_observations is not EMPTY):
            tkw["prev_observations"] = prev_observations
        if per_particle is None and _translator_batch_safe(traces.gen_fn,
                                                           translator):
            # ONE batched interpretation through the whole translator:
            # fwd simulate/propose, transform, model update, and bwd
            # generate all run [N]-wide (scalar site keys, one counter-mode
            # PRNG pass per site); AD Jacobians are computed as N
            # per-particle blocks via a vmapped jacfwd inside the
            # transform (TraceTransform._apply). Opt-in via batch_safe on
            # the model AND every proposal (same contract as pf_initialize
            # /pf_update batched paths).
            from ..core.gfi import batched_interpretation
            with batched_interpretation(n):
                new_traces, ws = translator(key, traces, **tkw)
                from .. import config as _config
                if _config.check_batched_layout:
                    # same leading-dim==N collision guard as the batched
                    # default-proposal path below (ADVICE r4): the
                    # translator runs a full [N]-wide interpretation, so
                    # an unbatched model value with leading dim N is just
                    # as silently misread here
                    from ..core.batching import (check_batched_layout,
                                                 unbatch_avals, axes_spec)
                    pp_traces = unbatch_avals(traces, axes_spec(traces))
                    check_batched_layout(
                        new_traces,
                        lambda tr: translator(key, tr, **tkw)[0],
                        n, context="pf_update (batched translator)",
                        eval_args=(pp_traces,))
            return scatter(new_traces, log_weights + ws + log_nk)
        if per_particle is None:
            def one(k, tr):
                return translator(k, tr, **tkw)
            new_traces, ws = vmap_gfi(one, keys, traces)
        else:
            base_obs = translator.new_observations

            def one(k, tr, stratum):
                t = translator.replace(
                    new_observations=stratum.merge(base_obs))
                return t(k, tr, **tkw)
            new_traces, ws = vmap_gfi(one, keys, traces, per_particle)
        return scatter(new_traces, log_weights + ws + log_nk)

    # default-proposal path (ref: src/update.jl:12-25)
    if new_args is None:
        raise ValueError("pf_update requires new_args (or a translator)")
    do_check = True if check is None else check

    if getattr(traces.gen_fn, "batch_safe", False):
        # ONE batched interpretation over the particle axis — the stacked
        # trace pytree is layout-identical either way, but site keys become
        # scalar fold-ins and each site draws its [N] values in one
        # counter-mode PRNG pass (opt-in: see GenFn.batch_safe)
        from ..core.gfi import batched_interpretation
        with batched_interpretation(n):
            constraints = (observations if per_particle is None
                           else per_particle.merge(observations))
            new_traces, ws, _, discards = traces.gen_fn.update(
                key, traces, new_args, argdiffs, constraints)
            from .. import config as _config
            if _config.check_batched_layout and per_particle is None:
                from ..core.batching import (check_batched_layout,
                                             unbatch_avals, axes_spec)
                pp_traces = unbatch_avals(traces, axes_spec(traces))
                check_batched_layout(
                    new_traces,
                    lambda tr: traces.gen_fn.update(
                        key, tr, new_args, argdiffs, observations)[0],
                    n, context="pf_update (batched)",
                    eval_args=(pp_traces,))
        _check_no_discard(discards, do_check)
        return scatter(new_traces, log_weights + ws + log_nk)

    keys = jr.split(key, n)
    if per_particle is None:
        def one(k, tr):
            new_tr, w, _, discard = tr.gen_fn.update(
                k, tr, new_args, argdiffs, observations)
            return new_tr, w, discard
        new_traces, ws, discards = vmap_gfi(one, keys, traces)
    else:
        def one(k, tr, stratum):
            constraints = stratum.merge(observations)
            new_tr, w, _, discard = tr.gen_fn.update(
                k, tr, new_args, argdiffs, constraints)
            return new_tr, w, discard
        new_traces, ws, discards = vmap_gfi(one, keys, traces, per_particle)
    _check_no_discard(discards, do_check)
    return scatter(new_traces, log_weights + ws + log_nk)
