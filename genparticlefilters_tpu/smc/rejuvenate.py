"""Rejuvenation moves (ref: /root/reference/src/rejuvenate.jl).

- ``pf_rejuvenate`` dispatcher: ``move`` (MCMC accept/reject, weights
  untouched; ref lines 40-53) or ``reweight`` (kernel returns a relative
  log-weight accumulated into the particle weights; ref lines 74-90).
- ``mh``: Metropolis–Hastings kernel via ``regenerate`` + accept mask
  (Gen's ``mh``, used at /root/reference/README.md:72-73), plus the
  custom-proposal form.
- ``move_reweight``: the 4 kernel variants of ref lines 125-176
  (selection / custom proposal / involution / distinct fwd+bwd proposals).

TPU-native: kernels are pure ``(key, trace, ...) -> (trace, aux)`` functions;
the accept/reject branch is a ``tree_where`` select (no control flow), the
per-particle loop is ``vmap``, and ``n_iters`` sweeps run as a ``lax.scan``.
Instead of the reference's ``@debug`` log-capture oracle
(test/rejuvenate.jl:31-50), kernels' accept flags / relative weights are
returned as arrays when ``return_stats=True``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.random as jr
from jax import lax

from ..core.choicemap import ChoiceMap, Selection, EMPTY
from ..core.gfi import GenFn, Trace, NoChange
from .state import ParticleFilterState, ParticleFilterSubState
from .update import _block

__all__ = ["pf_rejuvenate", "pf_move_accept", "pf_move_reweight",
           "mh", "move_reweight", "check_observations"]


def _tree_select(cond, a, b):
    """Accept/reject select with trace-structure knowledge (shared leaves —
    lockstep combinator lengths, stored args — keep their unbatched
    layout); see :func:`~..core.gfi.select_batched`."""
    from ..core.gfi import select_batched
    return select_batched(cond, a, b)


def _nochange(args):
    return tuple(NoChange() for _ in args)


def _raise_obs_modified(addr, bad):
    import numpy as np
    if np.any(bad):
        raise ValueError(f"observation at {addr} was modified")


def check_observations(choices: ChoiceMap, observations: ChoiceMap,
                       atol=1e-5, entry_axes=None):
    """Check that observed choices are preserved (Gen's
    ``check_observations``; ref: src/rejuvenate.jl:5,130). For batched
    (particle-axis) choicemaps pass ``entry_axes`` (the per-entry particle
    axis map from :func:`~..core.batching.choice_axes`) so values compare
    particle-first. Eagerly this raises ``ValueError``; under jit the values
    are tracers, so a raising ``jax.debug.callback`` is staged — the error
    surfaces as ``jax.errors.JaxRuntimeError`` at execution time, giving the
    ``check=True`` contract teeth inside jitted filters."""
    if observations is EMPTY or not observations.entries:
        return
    import functools
    from .state import batched_choice_entry
    for k, e in observations.entries.items():
        try:
            gv, _ = batched_choice_entry(choices, k, entry_axes)
        except KeyError:
            raise ValueError(f"observation at {k} missing from trace")
        gv = jnp.asarray(gv)
        want = jnp.asarray(e.value, jnp.float32)
        bad = jnp.any(jnp.abs(gv.astype(jnp.float32) - want) > atol)
        if isinstance(bad, jax.core.Tracer):
            jax.debug.callback(functools.partial(_raise_obs_modified, k), bad)
        elif bool(bad):
            raise ValueError(f"observation at {k} was modified")


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def mh(key, trace: Trace, selection_or_proposal, proposal_args=None,
       involution=None, check=False, observations: ChoiceMap = EMPTY,
       window: int | None = None):
    """Metropolis–Hastings kernel: ``(new_trace, accept)``.

    Selection form: regenerate the selected addresses from the internal
    proposal and accept with probability ``min(1, e^weight)``.
    Proposal form: propose from a custom proposal, update, and assess the
    discarded choices under the proposal for the reverse density.
    Involution form: ``involution(trace, fwd_choices, fwd_ret, p_args) ->
    (new_trace, bwd_choices, weight)`` (Gen's involutive MCMC).
    """
    k1, k2, k3 = jr.split(key, 3)
    args = trace.get_args()
    if isinstance(selection_or_proposal, Selection):
        # delta protocol: defer materializing the proposed trace until the
        # accept mask is known — one fused masked write instead of a full
        # proposed trace + whole-trace select (see GenFn.regenerate_delta)
        delta, w = trace.gen_fn.regenerate_delta(
            k1, trace, args, _nochange(args), selection_or_proposal,
            window=window)
        # accept shape follows w: scalar per particle under vmap, [N] in
        # batched interpretation
        accept = jnp.log(jr.uniform(k3, jnp.shape(w), jnp.float32)) < w
        out = trace.gen_fn.apply_regenerate_delta(trace, delta, accept)
        if check:
            check_observations(out.get_choices(), observations)
        return out, accept
    elif involution is not None:
        proposal: GenFn = selection_or_proposal
        p_args = tuple(proposal_args or ())
        fwd_choices, fwd_score, fwd_ret = proposal.propose(
            k1, (trace,) + p_args)
        new_tr, bwd_choices, w_inv = involution(trace, fwd_choices, fwd_ret,
                                                p_args)
        _, bwd_score = proposal.assess((new_tr,) + p_args, bwd_choices)
        w = w_inv - fwd_score + bwd_score
    else:
        proposal: GenFn = selection_or_proposal
        p_args = tuple(proposal_args or ())
        fwd_choices, fwd_score, _ = proposal.propose(k1, (trace,) + p_args)
        new_tr, w_upd, _, discard = trace.gen_fn.update(
            k2, trace, args, _nochange(args), fwd_choices)
        _, bwd_score = proposal.assess((new_tr,) + p_args, discard)
        w = w_upd - fwd_score + bwd_score
    accept = jnp.log(jr.uniform(k3, jnp.shape(w), jnp.float32)) < w
    out = _tree_select(accept, new_tr, trace)
    if check:
        check_observations(out.get_choices(), observations)
    return out, accept


def move_reweight(key, trace: Trace, selection_or_proposal,
                  proposal_args=None, involution=None,
                  bwd_proposal: GenFn | None = None, bwd_args=None,
                  check=False, observations: ChoiceMap = EMPTY,
                  window: int | None = None):
    """Move-reweight kernel: ``(new_trace, rel_log_weight)``
    (ref: src/rejuvenate.jl:125-176, Marques & Storvik 2013).

    Variants (mirroring the reference's 4 methods):
    1. selection: regenerate, rel_weight = regenerate weight
    2. proposal: propose → update → assess(discard), w = Δ − fwd + bwd
    3. proposal + involution
    4. distinct fwd/bwd proposals + involution
    """
    args = trace.get_args()
    if isinstance(selection_or_proposal, Selection):
        new_tr, rel_w = trace.gen_fn.regenerate(
            key, trace, args, _nochange(args), selection_or_proposal,
            window=window)
        if check:
            check_observations(new_tr.get_choices(), observations)
        return new_tr, rel_w

    proposal: GenFn = selection_or_proposal
    p_args = tuple(proposal_args or ())
    k1, k2 = jr.split(key)
    fwd_choices, fwd_score, fwd_ret = proposal.propose(k1, (trace,) + p_args)
    if involution is None:
        new_tr, w, _, discard = trace.gen_fn.update(
            k2, trace, args, _nochange(args), fwd_choices)
        _, bwd_score = proposal.assess((new_tr,) + p_args, discard)
    else:
        new_tr, bwd_choices, w = involution(trace, fwd_choices, fwd_ret,
                                            p_args)
        scorer = bwd_proposal if bwd_proposal is not None else proposal
        s_args = tuple(bwd_args or ()) if bwd_proposal is not None else p_args
        _, bwd_score = scorer.assess((new_tr,) + s_args, bwd_choices)
    if check:
        check_observations(new_tr.get_choices(), observations)
    return new_tr, w - fwd_score + bwd_score


# ---------------------------------------------------------------------------
# State-level rejuvenation
# ---------------------------------------------------------------------------

def _sweeps(key, traces, kern, kern_args, n_iters, kwargs):
    """Apply ``kern`` n_iters times per particle.
    Returns (new_traces, aux_sum [N], aux_all [N, n_iters] or [n_iters, N]).

    With a batch-safe model the whole sweep runs as ONE batched
    interpretation (scalar kernel keys, [N]-wide proposals/accepts);
    otherwise vmap over split per-particle keys."""
    n = jax.tree_util.tree_leaves(traces.score)[0].shape[0]

    if getattr(traces.gen_fn, "batch_safe", False):
        from ..core.gfi import batched_interpretation

        with batched_interpretation(n):
            if n_iters == 1:
                tr2, aux = kern(jr.fold_in(key, 0), traces, *kern_args,
                                **kwargs)
                aux_f = jnp.asarray(aux, jnp.float32)
                return tr2, aux_f, aux_f[:, None]

            def body(carry, i):
                tr, acc = carry
                tr2, aux = kern(jr.fold_in(key, i), tr, *kern_args, **kwargs)
                aux_f = jnp.asarray(aux, jnp.float32)
                return (tr2, acc + aux_f), aux_f

            (tr_out, aux_sum), aux_all = lax.scan(
                body, (traces, jnp.zeros((n,), jnp.float32)),
                jnp.arange(n_iters, dtype=jnp.int32))
            # [n_iters, N] -> [N, n_iters] (vmapped-path convention)
            return tr_out, aux_sum, jnp.moveaxis(aux_all, 0, 1)

    keys = jr.split(key, n)

    def per_particle(k, tr):
        if n_iters == 1:  # skip the scan wrapper (avoids carry copies)
            tr2, aux = kern(jr.fold_in(k, 0), tr, *kern_args, **kwargs)
            aux_f = jnp.asarray(aux, jnp.float32)
            return tr2, aux_f, aux_f[None]

        def body(carry, i):
            tr, acc = carry
            ki = jr.fold_in(k, i)
            tr2, aux = kern(ki, tr, *kern_args, **kwargs)
            aux_f = jnp.asarray(aux, jnp.float32)
            return (tr2, acc + aux_f), aux_f

        (tr_out, aux_sum), aux_all = lax.scan(
            body, (tr, jnp.asarray(0.0, jnp.float32)),
            jnp.arange(n_iters, dtype=jnp.int32))
        return tr_out, aux_sum, aux_all

    from ..core.batching import vmap_gfi
    return vmap_gfi(per_particle, keys, traces)


def _post_check(kwargs, new_traces):
    """Per-kernel check/observations run under vmap (values are tracers),
    so honor them at state level after the sweeps (eager mode only)."""
    check = kwargs.pop("check", False)
    observations = kwargs.pop("observations", EMPTY)
    return check, observations


def _verify_observations(check, observations, traces):
    if check and observations is not EMPTY:
        from ..core.batching import choice_axes
        check_observations(traces.get_choices(), observations,
                           entry_axes=choice_axes(traces.gen_fn, traces))


def pf_move_accept(key, state, kern=mh, kern_args=(), n_iters: int = 1,
                   return_stats: bool = False, **kwargs):
    """MCMC rejuvenation; weights untouched (ref: src/rejuvenate.jl:40-53)."""
    check, observations = _post_check(kwargs, None)
    traces, log_weights, n, scatter = _block(state)
    new_traces, acc_sum, acc_all = _sweeps(
        key, traces, kern, kern_args, n_iters, kwargs)
    _verify_observations(check, observations, new_traces)
    out = scatter(new_traces, log_weights)
    if return_stats:
        return out, {"accepts": acc_all, "accept_rate": jnp.mean(
            acc_sum / float(n_iters))}
    return out


def pf_move_reweight(key, state, kern=move_reweight, kern_args=(),
                     n_iters: int = 1, return_stats: bool = False, **kwargs):
    """Move-reweight rejuvenation; accumulates relative weights
    (ref: src/rejuvenate.jl:74-90)."""
    check, observations = _post_check(kwargs, None)
    traces, log_weights, n, scatter = _block(state)
    new_traces, w_sum, w_all = _sweeps(
        key, traces, kern, kern_args, n_iters, kwargs)
    _verify_observations(check, observations, new_traces)
    out = scatter(new_traces, log_weights + w_sum)
    if return_stats:
        return out, {"rel_weights": w_all}
    return out


def pf_rejuvenate(key, state, kern=mh, kern_args=(), n_iters: int = 1,
                  method: str = "move", **kwargs):
    """Dispatcher (ref: src/rejuvenate.jl:18-27)."""
    if method == "move":
        return pf_move_accept(key, state, kern, kern_args, n_iters, **kwargs)
    if method == "reweight":
        return pf_move_reweight(key, state, kern, kern_args, n_iters,
                                **kwargs)
    raise ValueError(f"Method {method!r} not recognized.")
