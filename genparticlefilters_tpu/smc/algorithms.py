"""Canned SMC drivers: the reference's README loop pattern
(/root/reference/README.md:60-79) as reusable, fully-jitted algorithms.

- :func:`run_particle_filter`: scan-over-time SSM filtering with
  ESS-triggered resample(+rejuvenate) — one XLA computation, zero host
  round-trips per step.
- :func:`tempered_smc`: SMC over a model *sequence* (annealing /
  data-tempering), the pattern trace translators serve in the reference
  (SURVEY.md C13); each move is an ``update`` to new model arguments plus
  optional MCMC rejuvenation.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import jax.random as jr
from jax import lax

from ..core.gfi import GenFn, UnknownChange, NoChange, Extend
from .state import ParticleFilterState, effective_sample_size, log_ml_estimate
from .initialize import pf_initialize
from .update import pf_update
from .resample import pf_resample
from .rejuvenate import pf_rejuvenate, mh

__all__ = ["run_particle_filter", "tempered_smc"]


def run_particle_filter(key, model: GenFn, t_max: int, n_particles: int,
                        step_args_fn: Callable,
                        obs_fn: Callable,
                        init_args=None,
                        ess_frac: float = 0.5,
                        resample_method: str = "systematic",
                        rejuvenate_fn: Callable | None = None,
                        argdiffs=None) -> ParticleFilterState:
    """Generic SSM particle filter under one jit-able computation.

    - ``step_args_fn(t)``: model args for active length t+1 (traced t ok)
    - ``obs_fn(t)``: dense ChoiceMap constraining exactly step t
    - ``rejuvenate_fn(key, state, t)``: optional MCMC rejuvenation
    - ``argdiffs``: forwarded to pf_update; defaults to the incremental
      ``(Extend(1), NoChange...)`` promise.
    """
    k0, kloop = jr.split(key)
    state = pf_initialize(k0, model, step_args_fn(0), obs_fn(0), n_particles)
    n_args = len(step_args_fn(0))
    diffs = argdiffs if argdiffs is not None else (
        (Extend(1),) + tuple(NoChange() for _ in range(n_args - 1)))

    def step(state, t):
        kt = jr.fold_in(kloop, t)
        kr, kj, ku = jr.split(kt, 3)

        def resample_branch(s):
            s = pf_resample(kr, s, resample_method, check=False)
            if rejuvenate_fn is not None:
                s = rejuvenate_fn(kj, s, t)
            return s

        ess = effective_sample_size(state)
        state = lax.cond(ess < ess_frac * n_particles,
                         resample_branch, lambda s: s, state)
        state = pf_update(ku, state, step_args_fn(t), diffs, obs_fn(t),
                          check=False)
        return state, None

    state, _ = lax.scan(step, state,
                        jnp.arange(1, t_max, dtype=jnp.int32))
    return state


def tempered_smc(key, model: GenFn, betas, n_particles: int,
                 model_args_fn: Callable = None,
                 rejuvenate_fn: Callable | None = None,
                 ess_frac: float = 0.5,
                 resample_method: str = "systematic"):
    """SMC across a model sequence parameterized by an inverse temperature.

    ``model`` takes args ``(beta,)`` (or ``model_args_fn(beta)``); particles
    start at ``betas[0]`` and are moved through each subsequent model by an
    ``update`` (weight = Δscore, the annealing incremental weight), with
    ESS-triggered resampling and optional rejuvenation — the reference
    realizes this pattern with trace translators (SURVEY.md C13, spec
    src/translate.jl); with fixed trace schemas a plain args-update suffices,
    and SMCP³ auxiliary-variable moves remain available via
    ``pf_update(..., translator=UpdatingTraceTranslator(...))``.

    Returns (state, log_ml_estimate).
    """
    args_of = model_args_fn or (lambda b: (b,))
    betas = jnp.asarray(betas, jnp.float32)
    k0, kloop = jr.split(key)
    state = pf_initialize(k0, model, args_of(betas[0]),
                          constraints_empty(), n_particles)

    def step(state, inp):
        i, beta = inp
        kt = jr.fold_in(kloop, i)
        kr, kj, ku = jr.split(kt, 3)

        def resample_branch(s):
            s = pf_resample(kr, s, resample_method, check=False)
            if rejuvenate_fn is not None:
                s = rejuvenate_fn(kj, s, beta)
            return s

        ess = effective_sample_size(state)
        state = lax.cond(ess < ess_frac * n_particles,
                         resample_branch, lambda s: s, state)
        state = pf_update(ku, state, args_of(beta),
                          tuple(UnknownChange() for _ in args_of(beta)),
                          constraints_empty(), check=False)
        return state, None

    idxs = jnp.arange(1, betas.shape[0], dtype=jnp.int32)
    state, _ = lax.scan(step, state, (idxs, betas[1:]))
    return state, log_ml_estimate(state)


def constraints_empty():
    from ..core.choicemap import EMPTY
    return EMPTY
