"""Nonlinear stochastic-volatility SSM (BASELINE config 3: move-reweight
rejuvenation + ESS-triggered resampling, 100K particles).

Model: h_t = μ + φ(h_{t−1} − μ) + σ·η,  y_t ~ N(0, exp(h_t/2));
h_0 ~ N(μ, σ/√(1−φ²)).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import jax.random as jr

from ..core import gen, trace, normal, Unfold, ChoiceMap, Entry, Selection
from ..smc import pf_move_reweight, move_reweight
from ..smc.algorithms import run_particle_filter

__all__ = ["SVParams", "make_sv_model", "sv_obs_at_t", "sv_obs_dense",
           "sv_particle_filter", "synthesize_sv_data"]


class SVParams(NamedTuple):
    mu: float = -1.0
    phi: float = 0.95
    sigma: float = 0.3


def make_sv_model(t_max: int, p: SVParams) -> Unfold:
    s0 = p.sigma / jnp.sqrt(1.0 - p.phi ** 2)

    @gen
    def sv_step(t, h):
        mean = jnp.where(t == 0, p.mu, p.mu + p.phi * (h - p.mu))
        scale = jnp.where(t == 0, s0, p.sigma)
        h = trace("h", normal(mean, scale))
        trace("y", normal(0.0, jnp.exp(h / 2.0)))
        return h

    sv_step.batch_safe = True
    return Unfold(sv_step, t_max)


def sv_obs_at_t(y_obs_full, t):
    t_max = y_obs_full.shape[0]
    return ChoiceMap({("y",): Entry(y_obs_full, jnp.arange(t_max) == t)})


def sv_obs_dense(y_obs_full):
    """Static-True observation mask: correct for Extend-driven filters and
    generate (every processed step observed); stores y SHARED (one [T] row
    instead of [T, N]) and skips its sampling pass (see docs/gfi.md)."""
    return ChoiceMap({("y",): Entry(y_obs_full, True)})


def synthesize_sv_data(key, t_max: int, p: SVParams):
    model = make_sv_model(t_max, p)
    tr = model.simulate(key, (t_max, jnp.asarray(p.mu, jnp.float32)))
    return tr.get_choices()[("y",)]


def sv_particle_filter(key, y_obs, n_particles: int, t_max: int,
                       p: SVParams, ess_frac: float = 0.5,
                       rejuv_steps: int = 1, rejuv_window: int | None = 2):
    """Filter with move-reweight rejuvenation of the most recent volatility
    (spec for the kernel: /root/reference/src/rejuvenate.jl:125-132).

    ``rejuv_window``: static promise that the rejuvenated selection only
    touches the last k active steps — the move then recomputes O(k) steps
    instead of O(t_max) per proposal (decisive at long horizons; see
    docs/performance.md). ``None`` forces the full re-scan path."""
    model = make_sv_model(t_max, p)
    h0 = jnp.asarray(p.mu, jnp.float32)

    def rejuvenate(key, state, t):
        steps = jnp.arange(t_max)
        sel = Selection({("h",): steps == (t - 1)})
        return pf_move_reweight(key, state, move_reweight, (sel,),
                                n_iters=rejuv_steps, window=rejuv_window)

    return run_particle_filter(
        key, model, t_max, n_particles,
        step_args_fn=lambda t: (t + 1, h0),
        obs_fn=lambda t: sv_obs_dense(y_obs),
        ess_frac=ess_frac, resample_method="systematic",
        rejuvenate_fn=rejuvenate)
