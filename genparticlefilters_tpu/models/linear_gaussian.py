"""Linear-Gaussian SSM with exact Kalman-filter ground truth
(BASELINE config 2: SMC posterior vs closed-form posterior, 10K particles,
systematic/stratified resampling).

Model: x_t = a·x_{t−1} + b + N(0, q²);  y_t ~ N(c·x_t, r²);  x_0 ~ N(m0, s0²).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import jax.random as jr

from ..core import gen, trace, normal, Unfold, ChoiceMap, Entry
from ..smc.algorithms import run_particle_filter

__all__ = ["LGParams", "make_lgssm", "lg_obs_at_t", "lg_obs_dense", "kalman_filter",
           "lgssm_particle_filter", "synthesize_lg_data"]


class LGParams(NamedTuple):
    a: float = 0.9
    b: float = 0.0
    q: float = 0.5
    c: float = 1.0
    r: float = 0.8
    m0: float = 0.0
    s0: float = 1.0


def make_lgssm(t_max: int, p: LGParams) -> Unfold:
    @gen
    def lg_step(t, x):
        mean = jnp.where(t == 0, p.m0, p.a * x + p.b)
        scale = jnp.where(t == 0, p.s0, p.q)
        x = trace("x", normal(mean, scale))
        trace("y", normal(p.c * x, p.r))
        return x

    lg_step.batch_safe = True
    return Unfold(lg_step, t_max)


def lg_obs_at_t(y_obs_full, t):
    t_max = y_obs_full.shape[0]
    return ChoiceMap({("y",): Entry(y_obs_full,
                                    jnp.arange(t_max) == t)})


def lg_obs_dense(y_obs_full):
    """Static-True observation mask (shared y storage; see docs/gfi.md)."""
    return ChoiceMap({("y",): Entry(y_obs_full, True)})


def synthesize_lg_data(key, t_max: int, p: LGParams):
    model = make_lgssm(t_max, p)
    tr = model.simulate(key, (t_max, jnp.asarray(0.0, jnp.float32)))
    return tr.get_choices()[("y",)]


def kalman_filter(y_obs, p: LGParams):
    """Exact filtering posterior N(mu_t, var_t) per step + total LML."""
    def step(carry, y):
        mu, var, first = carry
        pm = jnp.where(first, p.m0, p.a * mu + p.b)
        pv = jnp.where(first, p.s0 ** 2, p.a ** 2 * var + p.q ** 2)
        S = p.c ** 2 * pv + p.r ** 2
        ll = (-0.5 * (y - p.c * pm) ** 2 / S
              - 0.5 * jnp.log(2.0 * jnp.pi * S))
        K = pv * p.c / S
        mu_f = pm + K * (y - p.c * pm)
        var_f = (1.0 - K * p.c) * pv
        return (mu_f, var_f, jnp.asarray(False)), (mu_f, var_f, ll)

    (_, _, _), (mus, vars_, lls) = jax.lax.scan(
        step, (jnp.asarray(0.0), jnp.asarray(1.0), jnp.asarray(True)), y_obs)
    return mus, vars_, jnp.sum(lls)


def lgssm_particle_filter(key, y_obs, n_particles: int, t_max: int,
                          p: LGParams, resample_method: str = "systematic",
                          ess_frac: float = 0.5):
    model = make_lgssm(t_max, p)
    x0 = jnp.asarray(0.0, jnp.float32)
    return run_particle_filter(
        key, model, t_max, n_particles,
        step_args_fn=lambda t: (t + 1, x0),
        obs_fn=lambda t: lg_obs_dense(y_obs),
        ess_frac=ess_frac, resample_method=resample_method)
