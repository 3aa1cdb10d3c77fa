"""Multi-object tracking SSM (BASELINE config 5: 1M particles sharded over
a pod with online particle resizing).

K objects move as independent 2-D random walks with per-object process
noise; each is observed with Gaussian noise. The latent site is a single
[K, 2] array choice per step (one vectorized site — the whole per-step
propagate/reweight is a handful of fused VPU ops per particle, so 1M
particles × K objects saturate HBM bandwidth rather than op overhead).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import jax.random as jr

from ..core import gen, trace, normal, Unfold, ChoiceMap, Entry
from ..smc.algorithms import run_particle_filter

__all__ = ["MOTParams", "make_mot_model", "mot_obs_at_t",
           "synthesize_mot_data", "mot_particle_filter"]


class MOTParams(NamedTuple):
    n_objects: int = 4
    q: float = 0.3   # process noise
    r: float = 0.5   # observation noise
    s0: float = 2.0  # initial spread


def make_mot_model(t_max: int, p: MOTParams) -> Unfold:
    @gen
    def mot_step(t, x):
        mean = jnp.where(t == 0, jnp.zeros_like(x), x)
        scale = jnp.where(t == 0, p.s0, p.q)
        x = trace("x", normal(mean, scale))          # [K, 2] vector site
        trace("y", normal(x, p.r))                   # [K, 2] observations
        return x

    return Unfold(mot_step, t_max)


def mot_obs_at_t(y_obs_full, t):
    """y_obs_full: [T, K, 2]; constrain exactly step t."""
    t_max = y_obs_full.shape[0]
    return ChoiceMap({("y",): Entry(y_obs_full, jnp.arange(t_max) == t)})


def synthesize_mot_data(key, t_max: int, p: MOTParams):
    model = make_mot_model(t_max, p)
    x0 = jnp.zeros((p.n_objects, 2), jnp.float32)
    tr = model.simulate(key, (t_max, x0))
    return tr.get_choices()[("y",)]


def mot_particle_filter(key, y_obs, n_particles: int, t_max: int,
                        p: MOTParams, ess_frac: float = 0.5,
                        resample_method: str = "systematic"):
    model = make_mot_model(t_max, p)
    x0 = jnp.zeros((p.n_objects, 2), jnp.float32)
    return run_particle_filter(
        key, model, t_max, n_particles,
        step_args_fn=lambda t: (t + 1, x0),
        obs_fn=lambda t: mot_obs_at_t(y_obs, t),
        ess_frac=ess_frac, resample_method=resample_method)
