"""Object-motion switching SSM — the reference's README example
(/root/reference/README.md:43-104) and BASELINE.json config 1.

An object is either still or moving sinusoidally; we infer position ``y``
and the ``moving`` flag from noisy observations ``y_obs``. Posterior
correctness targets (README.md:97-104): P(moving @ t=5) ≈ 0.07 (1-based; our
0-based index 4) and P(moving @ t=6) ≈ 0.95 after the motion change.

The whole filter — init, ESS-triggered residual resampling + MH rejuvenation,
and per-step update — runs inside ONE jit with ``lax.scan`` over timesteps
and ``lax.cond`` for the ESS trigger: zero host round-trips per step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import jax.random as jr
from jax import lax

from ..core import (gen, trace, bernoulli, normal, Unfold, ChoiceMap, Entry,
                    Selection, UnknownChange, Extend, NoChange)
from ..smc import (pf_initialize, pf_update, pf_resample, pf_rejuvenate,
                   effective_sample_size, mh)

__all__ = ["make_object_motion", "init_state", "synthesize_data", "obs_dense",
           "object_motion_filter", "object_motion_filter_impl", "obs_at_t"]


def make_object_motion(t_max: int) -> Unfold:
    """Build the model with static horizon ``t_max``
    (ref model: README.md:43-54)."""

    @gen
    def motion_step(t, state):
        y, moving = state
        moving = trace("moving", bernoulli(jnp.where(moving, 0.75, 0.25)))
        vel = jnp.where(moving, jnp.sin(t.astype(jnp.float32) + 1.0), 0.0)
        y = trace("y", normal(y + vel, 0.01))
        trace("y_obs", normal(y, 0.25))
        return (y, moving)

    motion_step.batch_safe = True
    return Unfold(motion_step, t_max)


def init_state():
    return (jnp.asarray(0.0, jnp.float32), jnp.asarray(False))


def obs_at_t(y_obs_full, t):
    """Dense observation constraint selecting exactly timestep ``t`` (traced
    ok): the one-hot mask makes per-step extension a pure masked update."""
    t_max = y_obs_full.shape[0]
    mask = jnp.arange(t_max) == t
    return ChoiceMap({("y_obs",): Entry(y_obs_full, mask)})


def obs_dense(y_obs_full):
    """Dense observation constraint with a STATIC True mask. Correct
    whenever every *processed* step is observed — i.e. for ``Extend``-driven
    extension updates (only newly activated steps run) and for ``generate``
    (all active steps observed) — and maximally static: the handlers then
    store the observed site SHARED (one [T] row instead of [T, N]) and skip
    its sampling pass entirely."""
    return ChoiceMap({("y_obs",): Entry(y_obs_full, True)})


def synthesize_data(key, t_max: int, switch_t: int):
    """Generate a ground-truth trajectory: still for ``switch_t`` steps then
    moving (ref: README.md:85-89). Returns (y_obs [t_max], trace)."""
    model = make_object_motion(t_max)
    moving = jnp.arange(t_max) >= switch_t
    constraints = ChoiceMap({("moving",): Entry(moving, True)})
    tr, _ = model.generate(key, (t_max, init_state()), constraints)
    y_obs = tr.get_choices()[("y_obs",)]
    return y_obs, tr


def object_motion_filter_impl(key, y_obs, n_particles: int, t_max: int,
                              ess_frac: float = 0.5,
                              resample_method: str = "residual"):
    """The README particle-filter driver (README.md:60-79), fully jittable:
    residual resampling + MH rejuvenation when ESS < ess_frac·N, then a
    one-step extension update."""
    model = make_object_motion(t_max)
    x0 = init_state()
    k0, kloop = jr.split(key)
    obs = obs_dense(y_obs)  # static-True mask: shared y_obs storage
    state = pf_initialize(k0, model, (1, x0), obs, n_particles)

    def step(state, t):
        kt = jr.fold_in(kloop, t)
        kr, kj, ku = jr.split(kt, 3)

        def resample_rejuvenate(s):
            s = pf_resample(kr, s, resample_method, check=False)
            steps = jnp.arange(t_max)
            sel_mask = (steps == t - 1) | (steps == t)
            sel = Selection({("moving",): sel_mask, ("y",): sel_mask})
            s = pf_rejuvenate(kj, s, mh, (sel,), window=2)
            return s

        ess = effective_sample_size(state)
        state = lax.cond(ess < ess_frac * n_particles,
                         resample_rejuvenate, lambda s: s, state)
        state = pf_update(ku, state, (t + 1, x0), (Extend(1), NoChange()),
                          obs, check=False)
        return state, None

    state, _ = lax.scan(step, state, jnp.arange(1, t_max, dtype=jnp.int32))
    return state


object_motion_filter = partial(jax.jit, static_argnums=(2, 3, 5))(
    object_motion_filter_impl)
