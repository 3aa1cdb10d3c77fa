"""Sub-phase decomposition of the headline filter cost at N=100K, T=10.

Each variant is a chained-K jit over 9-step scans (bench.py methodology);
anti-DCE: the fetched scalar folds in logsumexp(log_weights) AND a bit-sum
over every trace leaf, so update writes / gathers can't be eliminated.

Variants:
  upd    - 9x extension update only
  res    - 9x full systematic resample (glue + kernel), uniform-ish weights
  resk   - 9x full systematic resample on SKEWED weights (realistic trigger)
  glue   - 9x softmax + systematic_F only (no gather)
  gat    - 9x fused gather from a fixed F (kernel only), uniform weights
  gatk   - 9x fused gather, skewed weights
  rej    - 9x MH rejuvenation (window=2) only

Usage: nohup python scripts/subphase_probe.py > /tmp/subphase.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp
import jax.random as jr
import numpy as np
from jax import lax
from functools import partial

from genparticlefilters_tpu.models.object_motion import (
    make_object_motion, init_state, obs_dense, synthesize_data)
from genparticlefilters_tpu.smc import (
    pf_initialize, pf_update, pf_resample, pf_rejuvenate,
    effective_sample_size, mh)
from genparticlefilters_tpu.smc.resample import (
    systematic_F, _gather_traces_from_F)
from genparticlefilters_tpu.utils.weights import safe_softmax
from genparticlefilters_tpu.core import Selection, Extend, NoChange

N = int(os.environ.get("GPF_N", 100_000))
T = int(os.environ.get("GPF_T", 10))


def leafsum(state):
    tot = jnp.asarray(0.0, jnp.float32)
    for leaf in jax.tree_util.tree_leaves(state.traces):
        leaf = jnp.asarray(leaf)
        tot = tot + jnp.sum(leaf.astype(jnp.float32)) * 1e-30
    return tot


def run_variant(key, variant, y_obs):
    model = make_object_motion(T)
    x0 = init_state()
    k0, kloop = jr.split(key)
    obs = obs_dense(y_obs)
    state = pf_initialize(k0, model, (1, x0), obs, N)
    if variant in ("resk", "gatk"):
        # skew the weights like a near-trigger filter state
        state = state.replace(
            log_weights=4.0 * jr.normal(jr.fold_in(key, 99), (N,)))

    def step(state, t):
        kt = jr.fold_in(kloop, t)
        kr, kj, ku = jr.split(kt, 3)
        if variant == "upd":
            state = pf_update(ku, state, (t + 1, x0),
                              (Extend(1), NoChange()), obs, check=False)
        elif variant in ("res", "resk"):
            state = pf_resample(kr, state, "systematic", check=False)
        elif variant == "glue":
            w, _ = safe_softmax(state.log_weights)
            F = systematic_F(kr, w)
            state = state.replace(log_weights=state.log_weights
                                  + 1e-30 * F[:N].astype(jnp.float32))
        elif variant in ("gat", "gatk"):
            w, _ = safe_softmax(lax.stop_gradient(state.log_weights))
            F = systematic_F(kr, w)
            new_traces, parents = _gather_traces_from_F(state.traces, F)
            state = state.replace(
                traces=new_traces,
                log_weights=state.log_weights
                + 1e-30 * parents.astype(jnp.float32))
        elif variant == "rej":
            steps = jnp.arange(T)
            sel_mask = (steps == t - 1) | (steps == t)
            sel = Selection({("moving",): sel_mask, ("y",): sel_mask})
            state = pf_rejuvenate(kj, state, mh, (sel,), window=2)
        else:
            raise ValueError(variant)
        return state, None

    state, _ = lax.scan(step, state, jnp.arange(1, T, dtype=jnp.int32))
    from genparticlefilters_tpu.utils.weights import logsumexp
    return (state.log_ml_est + logsumexp(state.log_weights) * 1e-6
            + leafsum(state))


def measure(variant, y_obs):
    @partial(jax.jit, static_argnums=(1,))
    def many(key0, k):
        keys = jr.split(key0, k)

        def body(acc, kk):
            return acc + run_variant(kk, variant, y_obs), None

        acc, _ = lax.scan(body, jnp.asarray(0.0, jnp.float32), keys)
        return acc

    KS = (3, 23, 43)
    for k in KS:
        _ = float(np.asarray(many(jr.key(7), k)))
    mins = {k: float("inf") for k in KS}
    seed = 1000
    for _ in range(6):
        for k in KS:
            t0 = time.time()
            _ = float(np.asarray(many(jr.key(seed), k)))
            mins[k] = min(mins[k], time.time() - t0)
            seed += 1
    pts = sorted(mins.items())
    slopes = sorted((e2 - e1) / (k2 - k1)
                    for i, (k1, e1) in enumerate(pts)
                    for (k2, e2) in pts[i + 1:])
    per_run = slopes[len(slopes) // 2]
    print(f"{variant}: {per_run*1e3:.3f} ms per 9-step run "
          f"({per_run*1e6/9:.1f} us/step x9)  "
          + ", ".join(f"k={k}:{e:.3f}s" for k, e in pts), flush=True)
    return per_run


def main():
    print("device:", jax.devices()[0], flush=True)
    y_obs, _ = synthesize_data(jr.key(42), T, 5)
    for variant in ("upd", "res", "resk", "glue", "gat", "gatk", "rej"):
        measure(variant, y_obs)


if __name__ == "__main__":
    main()
