"""Probe: cost of the ESS lax.cond pass-through copies in the headline
filter (N=100K, T=10), and whether moving pf_update INSIDE both cond
branches (so every branch ends in a DUS write into the packed matrix,
letting XLA alias the operand instead of copying it through the identity
branch) removes them.

Variants, each a chained-K jit (bench.py methodology, Theil-Sen):
  orig      - current object_motion_filter_impl (cond(resample+rejuv, id)
              then update outside)
  inbranch  - cond(resample+rejuv+update, update): no identity branch
  nocond    - update-only every step (no cond at all): the floor

Usage: nohup python scripts/cond_probe.py > /tmp/cond_probe.log 2>&1 &
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
    make_object_motion, init_state, obs_dense, synthesize_data,
    object_motion_filter_impl)
from genparticlefilters_tpu.smc import (
    pf_initialize, pf_update, pf_resample, pf_rejuvenate,
    effective_sample_size, mh)
from genparticlefilters_tpu.core import Selection, Extend, NoChange

N = int(os.environ.get("GPF_N", 100_000))
T = int(os.environ.get("GPF_T", 10))


def filter_variant(key, variant):
    model = make_object_motion(T)
    x0 = init_state()
    k0, kloop = jr.split(key)
    y_obs = filter_variant.y_obs
    obs = obs_dense(y_obs)
    state = pf_initialize(k0, model, (1, x0), obs, N)

    def step(state, t):
        kt = jr.fold_in(kloop, t)
        kr, kj, ku = jr.split(kt, 3)

        def resample_rejuvenate(s):
            s = pf_resample(kr, s, "systematic", check=False)
            steps = jnp.arange(T)
            sel_mask = (steps == t - 1) | (steps == t)
            sel = Selection({("moving",): sel_mask, ("y",): sel_mask})
            s = pf_rejuvenate(kj, s, mh, (sel,), window=2)
            return s

        def upd(s):
            return pf_update(ku, s, (t + 1, x0), (Extend(1), NoChange()),
                             obs, check=False)

        if variant == "orig":
            ess = effective_sample_size(state)
            state2 = lax.cond(ess < 0.5 * N, resample_rejuvenate,
                              lambda s: s, state)
            state2 = upd(state2)
        elif variant == "inbranch":
            ess = effective_sample_size(state)
            state2 = lax.cond(ess < 0.5 * N,
                              lambda s: upd(resample_rejuvenate(s)),
                              upd, state)
        elif variant == "nocond":
            state2 = upd(state)
        else:
            raise ValueError(variant)
        return state2, None

    state, _ = lax.scan(step, state, jnp.arange(1, T, dtype=jnp.int32))
    return state


def measure(variant):
    @partial(jax.jit, static_argnums=(1,))
    def filter_many(key0, k):
        keys = jr.split(key0, k)

        def body(acc, kk):
            st = filter_variant(kk, variant)
            return acc + st.log_ml_est, None

        acc, _ = lax.scan(body, jnp.asarray(0.0, jnp.float32), keys)
        return acc

    KS = (3, 23, 43)
    for k in KS:
        _ = float(np.asarray(filter_many(jr.key(7), k)))
    mins = {k: float("inf") for k in KS}
    seed = 1000
    for _ in range(6):
        for k in KS:
            t0 = time.time()
            _ = float(np.asarray(filter_many(jr.key(seed), k)))
            mins[k] = min(mins[k], time.time() - t0)
            seed += 1
    pts = sorted(mins.items())
    slopes = []
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            (k1, e1), (k2, e2) = pts[i], pts[j]
            slopes.append((e2 - e1) / (k2 - k1))
    slopes.sort()
    per_run = slopes[len(slopes) // 2]
    print(f"{variant}: {per_run*1e3:.3f} ms/run  "
          + ", ".join(f"k={k}:{e:.3f}s" for k, e in pts), flush=True)
    return per_run


def main():
    print("device:", jax.devices()[0], flush=True)
    y_obs, _ = synthesize_data(jr.key(42), T, 5)
    filter_variant.y_obs = y_obs
    for variant in ("orig", "inbranch", "nocond"):
        measure(variant)


if __name__ == "__main__":
    main()
