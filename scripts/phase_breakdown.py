"""Per-phase timing of the object-motion filter at N=100K, T=10.

Times, each as its own jitted scan over 9 steps on the same state shapes the
real filter carries:
  A. update-only filter (ESS branch disabled)
  B. resample-only branch applied every step (systematic), no rejuvenation
  C. resample+rejuvenate every step
  D. the real filter (ESS-triggered)
plus single-op timings of pf_update / pf_resample / pf_rejuvenate on a fixed
state.

Usage: nohup python scripts/phase_breakdown.py > /tmp/phase.log 2>&1 &
"""

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

from genparticlefilters_tpu.models.object_motion import (
    make_object_motion, init_state, obs_at_t, obs_dense, synthesize_data)
from genparticlefilters_tpu.smc import (
    pf_initialize, pf_update, pf_resample, pf_rejuvenate,
    effective_sample_size, mh)
from genparticlefilters_tpu.core import Selection, Extend, NoChange

import os
N = int(os.environ.get("GPF_N", 100_000))
T = int(os.environ.get("GPF_T", 10))


def timeit(name, fn, *args, reps=20):
    t0 = time.time()
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    print(f"{name}: compile {time.time()-t0:.1f}s", flush=True)
    # rep-differencing to cancel dispatch+fetch latency
    t0 = time.time()
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    e1 = time.time() - t0
    t0 = time.time()
    for _ in range(reps + 1):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    e2 = time.time() - t0
    el = (e2 - e1) / reps
    print(f"{name}: {el*1e3:.2f}ms", flush=True)
    return el


def main():
    print("device:", jax.devices()[0], flush=True)
    y_obs, _ = synthesize_data(jr.key(42), T, 5)
    model = make_object_motion(T)
    x0 = init_state()

    def filter_mode(key, mode):
        k0, kloop = jr.split(key)
        obs = obs_dense(y_obs)
        state = pf_initialize(k0, model, (1, x0), obs, N)

        def step(state, t):
            kt = jr.fold_in(kloop, t)
            kr, kj, ku = jr.split(kt, 3)

            def branch(s):
                s = pf_resample(kr, s, "systematic", check=False)
                if mode in ("rejuv", "real"):
                    steps = jnp.arange(T)
                    sel_mask = (steps == t - 1) | (steps == t)
                    sel = Selection({("moving",): sel_mask,
                                     ("y",): sel_mask})
                    s = pf_rejuvenate(kj, s, mh, (sel,), window=2)
                return s

            if mode == "update":
                pass
            elif mode == "real":
                ess = effective_sample_size(state)
                state = lax.cond(ess < 0.5 * N, branch, lambda s: s, state)
            else:
                state = branch(state)
            state = pf_update(ku, state, (t + 1, x0),
                              (Extend(1), NoChange()),
                              obs, check=False)
            return state, None

        state, _ = lax.scan(step, state, jnp.arange(1, T, dtype=jnp.int32))
        # fold every trace leaf into the output so XLA cannot DCE the
        # trace-extension writes (returning just log_ml_est made the
        # update-only mode measure an empty computation)
        leaf_fold = sum(jnp.sum(l.ravel()[:7].astype(jnp.float32))
                        for l in jax.tree_util.tree_leaves(state.traces)
                        if getattr(l, "size", 0))
        return state.log_ml_est, leaf_fold

    for mode in ("update", "resample", "rejuv", "real"):
        fn = jax.jit(lambda k, m=mode: filter_mode(k, m))
        timeit(f"filter[{mode:8s}] (9 steps)", fn, jr.key(7))

    # single ops on a fixed mid-filter state
    k0 = jr.key(1)
    state = pf_initialize(k0, model, (5, x0), obs_dense(y_obs), N)

    def fold(s):
        # anti-DCE: touch every trace leaf
        return s.log_weights[:3], sum(
            jnp.sum(l.ravel()[:7].astype(jnp.float32))
            for l in jax.tree_util.tree_leaves(s.traces)
            if getattr(l, "size", 0))

    up = jax.jit(lambda k, s: fold(pf_update(
        k, s, (6, x0), (Extend(1), NoChange()), obs_dense(y_obs),
        check=False)))
    rs = jax.jit(lambda k, s: fold(pf_resample(
        k, s, "systematic", check=False)))
    steps = jnp.arange(T)
    sel_mask = (steps == 4) | (steps == 5)
    sel = Selection({("moving",): sel_mask, ("y",): sel_mask})
    rj = jax.jit(lambda k, s: fold(pf_rejuvenate(
        k, s, mh, (sel,), window=2)))
    timeit("pf_update   x1", up, jr.key(2), state)
    timeit("pf_resample x1", rs, jr.key(3), state)
    timeit("pf_rejuv    x1", rj, jr.key(4), state)

    init = jax.jit(lambda k: fold(pf_initialize(
        k, model, (1, x0), obs_dense(y_obs), N)))
    timeit("pf_init     x1", init, jr.key(5))


if __name__ == "__main__":
    main()
