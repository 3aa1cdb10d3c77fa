"""Stratified resampling phase cost (VERDICT r4 weak #4): measure the
in-filter resample phase for stratified SORTED (reference default, unfused
— pays an argsort + random gather), stratified UNSORTED
(``sort_particles=False`` — fused staircase kernel, same law without the
variance-reduction pre-sort), and systematic (the fused baseline), each as
a forced-every-step filter at N=100K, T=10 minus the update-only filter.

Usage: nohup python scripts/stratified_bench.py > /tmp/strat.log 2>&1 &
"""

import sys
import time
from functools import partial

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp
import jax.random as jr
import numpy as np
from jax import lax

import genparticlefilters_tpu as g
from genparticlefilters_tpu.core import Extend, NoChange
from genparticlefilters_tpu.models.object_motion import (
    make_object_motion, init_state, obs_dense, synthesize_data)

N, T = 100_000, 10


def make_filter(resample_fn):
    model = make_object_motion(T)
    y, _ = synthesize_data(jr.key(1), T, T // 2)
    obs = obs_dense(y)

    def run_one(key):
        k0, kloop = jr.split(key)
        st = g.pf_initialize(k0, model, (1, init_state()), obs, N)

        def step(st, t):
            kt = jr.fold_in(kloop, t)
            kr, ku = jr.split(kt)
            if resample_fn is not None:
                st = resample_fn(kr, st)
            st = g.pf_update(ku, st, (t + 1, init_state()),
                             (Extend(1), NoChange()), obs, check=False)
            return st, None

        st, _ = lax.scan(step, st, jnp.arange(1, T, dtype=jnp.int32))
        return g.log_ml_estimate(st)
    return run_one


def time_chained(tag, run_one, ks=(3, 43), reps=4):
    @partial(jax.jit, static_argnums=(1,))
    def many(key0, k):
        def body(acc, kk):
            return acc + run_one(kk), None
        acc, _ = lax.scan(body, jnp.asarray(0.0, jnp.float32),
                          jr.split(key0, k))
        return acc

    for k in ks:
        _ = float(np.asarray(many(jr.key(0), k)))
    best = 1e9
    for _ in range(reps):
        t0 = time.time(); _ = float(np.asarray(many(jr.key(1), ks[0]))); e1 = time.time() - t0
        t0 = time.time(); _ = float(np.asarray(many(jr.key(1), ks[1]))); e2 = time.time() - t0
        best = min(best, (e2 - e1) / (ks[1] - ks[0]))
    print(f"{tag}: {best*1e3:.2f} ms/run", flush=True)
    return best


def main():
    print("device:", jax.devices()[0], f" N={N} T={T}", flush=True)
    base = time_chained("update-only           ", make_filter(None))
    variants = [
        ("systematic (fused)    ",
         lambda k, s: g.pf_resample(k, s, "systematic", check=False)),
        ("stratified unsorted (fused)",
         lambda k, s: g.pf_resample(k, s, "stratified", check=False,
                                    sort_particles=False)),
        ("stratified sorted (ref default)",
         lambda k, s: g.pf_resample(k, s, "stratified", check=False)),
    ]
    for tag, fn in variants:
        tot = time_chained(f"+{tag}", make_filter(fn))
        print(f"  -> {tag} resample phase: "
              f"{(tot - base) / (T - 1) * 1e3:.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
