"""Time the resample-every-step filter with clustered_gather on/off,
plus an xprof breakdown of one in-filter resample step.

Usage: nohup python scripts/resample_infilter.py > /tmp/rif.log 2>&1 &
"""

import collections
import glob
import gzip
import json
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

from genparticlefilters_tpu import config
from genparticlefilters_tpu.models.object_motion import (
    make_object_motion, init_state, obs_at_t, synthesize_data)
from genparticlefilters_tpu.smc import (
    pf_initialize, pf_update, pf_resample)
from genparticlefilters_tpu.core import Extend, NoChange

N, T = 100_000, 10


def timeit(name, fn, *args, reps=20):
    t0 = time.time()
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    print(f"{name}: compile {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    e1 = time.time() - t0
    t0 = time.time()
    for _ in range(reps + 1):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    el = (time.time() - t0 - e1) / reps
    print(f"{name}: {el*1e3:.2f}ms", flush=True)
    return el


def make_filter():
    y_obs, _ = synthesize_data(jr.key(42), T, 5)
    model = make_object_motion(T)
    x0 = init_state()

    def run(key):
        k0, kloop = jr.split(key)
        state = pf_initialize(k0, model, (1, x0), obs_at_t(y_obs, 0), N)

        def step(state, t):
            kt = jr.fold_in(kloop, t)
            kr, _, ku = jr.split(kt, 3)
            state = pf_resample(kr, state, "systematic", check=False)
            state = pf_update(ku, state, (t + 1, x0),
                              (Extend(1), NoChange()),
                              obs_at_t(y_obs, t), check=False)
            return state, None

        state, _ = lax.scan(step, state, jnp.arange(1, T, dtype=jnp.int32))
        return state.log_ml_est
    return run


def main():
    print("device:", jax.devices()[0], flush=True)

    config.clustered_gather = False
    f_off = jax.jit(make_filter())
    timeit("resample-filter gather=xla   ", f_off, jr.key(7))

    config.clustered_gather = True
    f_on = jax.jit(make_filter())
    timeit("resample-filter gather=pallas", f_on, jr.key(7))

    # xprof of the pallas variant
    LOGDIR = "/tmp/xprof_rif"
    jax.profiler.start_trace(LOGDIR)
    for _ in range(3):
        out = f_on(jr.key(7))
    _ = np.asarray(out)
    jax.profiler.stop_trace()
    agg = collections.Counter()
    for f in glob.glob(LOGDIR + "/**/*.trace.json.gz", recursive=True):
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev and not ev.get(
                    "name", "").startswith("$"):
                agg[ev["name"]] += ev["dur"]
    for name, dur in agg.most_common(35):
        print(f"{dur/3:10.1f}us  {name[:110]}", flush=True)


if __name__ == "__main__":
    main()
