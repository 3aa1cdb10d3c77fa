"""xprof capture of the fused _gather_traces path; print per-op times.

Usage: nohup python scripts/fused_profile.py > /tmp/fused_prof.log 2>&1 &
"""

import glob
import gzip
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp
import jax.random as jr
import numpy as np

from genparticlefilters_tpu.models.object_motion import (
    make_object_motion, init_state, obs_at_t, synthesize_data)
from genparticlefilters_tpu.smc import pf_initialize
from genparticlefilters_tpu.smc.resample import (
    systematic_parents, _gather_traces)

N, T = 100_000, 10
LOGDIR = "/tmp/xprof_fused"


def main():
    print("device:", jax.devices()[0], flush=True)
    y_obs, _ = synthesize_data(jr.key(42), T, 5)
    model = make_object_motion(T)
    x0 = init_state()
    state = jax.jit(lambda k: pf_initialize(
        k, model, (T, x0), obs_at_t(y_obs, 0), N))(jr.key(1))
    w = jax.jit(jax.nn.softmax)(state.log_weights)
    parents = jax.block_until_ready(jax.jit(systematic_parents)(jr.key(3), w))

    fused = jax.jit(lambda tr, p: _gather_traces(tr, p, clustered=True))
    out = fused(state.traces, parents)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])

    jax.profiler.start_trace(LOGDIR)
    for i in range(5):
        out = fused(state.traces, parents)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    jax.profiler.stop_trace()

    # parse trace: sum durations per op name on the device track
    files = glob.glob(LOGDIR + "/**/*.trace.json.gz", recursive=True)
    print("trace files:", files, flush=True)
    import json
    import collections
    agg = collections.Counter()
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev:
                pid_name = ev.get("pid")
                name = ev.get("name", "")
                agg[name] += ev["dur"]
    for name, dur in agg.most_common(40):
        print(f"{dur/5:10.1f}us  {name[:110]}")


if __name__ == "__main__":
    main()
