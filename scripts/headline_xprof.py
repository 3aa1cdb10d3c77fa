"""xprof op-level breakdown of the headline filter (object-motion,
N=100K, T=10, ESS-triggered systematic resample + MH rejuvenation).

Usage: nohup python scripts/headline_xprof.py > /tmp/hx.log 2>&1 &
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

from genparticlefilters_tpu.models.object_motion import (
    object_motion_filter_impl, synthesize_data)

N, T = 100_000, 10


def main():
    print("device:", jax.devices()[0], flush=True)
    y_obs, _ = synthesize_data(jr.key(42), T, 5)
    f = jax.jit(lambda k: object_motion_filter_impl(
        k, y_obs, N, T, 0.5, "systematic").log_ml_est)
    t0 = time.time()
    _ = float(np.asarray(f(jr.key(0))))
    print(f"compile {time.time()-t0:.1f}s", flush=True)
    for _ in range(3):
        out = f(jr.key(1))
    _ = float(np.asarray(out))

    LOGDIR = "/tmp/xprof_headline"
    R = 10
    jax.profiler.start_trace(LOGDIR)
    for _ in range(R):
        out = f(jr.key(2))
    _ = float(np.asarray(out))
    jax.profiler.stop_trace()

    agg = collections.Counter()
    total = 0.0
    for fn in glob.glob(LOGDIR + "/**/*.trace.json.gz", recursive=True):
        with gzip.open(fn, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and "dur" in ev and not ev.get(
                    "name", "").startswith("$"):
                # keep only device-lane events (XLA op names contain '.' or
                # fusion); crude filter: skip python-side names
                nm = ev.get("name", "")
                if nm.startswith(("Thread", "process", "tsl::", "Xla")):
                    continue
                agg[nm] += ev["dur"]
    for name, dur in agg.most_common(45):
        print(f"{dur/R:10.1f}us  {name[:120]}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
