"""In-filter multinomial resample: merge-count F path vs the new
float-bracket (inverse-CDF in-kernel) path, N=100K, resample every step.

Usage: nohup python scripts/mn_cu_bench.py > /tmp/mn_cu.log 2>&1 &
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

from genparticlefilters_tpu.models.object_motion import (
    make_object_motion, init_state, obs_at_t, synthesize_data)
from genparticlefilters_tpu.smc import pf_initialize, pf_update
from genparticlefilters_tpu.smc.resample import (
    _resample_impl, multinomial_parents, residual_parents,
    multinomial_F, multinomial_cu, residual_F, residual_F_fused)
from genparticlefilters_tpu.core import Extend, NoChange

N, T = 100_000, 10


def make_filter(cu, parent_fn=multinomial_parents, F_fn=multinomial_F,
                cu_fn=multinomial_cu):
    y_obs, _ = synthesize_data(jr.key(42), T, 5)
    model = make_object_motion(T)
    x0 = init_state()

    def run(key):
        k0, kloop = jr.split(key)
        state = pf_initialize(k0, model, (1, x0), obs_at_t(y_obs, 0), N)

        def step(state, t):
            kt = jr.fold_in(kloop, t)
            kr, _, ku = jr.split(kt, 3)
            state = _resample_impl(
                kr, state, lambda k, w, lp: parent_fn(k, w),
                None, False, F_fn=F_fn,
                cu_fn=cu_fn if cu else None)
            state = pf_update(ku, state, (t + 1, x0),
                              (Extend(1), NoChange()),
                              obs_at_t(y_obs, t), check=False)
            return state, None

        state, _ = lax.scan(step, state, jnp.arange(1, T, dtype=jnp.int32))
        return state.log_ml_est
    return run


def bench(name, run):
    @partial(jax.jit, static_argnums=(1,))
    def many(key0, k):
        def body(acc, kk):
            return acc + run(kk), None
        acc, _ = lax.scan(body, jnp.asarray(0.0, jnp.float32),
                          jr.split(key0, k))
        return acc

    t0 = time.time()
    for k in (2, 12):
        v = float(np.asarray(many(jr.key(0), k)))
    print(f"{name}: compile+warm {time.time()-t0:.1f}s  (lml sum {v:.2f})",
          flush=True)
    best = 1e9
    for _ in range(5):
        t0 = time.time(); _ = float(np.asarray(many(jr.key(1), 2))); e1 = time.time() - t0
        t0 = time.time(); _ = float(np.asarray(many(jr.key(1), 12))); e2 = time.time() - t0
        best = min(best, (e2 - e1) / 10)
    print(f"{name}: {best*1e3:.2f} ms/run ({T-1} resamples)", flush=True)
    return best


def main():
    print("device:", jax.devices()[0], flush=True)
    a = bench("multinomial F (merge+scatter)", make_filter(False))
    b = bench("multinomial cu (float bracket)", make_filter(True))
    print(f"per-resample delta: {(a-b)/(T-1)*1e3:.3f} ms", flush=True)
    c = bench("residual F (merge+scatter)",
              make_filter(False, residual_parents, residual_F, None))
    d = bench("residual F_fused (role-swap)",
              make_filter(False, residual_parents, residual_F_fused, None))
    print(f"per-resample delta: {(c-d)/(T-1)*1e3:.3f} ms", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
