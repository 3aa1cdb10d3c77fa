"""One-shot TPU measurement battery (run when the chip is healthy):

1. layout probe: elementwise + gather cost on [N, T] vs [T, N] vs flat
2. packed-gather barrier effect inside resampling
3. per-op breakdown of the SMC step
4. full-filter throughput at 100K and 1M particles
5. memory_analysis of the filter executable

Usage: nohup python scripts/tpu_measure.py > /tmp/tpu_measure.log 2>&1 &
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

import genparticlefilters_tpu as g
from genparticlefilters_tpu.models.object_motion import (
    make_object_motion, init_state, obs_at_t, synthesize_data,
    object_motion_filter)

N, T = 100_000, 10


def timeit(name, fn, *args, reps=30):
    t0 = time.time()
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    print(f"{name}: compile {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    for i in range(reps):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    el = (time.time() - t0) / reps
    print(f"{name}: {el*1e3:.2f}ms", flush=True)
    return el


def main():
    print("device:", jax.devices()[0], flush=True)

    # 1. layout probe
    a_nt = jr.normal(jr.key(0), (N, T))
    a_tn = jr.normal(jr.key(0), (T, N))
    a_fl = jr.normal(jr.key(0), (N * T,))
    timeit("add [N,T]", jax.jit(lambda x: x + 1.0), a_nt)
    timeit("add [T,N]", jax.jit(lambda x: x + 1.0), a_tn)
    timeit("add flat ", jax.jit(lambda x: x + 1.0), a_fl)
    for nm, arr in [("[N,T]", a_nt), ("[T,N]", a_tn)]:
        c = jax.jit(lambda x: x + 1.0).lower(arr).compile()
        ma = c.memory_analysis()
        print(f"mem {nm}: out={getattr(ma, 'output_size_in_bytes', ma)}",
              flush=True)
    parents = jr.randint(jr.key(1), (N,), 0, N)
    timeit("gather rows [N,T]", jax.jit(lambda x, p: x[p]), a_nt, parents)
    timeit("gather cols [T,N]", jax.jit(lambda x, p: x[:, p]), a_tn, parents)

    # 2-3. per-op breakdown
    y_obs, _ = synthesize_data(jr.key(42), T, 5)
    model = make_object_motion(T)
    state = g.pf_initialize(jr.key(0), model, (1, init_state()),
                            obs_at_t(y_obs, 0), N)
    _ = np.asarray(state.log_ml_est)
    upd = jax.jit(lambda k, s: g.pf_update(
        k, s, (2, init_state()), (g.Extend(1), g.NoChange()),
        obs_at_t(y_obs, 1), check=False))
    res_sys = jax.jit(lambda k, s: g.pf_resample(k, s, "systematic",
                                                 check=False))
    res_res = jax.jit(lambda k, s: g.pf_resample(k, s, "residual",
                                                 check=False))
    steps = jnp.arange(T)
    sel = g.Selection({("moving",): (steps == 0) | (steps == 1),
                       ("y",): (steps == 0) | (steps == 1)})
    rej_full = jax.jit(lambda k, s: g.pf_rejuvenate(k, s, g.mh, (sel,)))
    rej_win = jax.jit(lambda k, s: g.pf_rejuvenate(k, s, g.mh, (sel,),
                                                   window=2))
    timeit("update(Extend)", upd, jr.key(2), state)
    timeit("resample systematic", res_sys, jr.key(3), state)
    timeit("resample residual", res_res, jr.key(3), state)
    timeit("rejuvenate full", rej_full, jr.key(4), state)
    timeit("rejuvenate window=2", rej_win, jr.key(4), state)
    for nm, f in [("systematic", res_sys), ("update", upd)]:
        c = f.lower(jr.key(1), state).compile().cost_analysis()
        print(f"cost {nm}: bytes {c.get('bytes accessed', 0):.3g}",
              flush=True)

    # 4. full filter
    def run_k(n, k, base):
        t0 = time.time()
        for i in range(k):
            st = object_motion_filter(jr.key(base + i), y_obs, n, T)
        _ = float(np.asarray(st.log_ml_est))
        return time.time() - t0

    for n in (100_000, 1_000_000):
        st = object_motion_filter(jr.key(0), y_obs, n, T)
        _ = np.asarray(st.log_ml_est)
        e1 = run_k(n, 1, 100)
        e2 = run_k(n, 21, 200)
        per = (e2 - e1) / 20
        print(f"filter n={n}: {per*1e3:.1f}ms/run -> "
              f"{n*T/per:,.0f} updates/s", flush=True)
        st = object_motion_filter(jr.key(5), y_obs, n, T)
        print(f"  P(moving@5)={float(g.mean(st, (5, 'moving'))):.4f}",
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
