"""BASELINE config 3 at a long horizon: stochastic-volatility filter,
N=100K, T=100, ESS-triggered systematic resampling + move-reweight
rejuvenation — O(window) rejuvenation vs full-rescan regenerate.

The windowed path recomputes only the last k steps per proposal; the full
path re-scans all T steps. At T=10 the two tie (ROUND_NOTES r1); this
measures the claim where it should matter (T=100).

Usage: nohup python scripts/window_bench.py > /tmp/window_bench.log 2>&1 &
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
from functools import partial
from jax import lax

from genparticlefilters_tpu.models.stochastic_volatility import (
    SVParams, synthesize_sv_data, sv_particle_filter)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
T = int(sys.argv[2]) if len(sys.argv) > 2 else 100


def main():
    print("device:", jax.devices()[0], flush=True)
    p = SVParams()
    y = synthesize_sv_data(jr.key(3), T, p)

    @partial(jax.jit, static_argnums=(1, 2))
    def filt_many(key0, k, window):
        keys = jr.split(key0, k)

        def body(acc, kk):
            st = sv_particle_filter(kk, y, N, T, p, rejuv_window=window)
            from genparticlefilters_tpu.smc.state import log_ml_estimate
            return acc + log_ml_estimate(st), None

        acc, _ = lax.scan(body, jnp.asarray(0.0, jnp.float32), keys)
        return acc

    for window in (2, None):
        name = f"window={window}"
        t0 = time.time()
        lml1 = float(np.asarray(filt_many(jr.key(0), 1, window)))
        print(f"{name}: compile+run {time.time()-t0:.1f}s, "
              f"lml/run={lml1:.2f}", flush=True)
        t0 = time.time()
        _ = float(np.asarray(filt_many(jr.key(1), 1, window)))
        e1 = time.time() - t0
        t0 = time.time()
        _ = float(np.asarray(filt_many(jr.key(1), 7, window)))
        e7 = time.time() - t0
        per = (e7 - e1) / 6
        ups = N * T / per
        print(f"{name}: per-run {per*1e3:.1f}ms -> {ups:,.0f} "
              f"particle-updates/s", flush=True)


def op_level():
    """Op-level comparison: one pf_move_reweight sweep on a fixed T-step
    state, window=2 vs full re-scan regenerate (the windowed-path claim
    isolated from the rest of the filter)."""
    import numpy as np
    from genparticlefilters_tpu.models.stochastic_volatility import (
        SVParams, make_sv_model, sv_obs_at_t, synthesize_sv_data)
    from genparticlefilters_tpu.smc import pf_initialize, pf_move_reweight
    from genparticlefilters_tpu.smc.rejuvenate import move_reweight
    from genparticlefilters_tpu.core import Selection

    p = SVParams()
    y = synthesize_sv_data(jr.key(3), T, p)
    model = make_sv_model(T, p)
    h0 = jnp.asarray(p.mu, jnp.float32)
    obs = jax.tree_util.tree_map(lambda x: x, sv_obs_at_t(y, 0))
    # full-length state (t_active = T)
    dense = None
    from genparticlefilters_tpu.core import ChoiceMap, Entry
    cm = ChoiceMap({("y",): Entry(y, jnp.ones((T,), bool))})
    state = pf_initialize(jr.key(0), model, (T, h0), cm, N)
    state = jax.block_until_ready(state)
    sel = Selection({("h",): jnp.arange(T) == (T - 1)})

    def fold(s):
        return s.log_weights[:3], sum(
            jnp.sum(l[:7].astype(jnp.float32))
            for l in jax.tree_util.tree_leaves(s.traces) if l.size)

    for window in (2, None):
        @partial(jax.jit, static_argnums=(1,))
        def many(key0, k, w=window):
            keys = jr.split(key0, k)
            def body(s, kk):
                s = pf_move_reweight(kk, s, move_reweight, (sel,), window=w)
                return s, None
            s, _ = lax.scan(body, state, keys)
            return fold(s)
        for k in (1, 5):
            _ = np.asarray(many(jr.key(0), k)[0])
        t0 = time.time(); _ = np.asarray(many(jr.key(1), 1)[0]); e1 = time.time() - t0
        t0 = time.time(); _ = np.asarray(many(jr.key(1), 5)[0]); e5 = time.time() - t0
        print(f"op-level move_reweight window={window}: "
              f"{(e5-e1)/4*1e3:.1f}ms/sweep", flush=True)


if __name__ == "__main__":
    main()
    op_level()
