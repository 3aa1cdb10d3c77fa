"""TPU check: fused gather+unpack vs XLA path — bit-equality and timing.

Usage: nohup python scripts/fused_gather_check.py > /tmp/fused.log 2>&1 &
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

from genparticlefilters_tpu import config
from genparticlefilters_tpu.models.object_motion import (
    make_object_motion, init_state, obs_at_t, synthesize_data)
from genparticlefilters_tpu.smc import pf_initialize
from genparticlefilters_tpu.smc.resample import (
    systematic_parents, _gather_traces)

N, T = 100_000, 10


def timeit(name, fn, *args, reps=30):
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
    print(f"{name}: {el*1e3:.3f}ms", flush=True)
    return el


def main():
    print("device:", jax.devices()[0], flush=True)
    y_obs, _ = synthesize_data(jr.key(42), T, 5)
    model = make_object_motion(T)
    x0 = init_state()
    state = jax.jit(lambda k: pf_initialize(
        k, model, (T, x0), obs_at_t(y_obs, 0), N))(jr.key(1))
    lw = state.log_weights
    w = jax.jit(lambda x: jax.nn.softmax(x))(lw)
    parents = jax.block_until_ready(
        jax.jit(systematic_parents)(jr.key(3), w))

    fused = jax.jit(lambda tr, p: _gather_traces(tr, p, clustered=True))
    plain = jax.jit(lambda tr, p: _gather_traces(tr, p, clustered=False))
    a = fused(state.traces, parents)
    b = plain(state.traces, parents)
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    ok = True
    for x, y in zip(la, lb):
        if not np.array_equal(np.asarray(x), np.asarray(y)):
            ok = False
            print("MISMATCH", x.shape, x.dtype, flush=True)
    print("bit-equal:", ok, flush=True)

    timeit("gather fused ", fused, state.traces, parents)
    timeit("gather plain ", plain, state.traces, parents)

    # also degenerate parents (worst-case span)
    pd = jnp.full((N,), N - 1, jnp.int32)
    c = fused(state.traces, pd)
    d = plain(state.traces, pd)
    ok = all(np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(
        jax.tree_util.tree_leaves(c), jax.tree_util.tree_leaves(d)))
    print("degenerate bit-equal:", ok, flush=True)
    timeit("fused degenerate", fused, state.traces, pd)


if __name__ == "__main__":
    main()
