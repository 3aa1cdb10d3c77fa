"""Isolate the resampling cost components at N=100K on the bench model:
leaf census of the gathered state, jnp.take on the packed matrix, the
Pallas clustered kernel, and parent-index computation.

Usage: nohup python scripts/gather_bench.py > /tmp/gather.log 2>&1 &
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

from genparticlefilters_tpu.models.object_motion import (
    make_object_motion, init_state, obs_at_t, synthesize_data)
from genparticlefilters_tpu.smc import pf_initialize
from genparticlefilters_tpu.smc.resample import (
    _pack_leaves, systematic_parents, _gather_traces)

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
    e2 = (time.time() - t0)
    el = (e2 - e1) / reps
    print(f"{name}: {el*1e3:.3f}ms", flush=True)
    return el


def main():
    print("device:", jax.devices()[0], flush=True)
    y_obs, _ = synthesize_data(jr.key(42), T, 5)
    model = make_object_motion(T)
    x0 = init_state()
    state = jax.jit(lambda k: pf_initialize(
        k, model, (T, x0), obs_at_t(y_obs, 0), N))(jr.key(1))

    leaves = jax.tree_util.tree_leaves(state.traces)
    print("leaf census of state.traces:")
    total = 0
    for l in leaves:
        print(f"  {l.dtype} {l.shape}")
        total += l.size * l.dtype.itemsize
    print(f"total bytes: {total/1e6:.1f} MB", flush=True)

    cols, meta = _pack_leaves(leaves)
    D = sum(w for (_, _, w) in meta)
    print(f"packed width D = {D} int32 cols -> {N*D*4/1e6:.1f} MB", flush=True)

    big = jr.randint(jr.key(2), (N, D), 0, 2**20, jnp.int32)
    w = jnp.full((N,), 1.0 / N, jnp.float32)
    parents = jax.jit(systematic_parents)(jr.key(3), w)
    parents = jax.block_until_ready(parents)

    timeit("parents (systematic)",
           jax.jit(lambda k: systematic_parents(k, w)), jr.key(3))
    timeit("jnp.take packed", jax.jit(lambda b, p: jnp.take(b, p, axis=0)),
           big, parents)

    # padded-to-lane-width variants
    for dd in (64, 128):
        bb = jr.randint(jr.key(2), (N, dd), 0, 2**20, jnp.int32)
        timeit(f"jnp.take D={dd}", jax.jit(
            lambda b, p: jnp.take(b, p, axis=0)), bb, parents)

    from genparticlefilters_tpu.ops.sorted_gather import gather_rows_clustered
    n_pad = -(-N // 256) * 256
    par_pad = jnp.concatenate(
        [parents, jnp.full((n_pad - N,), N - 1, jnp.int32)])
    big_p = jnp.pad(big, ((0, n_pad - N), (0, 0)))
    timeit("pallas clustered", jax.jit(
        lambda b, p: gather_rows_clustered(b, p)), big_p, par_pad)

    # full _gather_traces as used in resample
    timeit("_gather_traces (xla take)", jax.jit(
        lambda tr, p: _gather_traces(tr, p)), state.traces, parents)


if __name__ == "__main__":
    main()
