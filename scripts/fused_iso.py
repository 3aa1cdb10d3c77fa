"""Isolate: transposed kernel alone, +row slices, +transposes.

Usage: nohup python scripts/fused_iso.py > /tmp/fused_iso.log 2>&1 &
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

from genparticlefilters_tpu.ops.fused_gather import gather_transposed_clustered
from genparticlefilters_tpu.ops.sorted_gather import gather_rows_clustered
from genparticlefilters_tpu.smc.resample import systematic_parents

N, D = 100_000, 96
WIDTHS = (1, 1, 1, 10, 10, 1, 1, 10, 10, 10, 10, 10, 10, 10, 1)


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
    big = jr.randint(jr.key(0), (N, D), -2**30, 2**30, jnp.int32)
    w = jnp.full((N,), 1.0 / N, jnp.float32)
    parents = jax.block_until_ready(jax.jit(systematic_parents)(jr.key(3), w))

    timeit("kernel T alone", jax.jit(
        lambda b, p: gather_transposed_clustered(b, p)), big, parents)
    timeit("kernel old [m,D]", jax.jit(
        lambda b, p: gather_rows_clustered(
            b, jnp.concatenate([p, jnp.broadcast_to(p[-1], (
                -(-N // 256) * 256 - N,))]))[:N]), big, parents)

    def slices_only(b, p):
        t = gather_transposed_clustered(b, p)
        outs = []
        off = 0
        for w_ in WIDTHS:
            outs.append(t[off] if w_ == 1 else t[off:off + w_])
            off += w_
        return outs
    timeit("kernel + row slices", jax.jit(slices_only), big, parents)

    def full(b, p):
        t = gather_transposed_clustered(b, p)
        outs = []
        off = 0
        for w_ in WIDTHS:
            outs.append(t[off] if w_ == 1 else t[off:off + w_].T)
            off += w_
        return outs
    timeit("kernel + slices + T", jax.jit(full), big, parents)

    # single thin transpose cost
    seg = jr.randint(jr.key(1), (10, N), -100, 100, jnp.int32)
    timeit("one [10,N] -> [N,10] T", jax.jit(lambda s: s.T + 0), seg)


if __name__ == "__main__":
    main()
