"""Parent-index formulations without scatter: windowed count vs scatter.

parents[j] = #{i : F_i <= j} for monotone cumulative hit counts F.

Usage: nohup python scripts/parents_bench.py > /tmp/parents.log 2>&1 &
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
from jax import lax

from genparticlefilters_tpu.smc.resample import (
    systematic_parents, counts_to_parents, _strata_counts)

N = 100_000
B = 256      # output block
W = 1024     # source window per block


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


def F_of(weights, key):
    n = weights.shape[0]
    u0 = jr.uniform(key, (), jnp.float32)
    c = n * jnp.cumsum(weights) - u0
    F = jnp.floor(c).astype(jnp.int32) + 1
    F = jnp.clip(F, 0, n).at[-1].set(n)
    return lax.cummax(F)


def parents_scatter(F, n):
    prev = jnp.concatenate([jnp.zeros((1,), F.dtype), F[:-1]])
    return counts_to_parents(F - prev, n)


def parents_windowed(F, n):
    nb = -(-n // B)
    grid = jnp.arange(nb + 1, dtype=jnp.int32) * B
    base = jnp.searchsorted(F, grid, side="right").astype(jnp.int32)
    lo = base[:-1]                                   # [nb]
    span_ok = jnp.max(base[1:] - lo) < W

    def windowed(_):
        win = jnp.clip(lo[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :],
                       0, n - 1)                     # [nb, W]
        Fw = jnp.where(lo[:, None] + jnp.arange(W)[None, :] < n,
                       F[win], jnp.iinfo(jnp.int32).max)
        j = (jnp.arange(nb, dtype=jnp.int32)[:, None] * B
             + jnp.arange(B, dtype=jnp.int32)[None, :])  # [nb, B]
        cnt = jnp.sum(Fw[:, None, :] <= j[:, :, None], axis=-1,
                      dtype=jnp.int32)               # [nb, B]
        return (lo[:, None] + cnt).reshape(-1)[:n]

    return lax.cond(span_ok, windowed,
                    lambda _: parents_scatter(F, n), None)


def main():
    print("device:", jax.devices()[0], flush=True)
    w = jax.nn.softmax(jr.normal(jr.key(1), (N,)) * 2.0)
    F = jax.jit(F_of)(w, jr.key(2))
    F = jax.block_until_ready(F)

    a = jax.jit(lambda F: parents_scatter(F, N))(F)
    b = jax.jit(lambda F: parents_windowed(F, N))(F)
    print("equal:", bool(jnp.all(a == b)), flush=True)

    # degenerate: all mass on one particle
    w2 = jnp.zeros((N,)).at[12345].set(1.0)
    F2 = jax.jit(F_of)(w2, jr.key(2))
    a2 = jax.jit(lambda F: parents_scatter(F, N))(F2)
    b2 = jax.jit(lambda F: parents_windowed(F, N))(F2)
    print("degenerate equal:", bool(jnp.all(a2 == b2)), flush=True)

    timeit("parents scatter ", jax.jit(lambda F: parents_scatter(F, N)), F)
    timeit("parents windowed", jax.jit(lambda F: parents_windowed(F, N)), F)
    timeit("searchsorted 392", jax.jit(lambda F: jnp.searchsorted(
        F, jnp.arange(0, N + B, B, dtype=jnp.int32), side="right")), F)
    timeit("full systematic (old)",
           jax.jit(lambda k: systematic_parents(k, w)), jr.key(3))


if __name__ == "__main__":
    main()
