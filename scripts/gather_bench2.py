"""Variants: per-leaf take vs pack/unpack stages; cumsum formulations.

Usage: nohup python scripts/gather_bench2.py > /tmp/gather2.log 2>&1 &
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
    _pack_leaves, _unpack_leaves, systematic_parents)

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
    traces = state.traces

    w = jnp.full((N,), 1.0 / N, jnp.float32)
    parents = jax.block_until_ready(
        jax.jit(systematic_parents)(jr.key(3), w))

    # 1. per-leaf take, no packing
    def per_leaf(tr, p):
        return jax.tree_util.tree_map(
            lambda l: jnp.take(l, p, axis=0) if l.ndim > 0 else l, tr)
    timeit("per-leaf take", jax.jit(per_leaf), traces, parents)

    # 2. pack only / pack+take / full pack+take+unpack without barriers
    def pack_only(tr):
        leaves = jax.tree_util.tree_leaves(tr)
        cols, meta = _pack_leaves(leaves)
        return jnp.concatenate([c for c in cols if c is not None], axis=1)
    timeit("pack only", jax.jit(pack_only), traces)

    def pack_take(tr, p):
        return jnp.take(pack_only(tr), p, axis=0)
    timeit("pack+take (no barrier)", jax.jit(pack_take), traces, parents)

    def pack_take_unpack(tr, p):
        leaves = jax.tree_util.tree_flatten(tr)[0]
        cols, meta = _pack_leaves(leaves)
        big = jnp.concatenate([c for c in cols if c is not None], axis=1)
        big = jnp.take(big, p, axis=0)
        out = _unpack_leaves(big, leaves, cols, meta, p, N)
        return out
    timeit("pack+take+unpack (no barrier)", jax.jit(pack_take_unpack),
           traces, parents)

    # 3. cumsum formulations on [N] f32
    x = jr.uniform(jr.key(5), (N,), jnp.float32)
    timeit("jnp.cumsum [N]", jax.jit(jnp.cumsum), x)

    def cumsum_blocked(v):
        R = 1024
        n = v.shape[0]
        npad = -(-n // R) * R
        vp = jnp.pad(v, (0, npad - n)).reshape(npad // R, R)
        tri = jnp.tril(jnp.ones((R, R), jnp.float32))
        within = jnp.dot(vp, tri.T, preferred_element_type=jnp.float32)
        rows = within[:, -1]
        offs = jnp.cumsum(rows) - rows
        return (within + offs[:, None]).reshape(-1)[:n]
    out1 = jax.jit(jnp.cumsum)(x)
    out2 = jax.jit(cumsum_blocked)(x)
    print("cumsum max abs diff:",
          float(jnp.max(jnp.abs(out1 - out2))), flush=True)
    timeit("cumsum blocked-matmul", jax.jit(cumsum_blocked), x)

    # 4. cummax formulations on [N] int32
    xi = jr.randint(jr.key(6), (N,), -1, N, jnp.int32)
    timeit("lax.cummax [N]", jax.jit(jax.lax.cummax), xi)

    def cummax_blocked(v):
        R = 1024
        n = v.shape[0]
        npad = -(-n // R) * R
        vp = jnp.pad(v, (0, npad - n), constant_values=-(2**31)+1)
        vp = vp.reshape(npad // R, R)
        within = jax.lax.cummax(vp, axis=1)
        rows = within[:, -1]
        offs = jax.lax.cummax(rows)
        offs = jnp.concatenate(
            [jnp.full((1,), -(2**31)+1, v.dtype), offs[:-1]])
        return jnp.maximum(within, offs[:, None]).reshape(-1)[:n]
    o1 = jax.jit(jax.lax.cummax)(xi)
    o2 = jax.jit(cummax_blocked)(xi)
    print("cummax equal:", bool(jnp.all(o1 == o2)), flush=True)
    timeit("cummax blocked", jax.jit(cummax_blocked), xi)

    # 5. parents with blocked cumsum/cummax inline
    def systematic_parents_fast(key, weights):
        n = weights.shape[0]
        u0 = jr.uniform(key, (), jnp.float32)
        c = n * cumsum_blocked(weights) - u0
        F = jnp.floor(c).astype(jnp.int32) + 1
        F = jnp.clip(F, 0, n).at[-1].set(n)
        F = cummax_blocked(F)
        prev = jnp.concatenate([jnp.zeros((1,), F.dtype), F[:-1]])
        counts = F - prev
        cum = jnp.cumsum(counts)
        starts = cum - counts
        idx = jnp.arange(n, dtype=jnp.int32)
        slots = jnp.where(counts > 0, starts, n)
        seeded = jnp.full((n,), -1, jnp.int32).at[slots].max(idx, mode="drop")
        return cummax_blocked(seeded)
    pf_ref = jax.jit(systematic_parents)(jr.key(3), w)
    pf_fast = jax.jit(systematic_parents_fast)(jr.key(3), w)
    print("parents equal:", bool(jnp.all(pf_ref == pf_fast)), flush=True)
    timeit("parents fast", jax.jit(systematic_parents_fast), jr.key(3), w)


if __name__ == "__main__":
    main()
