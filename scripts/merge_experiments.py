"""Experiments: fastest exact #{u_j <= c_i} for sorted c, u on TPU.

Variants (all exact, tag packed into low bit of order-preserving int32
bitcast of positive-f32 keys — ties break u-before-c, i.e. side='right'):
  A. concat + single-operand XLA sort of packed int32
  B. bitonic merge, stack/reshape pairing (current _merge_count shape)
  C. bitonic merge, roll-based pairing (no reshapes)
plus the old f32 two-operand sort for reference.

Usage: nohup python scripts/merge_experiments.py > /tmp/merge_exp.log 2>&1 &
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

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000


def pack(c, u):
    n, m = c.shape[0], u.shape[0]
    ci = jax.lax.bitcast_convert_type(c, jnp.int32)
    ui = jax.lax.bitcast_convert_type(u, jnp.int32)
    return (ci << 1) | 1, ui << 1


def finish(z, n):
    tags = z & 1
    r = jnp.cumsum(tags) - tags
    Fv = jnp.arange(z.shape[0], dtype=jnp.int32) - r
    return jnp.zeros((n,), jnp.int32).at[
        jnp.where(tags == 1, r, n)].set(Fv, mode="drop")


def variant_A(c, u):
    n = c.shape[0]
    ck, uk = pack(c, u)
    z = jnp.sort(jnp.concatenate([ck, uk]))
    return finish(z, n)


def _merge_reshape(z):
    Mp = z.shape[0]
    d = Mp >> 1
    while d >= 1:
        k2 = z.reshape(-1, 2, d)
        a, b = k2[:, 0], k2[:, 1]
        z = jnp.stack([jnp.minimum(a, b), jnp.maximum(a, b)], 1).reshape(Mp)
        d >>= 1
    return z


def _merge_roll(z):
    Mp = z.shape[0]
    i = jnp.arange(Mp, dtype=jnp.int32)
    d = Mp >> 1
    while d >= 1:
        lo_half = (i & d) == 0
        fwd = jnp.roll(z, -d)
        bwd = jnp.roll(z, d)
        z = jnp.where(lo_half, jnp.minimum(z, fwd), jnp.maximum(z, bwd))
        d >>= 1
    return z


def bitonic_input(c, u):
    n, m = c.shape[0], u.shape[0]
    Mp = 1 << max(1, (n + m - 1).bit_length())
    ck, uk = pack(c, u)
    return jnp.concatenate([
        ck, jnp.full((Mp - n - m,), jnp.iinfo(jnp.int32).max, jnp.int32),
        uk[::-1]])


def variant_B(c, u):
    return finish(_merge_reshape(bitonic_input(c, u)), c.shape[0])


def variant_C(c, u):
    return finish(_merge_roll(bitonic_input(c, u)), c.shape[0])


def old_sort(c, u):
    n = c.shape[0]
    return jnp.searchsorted(u, c, side="right", method="sort"
                            ).astype(jnp.int32)


def bench(name, fn, c, u_unused):
    @partial(jax.jit, static_argnums=(1,))
    def many(key0, k):
        def body(acc, kk):
            ce = jnp.cumsum(jr.exponential(kk, (N + 1,), jnp.float32))
            uu = ce[:-1] / ce[-1]  # fresh sorted uniforms per iteration
            return acc + fn(c, uu)[::4096].sum(), None
        acc, _ = lax.scan(body, jnp.asarray(0, jnp.int32), jr.split(key0, k))
        return acc

    for k in (2, 22):
        _ = int(np.asarray(many(jr.key(0), k)))
    best = 1e9
    for _ in range(4):
        t0 = time.time(); _ = int(np.asarray(many(jr.key(1), 2))); e1 = time.time() - t0
        t0 = time.time(); _ = int(np.asarray(many(jr.key(1), 22))); e2 = time.time() - t0
        best = min(best, (e2 - e1) / 20)
    print(f"{name:14s}: {best*1e3:.3f} ms", flush=True)


def main():
    print("device:", jax.devices()[0], f" N={N}", flush=True)
    w = jr.dirichlet(jr.key(3), jnp.ones(N) * 0.5)
    c = jnp.cumsum(w)
    c = c / c[-1]
    ce = jnp.cumsum(jr.exponential(jr.key(4), (N + 1,), jnp.float32))
    u = ce[:-1] / ce[-1]
    # correctness
    ref = np.searchsorted(np.asarray(u, np.float64), np.asarray(c, np.float64),
                          side="right")
    for name, fn in [("A sort-packed", variant_A), ("B reshape", variant_B),
                     ("C roll", variant_C)]:
        got = np.asarray(jax.jit(fn)(c, u))
        bad = np.abs(got - ref) > 0
        print(f"{name}: mismatches {bad.sum()} (max {np.abs(got-ref).max()})",
              flush=True)
    bench("old f32 sort", old_sort, c, u)
    bench("A sort-packed", variant_A, c, u)
    bench("B reshape", variant_B, c, u)
    bench("C roll", variant_C, c, u)


if __name__ == "__main__":
    main()
