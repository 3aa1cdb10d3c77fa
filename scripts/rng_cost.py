"""Quantify PRNG cost: vmapped per-particle key chains (the current GFI
interpretation under vmap) vs single-key batched draws (a batched
interpretation), at N=100K — decides whether a batched execution path for
the handlers is worth the refactor.

Usage: nohup python scripts/rng_cost.py > /tmp/rng_cost.log 2>&1 &
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

N = 100_000


def bench(name, step_fn):
    """step_fn(key) -> scalar; chained k times in one executable."""
    @partial(jax.jit, static_argnums=(1,))
    def many(key0, k):
        def body(acc, kk):
            return acc + step_fn(kk), None
        acc, _ = lax.scan(body, jnp.asarray(0.0, jnp.float32),
                          jr.split(key0, k))
        return acc

    for k in (20, 520):
        _ = float(np.asarray(many(jr.key(0), k)))
    best = 1e9
    for _ in range(4):
        t0 = time.time(); _ = float(np.asarray(many(jr.key(1), 20))); e1 = time.time() - t0
        t0 = time.time(); _ = float(np.asarray(many(jr.key(1), 520))); e2 = time.time() - t0
        best = min(best, (e2 - e1) / 500)
    print(f"{name:34s}: {best*1e3:.3f} ms", flush=True)


def vmapped_update_pattern(key):
    """What one pf_update step costs in RNG under vmap: per-particle
    fold_in(t) + 3 site fold_ins + 3 draws."""
    keys = jr.split(key, N)

    def one(k):
        kt = jr.fold_in(k, 5)
        v = 0.0
        for site in range(3):
            ks = jr.fold_in(kt, site + 1)
            v = v + jr.uniform(ks, ())
        return v
    return jnp.sum(jax.vmap(one)(keys))


def batched_update_pattern(key):
    """Same draws, batched: scalar site keys, one [N] draw per site."""
    kt = jr.fold_in(key, 5)
    v = jnp.zeros((N,), jnp.float32)
    for site in range(3):
        ks = jr.fold_in(kt, site + 1)
        v = v + jr.uniform(ks, (N,))
    return jnp.sum(v)


def split_only(key):
    return jnp.sum(jr.key_data(jr.split(key, N)).astype(jnp.float32)[:3])


def main():
    print("device:", jax.devices()[0], f" N={N}", flush=True)
    bench("split(key, N) alone", split_only)
    bench("vmapped 4-fold_in + 3 draws", vmapped_update_pattern)
    bench("batched  4-fold_in + 3 draws", batched_update_pattern)


if __name__ == "__main__":
    main()
