"""Sort-free multinomial/residual parents: measured win at N=100K.

Compares the removed searchsorted(method="sort") formulation (bitonic
concat-sort), the searchsorted(method="scan_unrolled") binary search
(measured 5x WORSE than the sort: log N random in-lane gather passes),
and the new bitonic-MERGE count formulation (sorted uniforms via
exponential spacings + one merge network), each chained K times inside
one jit.

Usage: nohup python scripts/multinomial_bench.py > /tmp/mn_bench.log 2>&1 &
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

from genparticlefilters_tpu.smc.resample import (
    multinomial_parents, residual_parents, multinomial_F, residual_F,
    _F_to_parents)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000


def mn_sort(key, weights):  # the round-2 formulation, for comparison
    cum = jnp.cumsum(weights)
    u = jr.uniform(key, (N,), weights.dtype) * cum[-1]
    return jnp.clip(jnp.searchsorted(cum, u, side="right", method="sort"),
                    0, N - 1).astype(jnp.int32)


def bench(name, parent_fn, w):
    @partial(jax.jit, static_argnums=(1,))
    def many(key0, k):
        def body(acc, kk):
            return acc + parent_fn(kk, w)[::4096].sum(), None
        acc, _ = lax.scan(body, jnp.asarray(0, jnp.int32), jr.split(key0, k))
        return acc

    for k in (2, 22):
        _ = int(np.asarray(many(jr.key(0), k)))
    best = 1e9
    for _ in range(4):
        t0 = time.time(); _ = int(np.asarray(many(jr.key(1), 2))); e1 = time.time() - t0
        t0 = time.time(); _ = int(np.asarray(many(jr.key(1), 22))); e2 = time.time() - t0
        best = min(best, (e2 - e1) / 20)
    print(f"{name:24s}: {best*1e3:.3f} ms", flush=True)
    return best


def mn_scan(key, weights):  # binary search, for comparison
    cum = jnp.cumsum(weights)
    u = jr.uniform(key, (N,), weights.dtype) * cum[-1]
    return jnp.clip(
        jnp.searchsorted(cum, u, side="right", method="scan_unrolled"),
        0, N - 1).astype(jnp.int32)


def main():
    print("device:", jax.devices()[0], f" N={N}", flush=True)
    w = jr.dirichlet(jr.key(3), jnp.ones(N) * 0.5)
    bench("multinomial sort (old)", mn_sort, w)
    bench("multinomial searchsorted", mn_scan, w)
    bench("multinomial merge (new)",
          lambda k, ww: multinomial_parents(k, ww), w)
    bench("residual merge (new)",
          lambda k, ww: residual_parents(k, ww), w)


if __name__ == "__main__":
    main()
