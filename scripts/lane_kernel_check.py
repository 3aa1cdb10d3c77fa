"""Device check + microbench of the lane-major fused gather kernels."""
import sys, time
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
import jax.numpy as jnp, jax.random as jr, numpy as np
from functools import partial
from jax import lax
from genparticlefilters_tpu.ops.fused_gather import (
    resample_gather_rows, gather_rows_clustered, resample_gather_transposed)

n, d = 100_000, 53
print("device:", jax.devices()[0], flush=True)
big = jr.randint(jr.key(0), (d, n), -2**31, 2**31 - 1, jnp.int32)
w = jr.dirichlet(jr.key(1), jnp.ones(n) * 0.5)
F = jnp.clip(jnp.floor(n * jnp.cumsum(w) - 0.3).astype(jnp.int32) + 1, 0, n)
F = jax.lax.cummax(F.at[-1].set(n))
prev = jnp.concatenate([jnp.zeros(1, jnp.int32), F[:-1]])
parents_ref = jnp.repeat(jnp.arange(n, dtype=jnp.int32), F - prev,
                         total_repeat_length=n)

ref = jnp.take(big, parents_ref, axis=1)

def many(big, F, k, fn):
    def body(acc, i):
        o, p = fn(big + i, F)
        return acc + o[0, 0] + p[0], None
    acc, _ = lax.scan(body, jnp.asarray(0, jnp.int32),
                      jnp.arange(k, dtype=jnp.int32))
    return acc

def bench(label, fn):
    f1 = jax.jit(lambda big, F, k: many(big, F, k, fn), static_argnums=(2,))
    for k in (2, 22):
        _ = int(np.asarray(f1(big, F, k)))
    best = 1e9
    for _ in range(3):
        t0 = time.time(); _ = int(np.asarray(f1(big, F, 2))); e1 = time.time() - t0
        t0 = time.time(); _ = int(np.asarray(f1(big, F, 22))); e2 = time.time() - t0
        best = min(best, (e2 - e1) / 20)
    print(f"{label}: {best*1e3:.3f} ms", flush=True)

bench("lane stairs  ", lambda b, F: resample_gather_rows(b, F))
bench("row stairs(T) ", lambda b, F: resample_gather_transposed(b.T, F))
