"""Decompose multinomial_parents cost at N=100K: which XLA ops around the
78 us Pallas merge kernel pay the remaining ~1.9 ms?

Stages (each timed as a chained-K jit, differenced):
  w_cumsum      cumsum(weights) only
  sorted_unifs  + exponential spacings cumsum
  merge_out     + bitonic merge kernel (sum of z, no count extraction)
  tags_cumsum   + cumsum of tags over the merged [Mp] vector
  scatter_F     + the .at[slots].set scatter back to [N]
  mnF_full      multinomial_F (everything incl. _pinned_F)
  parents_full  multinomial_parents (adds counts_to_parents scatter+cummax)

Usage: nohup python scripts/mn_breakdown.py > /tmp/mn_breakdown.log 2>&1 &
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

from genparticlefilters_tpu.smc import resample as R

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000


def bench(name, fn, w):
    @partial(jax.jit, static_argnums=(1,))
    def many(key0, k):
        def body(acc, kk):
            return acc + fn(kk, w), None
        acc, _ = lax.scan(body, jnp.asarray(0, jnp.float32),
                          jr.split(key0, k))
        return acc

    for k in (2, 22):
        _ = float(np.asarray(many(jr.key(0), k)))
    best = 1e9
    for _ in range(4):
        t0 = time.time(); _ = float(np.asarray(many(jr.key(1), 2))); e1 = time.time() - t0
        t0 = time.time(); _ = float(np.asarray(many(jr.key(1), 22))); e2 = time.time() - t0
        best = min(best, (e2 - e1) / 20)
    print(f"{name:16s}: {best*1e3:.3f} ms", flush=True)
    return best


def merged_z(key, w):
    """Re-create _merge_count's merged vector z (kernel included)."""
    n_out = w.shape[0]
    ce = R._sorted_uniforms_cum(key, n_out)
    c = jnp.cumsum(w)
    u = ce[:-1] / ce[-1]
    c = c / jnp.maximum(c[-1], 1e-37)
    n, m = c.shape[0], u.shape[0]
    Mp = 1 << max(1, (n + m - 1).bit_length())
    ck = (lax.bitcast_convert_type(c, jnp.int32) << 1) | 1
    uk = lax.bitcast_convert_type(u, jnp.int32) << 1
    pad = jnp.iinfo(jnp.int32).max - 1
    z = jnp.concatenate([ck, jnp.full((Mp - n - m,), pad, jnp.int32),
                         uk[::-1]])
    from genparticlefilters_tpu.ops.merge_count import bitonic_merge_sorted
    return bitonic_merge_sorted(z), n


def main():
    print("device:", jax.devices()[0], f" N={N}", flush=True)
    w = jr.dirichlet(jr.key(3), jnp.ones(N) * 0.5)

    bench("w_cumsum", lambda k, ww: jnp.cumsum(ww)[-1], w)
    bench("sorted_unifs", lambda k, ww: jnp.cumsum(ww)[-1]
          + R._sorted_uniforms_cum(k, N)[-1], w)
    bench("merge_out", lambda k, ww: merged_z(k, ww)[0][::4096]
          .sum().astype(jnp.float32), w)

    def tags_cumsum(k, ww):
        z, n = merged_z(k, ww)
        tags = z & 1
        r = jnp.cumsum(tags) - tags
        return (r[::4096].sum()).astype(jnp.float32)
    bench("tags_cumsum", tags_cumsum, w)

    def scatter_F(k, ww):
        z, n = merged_z(k, ww)
        tags = z & 1
        r = jnp.cumsum(tags) - tags
        i = jnp.arange(z.shape[0], dtype=jnp.int32)
        F_at_slot = i - r
        F = jnp.zeros((n,), jnp.int32).at[
            jnp.where(tags == 1, r, n)].set(F_at_slot, mode="drop")
        return F[::4096].sum().astype(jnp.float32)
    bench("scatter_F", scatter_F, w)

    bench("mnF_full", lambda k, ww: R.multinomial_F(k, ww)[::4096]
          .sum().astype(jnp.float32), w)
    bench("parents_full", lambda k, ww: R.multinomial_parents(k, ww)[::4096]
          .sum().astype(jnp.float32), w)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
