"""Time-major layout prototype: the stochastic-volatility filter (BASELINE
config 3 shape: N=100K, T=100, ESS-triggered systematic resampling +
1-step MH-style rejuvenation) hand-written with [T, N] (particle-minor)
state instead of the framework's vmap-induced [N, T].

Why: with [N, T] leaves, ANY dynamic-timestep column op (trace extension,
windowed rejuvenation reads/writes) touches every (8,128) tile — a full
array pass, O(N*T) per step and O(N*T^2) per filter. Time-major makes a
column a contiguous [N] row: dynamic_update_slice on the MAJOR axis is
O(N). This prototype quantifies the end-to-end gap to motivate (or kill)
a layout refactor.

Usage: nohup python scripts/timemajor_probe.py > /tmp/timemajor.log 2>&1 &
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
from functools import partial
from jax import lax

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
T = int(sys.argv[2]) if len(sys.argv) > 2 else 100

MU, PHI, SIGMA = -1.0, 0.95, 0.3
S0 = SIGMA / np.sqrt(1.0 - PHI ** 2)


def lp_normal(x, mu, s):
    return -0.5 * ((x - mu) / s) ** 2 - jnp.log(s) - 0.9189385332046727


def synthesize(key):
    def body(h, k):
        h = MU + PHI * (h - MU) + SIGMA * jr.normal(k)
        y = jnp.exp(h / 2) * jr.normal(jr.fold_in(k, 1))
        return h, y
    _, y = lax.scan(body, jnp.asarray(MU), jr.split(key, T))
    return y


def filter_tm(key, y_obs):
    """Time-major SV particle filter: h stored [T, N]."""
    k0, kloop = jr.split(key)
    h = jnp.zeros((T, N), jnp.float32)
    h0 = MU + S0 * jr.normal(k0, (N,))
    h = h.at[0].set(h0)
    lw = lp_normal(y_obs[0], 0.0, jnp.exp(h0 / 2))
    lml = jnp.asarray(0.0, jnp.float32)

    def step(carry, t):
        h, lw, lml = carry
        kt = jr.fold_in(kloop, t)
        kr, kj, ku, ka = jr.split(kt, 4)

        # ESS-triggered systematic resample + rejuvenation of h[t-1]
        def branch(op):
            h, lw = op
            m = jnp.max(lw)
            w = jnp.exp(lw - m)
            w = w / jnp.sum(w)
            u0 = jr.uniform(kr, (), jnp.float32)
            c = N * jnp.cumsum(w) - u0
            F = jnp.clip(jnp.floor(c).astype(jnp.int32) + 1, 0, N)
            F = lax.cummax(F.at[-1].set(N))
            prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), F[:-1]])
            parents = jnp.repeat(jnp.arange(N, dtype=jnp.int32), F - prev,
                                 total_repeat_length=N)
            h = jnp.take(h, parents, axis=1)   # lane gather, time-major
            lml_add = m + jnp.log(jnp.mean(jnp.exp(lw - m)))
            lw = jnp.zeros((N,), jnp.float32)
            # MH rejuvenation of h[t-1] given h[t-2]: O(N) row ops only
            hm1 = h[jnp.maximum(t - 1, 0)]
            hm2 = jnp.where(t - 2 >= 0, h[jnp.maximum(t - 2, 0)],
                            jnp.full((N,), MU))
            mean = jnp.where(t - 1 == 0, MU, MU + PHI * (hm2 - MU))
            scale = jnp.where(t - 1 == 0, S0, SIGMA)
            prop = mean + scale * jr.normal(kj, (N,))
            d = (lp_normal(y_obs[t - 1], 0.0, jnp.exp(prop / 2))
                 - lp_normal(y_obs[t - 1], 0.0, jnp.exp(hm1 / 2)))
            accept = jnp.log(jr.uniform(ka, (N,))) < d
            h = lax.dynamic_update_slice(
                h, jnp.where(accept, prop, hm1)[None, :],
                (jnp.maximum(t - 1, 0), 0))
            return h, lw, lml_add

        lwn = lw - jnp.max(lw)
        ess = 1.0 / jnp.sum(jnp.square(jnp.exp(lwn) / jnp.sum(jnp.exp(lwn))))
        h, lw, lml_add = lax.cond(
            ess < 0.5 * N, branch, lambda op: (op[0], op[1], 0.0), (h, lw))
        lml = lml + lml_add

        # propagate: one O(N) row write (dynamic_update_slice, major axis)
        hp = h[jnp.maximum(t - 1, 0)]
        hn = MU + PHI * (hp - MU) + SIGMA * jr.normal(ku, (N,))
        h = lax.dynamic_update_slice(h, hn[None, :], (t, 0))
        lw = lw + lp_normal(y_obs[t], 0.0, jnp.exp(hn / 2))
        return (h, lw, lml), None

    (h, lw, lml), _ = lax.scan(step, (h, lw, lml),
                               jnp.arange(1, T, dtype=jnp.int32))
    m = jnp.max(lw)
    return lml + m + jnp.log(jnp.mean(jnp.exp(lw - m)))


def main():
    print(f"device: {jax.devices()[0]}  N={N} T={T}", flush=True)
    y = synthesize(jr.key(3))

    @partial(jax.jit, static_argnums=1)
    def many(key0, k):
        def body(acc, kk):
            return acc + filter_tm(kk, y), None
        acc, _ = lax.scan(body, jnp.asarray(0.0, jnp.float32),
                          jr.split(key0, k))
        return acc

    for k in (1, 5):
        _ = float(np.asarray(many(jr.key(0), k)))
    t0 = time.time(); l1 = float(np.asarray(many(jr.key(1), 1))); e1 = time.time() - t0
    t0 = time.time(); _ = float(np.asarray(many(jr.key(1), 5))); e5 = time.time() - t0
    per = (e5 - e1) / 4
    print(f"time-major SV filter: {per*1e3:.1f}ms/run -> "
          f"{N*T/per:,.0f} particle-updates/s (lml {l1:.2f})", flush=True)


if __name__ == "__main__":
    main()
