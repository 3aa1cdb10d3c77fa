"""Piece-count / piece-shape sweep of the resampling-gather pack path
(VERDICT r4 next #2: isolate the config-5 regression).

Times, inside one jit with rep differencing over the axon relay:

  A. pieces -> Pallas pack kernel -> staircase gather (the r4 fused path)
  B. XLA concat(pieces) -> single-matrix staircase gather (the r3 path)
  C. like A/B but the wide pieces are produced by a moveaxis from a
     [T, N, K, 2] layout (MOT shape) — measures whether XLA fuses the
     transpose into the concat while the pack kernel forces it to
     materialize.

Usage: nohup python scripts/pack_sweep.py > /tmp/pack_sweep.log 2>&1 &
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

from genparticlefilters_tpu.ops.fused_gather import resample_gather_rows
from genparticlefilters_tpu.smc.resample import systematic_F


def time_chained(tag, run_one, ks=(2, 20), reps=3):
    @partial(jax.jit, static_argnums=(1,))
    def many(key0, k):
        def body(acc, kk):
            return acc + run_one(kk), None
        acc, _ = lax.scan(body, jnp.asarray(0.0, jnp.float32),
                          jr.split(key0, k))
        return acc

    for k in ks:
        v = float(np.asarray(many(jr.key(0), k)))
    best = 1e9
    for _ in range(reps):
        t0 = time.time(); _ = float(np.asarray(many(jr.key(1), ks[0]))); e1 = time.time() - t0
        t0 = time.time(); _ = float(np.asarray(many(jr.key(1), ks[1]))); e2 = time.time() - t0
        best = min(best, (e2 - e1) / (ks[1] - ks[0]))
    print(f"{tag}: {best*1e3:.3f} ms/run", flush=True)
    return best


def make_pieces(key, widths, n):
    return [jr.normal(k, (w, n)).view(jnp.int32) if False else
            jr.randint(k, (w, n), -2**31, 2**31 - 1, dtype=jnp.int32)
            for k, w in zip(jr.split(key, len(widths)), widths)]


def sweep_piece_count(n=1 << 20, total_rows=160):
    print(f"== piece-count sweep, n={n}, total rows={total_rows} ==",
          flush=True)
    for n_pieces in (1, 2, 4, 8, 16, 32, 80, 160):
        w = total_rows // n_pieces
        widths = [w] * n_pieces
        pieces = make_pieces(jr.key(1), widths, n)

        def run_pack(kk, pieces=pieces):
            F = systematic_F(kk, jnp.full((n,), 1.0 / n))
            out, par = resample_gather_rows(pieces, F)
            return out[0, 0].astype(jnp.float32)

        def run_concat(kk, pieces=pieces):
            F = systematic_F(kk, jnp.full((n,), 1.0 / n))
            big = jnp.concatenate(pieces, axis=0)
            big = jax.lax.optimization_barrier(big)
            out, par = resample_gather_rows(big, F)
            return out[0, 0].astype(jnp.float32)

        a = time_chained(f"  pieces={n_pieces:4d} w={w:4d}  pack-kernel",
                         run_pack)
        b = time_chained(f"  pieces={n_pieces:4d} w={w:4d}  xla-concat ",
                         run_concat)


def sweep_mot_shape(n=1 << 20, T=10, K=4):
    """MOT-shaped pack: two [T, n, K, 2] leaves (moveaxis'd) + a [T, n]
    score leaf + a [n] row."""
    print(f"== MOT-shaped pack, n={n}, T={T}, K={K} ==", flush=True)
    x = jr.randint(jr.key(2), (T, n, K, 2), -2**31, 2**31 - 1,
                   dtype=jnp.int32)
    rv = jr.randint(jr.key(3), (T, n, K, 2), -2**31, 2**31 - 1,
                    dtype=jnp.int32)
    sc = jr.randint(jr.key(4), (T, n), -2**31, 2**31 - 1, dtype=jnp.int32)
    lw = jr.randint(jr.key(5), (1, n), -2**31, 2**31 - 1, dtype=jnp.int32)

    def pieces_of(x, rv, sc, lw):
        xm = jnp.moveaxis(x, 1, -1).reshape(-1, n)
        rm = jnp.moveaxis(rv, 1, -1).reshape(-1, n)
        return [xm, lw, rm, sc]

    def run_pack(kk):
        F = systematic_F(kk, jnp.full((n,), 1.0 / n))
        out, par = resample_gather_rows(pieces_of(x, rv, sc, lw), F)
        return out[0, 0].astype(jnp.float32)

    def run_concat(kk):
        F = systematic_F(kk, jnp.full((n,), 1.0 / n))
        big = jnp.concatenate(pieces_of(x, rv, sc, lw), axis=0)
        big = jax.lax.optimization_barrier(big)
        out, par = resample_gather_rows(big, F)
        return out[0, 0].astype(jnp.float32)

    def run_pack_pretransposed(kk):
        # what packed [T, R8, N] storage would give: no moveaxis anywhere
        F = systematic_F(kk, jnp.full((n,), 1.0 / n))
        out, par = resample_gather_rows([xm_pre, lw, rm_pre, sc], F)
        return out[0, 0].astype(jnp.float32)

    xm_pre = jnp.moveaxis(x, 1, -1).reshape(-1, n).block_until_ready()
    rm_pre = jnp.moveaxis(rv, 1, -1).reshape(-1, n).block_until_ready()

    time_chained("  MOT pack-kernel (moveaxis inputs)   ", run_pack)
    time_chained("  MOT xla-concat  (moveaxis inputs)   ", run_concat)
    time_chained("  MOT pack-kernel (pre-transposed)    ",
                 run_pack_pretransposed)


def sweep_headline_shape(n=100_000):
    """Headline-shaped pack: many sub-8-row pieces (the case the pack
    kernel was built for)."""
    print(f"== headline-shaped pack, n={n} ==", flush=True)
    widths = [10, 10, 10, 1, 1, 1, 1, 10, 1, 1, 1, 1, 1, 1]  # D=50
    pieces = make_pieces(jr.key(6), widths, n)

    def run_pack(kk):
        F = systematic_F(kk, jnp.full((n,), 1.0 / n))
        out, par = resample_gather_rows(pieces, F)
        return out[0, 0].astype(jnp.float32)

    def run_concat(kk):
        F = systematic_F(kk, jnp.full((n,), 1.0 / n))
        big = jnp.concatenate(pieces, axis=0)
        big = jax.lax.optimization_barrier(big)
        out, par = resample_gather_rows(big, F)
        return out[0, 0].astype(jnp.float32)

    time_chained("  headline pack-kernel", run_pack, ks=(2, 40))
    time_chained("  headline xla-concat ", run_concat, ks=(2, 40))


if __name__ == "__main__":
    print("device:", jax.devices()[0], flush=True)
    sweep_headline_shape()
    sweep_mot_shape()
    sweep_piece_count()
