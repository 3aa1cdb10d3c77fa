"""Do per-step row writes into [T, N] stacked leaves pay full-buffer
copies inside a scan, and does a Pallas aliased write avoid it?

Three variants, each: scan over 9 steps, 6 leaves of [T, N] f32, write
row t computed from row t-1.
  dus      x.at[t].set(row)
  dus_cond same but behind a lax.cond toggling like the ESS trigger
  pallas   input_output_aliases={0:0} kernel writing only row t

Usage: nohup python scripts/dus_probe.py > /tmp/dus.log 2>&1 &
"""

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, T, L = 100_000, 10, 6


def _rowwrite_kernel(t_ref, x_ref, row_ref, o_ref):
    t = t_ref[0]
    o_ref[pl.ds(t, 1), :] = row_ref[...]


@jax.jit
def pallas_row_write(x, t, row):
    tN = x.shape
    return pl.pallas_call(
        _rowwrite_kernel,
        out_shape=jax.ShapeDtypeStruct(tN, x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                      pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ),
        input_output_aliases={1: 0},
    )(jnp.array([t], jnp.int32), x, row[None, :])


def _rowwrite_kernel2(t_ref, x_hbm, row_hbm, o_hbm, sem):
    t = t_ref[0]
    cp = pltpu.make_async_copy(row_hbm, o_hbm.at[pl.ds(t, 1), :], sem)
    cp.start()
    cp.wait()


@jax.jit
def pallas_row_write2(x, t, row):
    return pl.pallas_call(
        _rowwrite_kernel2,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                      pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        ),
        input_output_aliases={1: 0},
    )(jnp.array([t], jnp.int32), x, row[None, :])


def make_run(mode):
    def run(key):
        xs = [jr.normal(jr.fold_in(key, i), (T, N)) for i in range(L)]

        def step(xs, t):
            def write(xs):
                out = []
                for x in xs:
                    prev = lax.dynamic_slice(x, (t - 1, 0), (1, N))[0]
                    row = prev * 1.0001 + 0.5
                    if mode == "pallas":
                        out.append(pallas_row_write2(x, t, row))
                    else:
                        out.append(lax.dynamic_update_slice(
                            x, row[None, :], (t, 0)))
                return out
            if mode == "dus_cond":
                xs = lax.cond(t % 2 == 0, write, lambda xs: xs, xs)
            else:
                xs = write(xs)
            return xs, None

        xs, _ = lax.scan(step, xs, jnp.arange(1, T, dtype=jnp.int32))
        return sum(x[T - 1].sum() for x in xs)
    return run


def bench(name, run):
    @functools.partial(jax.jit, static_argnums=(1,))
    def many(key0, k):
        def body(acc, kk):
            return acc + run(kk), None
        acc, _ = lax.scan(body, jnp.asarray(0.0, jnp.float32),
                          jr.split(key0, k))
        return acc

    for k in (2, 12):
        _ = float(np.asarray(many(jr.key(0), k)))
    best = 1e9
    for _ in range(4):
        t0 = time.time(); _ = float(np.asarray(many(jr.key(1), 2))); e1 = time.time() - t0
        t0 = time.time(); _ = float(np.asarray(many(jr.key(1), 12))); e2 = time.time() - t0
        best = min(best, (e2 - e1) / 10)
    per_write = best / ((T - 1) * L)
    print(f"{name:10s}: {best*1e3:.3f} ms/run -> {per_write*1e6:.2f} us per"
          f" leaf-write (row bytes {4*N/1e6:.1f} MB buffer {4*N*T/1e6:.0f} MB)",
          flush=True)
    return best


def main():
    print("device:", jax.devices()[0], flush=True)
    bench("dus", make_run("dus"))
    bench("dus_cond", make_run("dus_cond"))
    try:
        bench("pallas", make_run("pallas"))
    except Exception as e:
        print("pallas variant failed:", repr(e)[:300], flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
