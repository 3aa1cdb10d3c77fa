"""Pallas TPU kernel: ancestry row-gather (embedding-lookup pattern).

The resampling ancestor exchange ``traces[parents]`` is the bandwidth-heavy
op of SMC (SURVEY.md §2 #4). The packed [N, D] formulation turns dozens of
narrow per-leaf gathers into one row-gather; this kernel pushes further by
driving the rows with **async DMA** — each output row is an HBM→HBM copy
issued by its index from a scalar-prefetched parents vector, with a ring of
in-flight copies so the DMA engines stay saturated instead of the gather
unit trickling elements.

Falls back to ``jnp.take`` off-TPU (and under interpret-mode tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gather_rows", "gather_rows_pallas"]

_BLOCK = 256      # output rows per grid step
_INFLIGHT = 8     # concurrent DMAs


def _gather_kernel(parents_ref, src_ref, out_ref, sems):
    i = pl.program_id(0)
    base = i * _BLOCK

    def copy(r):
        p = parents_ref[base + r]
        return pltpu.make_async_copy(
            src_ref.at[p], out_ref.at[base + r], sems.at[r % _INFLIGHT])

    def body(r, _):
        # ring of in-flight DMAs: wait for the copy occupying this
        # semaphore slot before reusing it, then issue row r
        @pl.when(r >= _INFLIGHT)
        def _():
            copy(r - _INFLIGHT).wait()
        copy(r).start()
        return 0

    jax.lax.fori_loop(0, _BLOCK, body, 0)

    def drain(r, _):
        copy(_BLOCK - _INFLIGHT + r).wait()
        return 0

    jax.lax.fori_loop(0, _INFLIGHT, drain, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows_pallas(matrix, parents, interpret: bool = False):
    """``matrix[parents]`` for a 2-D [N, D] matrix and int32 [M] indices;
    M must be a multiple of 256 (pad the tail via jnp.take otherwise).

    Rows are viewed as [8, D/8] tiles so the particle axis is a plain
    (untiled) leading axis — Mosaic requires DMA slices to respect the
    (8, 128) sublane tiling, which a 2-D [N, D] layout would violate for
    single-row copies.
    """
    n, d = matrix.shape
    m = parents.shape[0]
    assert m % _BLOCK == 0
    # Mosaic DMA slices must respect the (8, 128) sublane/lane tiling on the
    # trailing two dims, so rows are padded to a whole number of 8x128 tiles
    d_pad = -(-d // 1024) * 1024
    if d_pad != d:
        matrix = jnp.pad(matrix, ((0, 0), (0, d_pad - d)))
    mat3 = matrix.reshape(n, d_pad // 128, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m // _BLOCK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_INFLIGHT,))],
    )
    out3 = pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((m, d_pad // 128, 128), matrix.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(parents.astype(jnp.int32), mat3)
    out = out3.reshape(m, d_pad)
    return out[:, :d] if d_pad != d else out


def gather_rows(matrix, parents):
    """Row gather with the Pallas DMA kernel on TPU, ``jnp.take``
    elsewhere or for awkward shapes."""
    on_tpu = jax.devices()[0].platform == "tpu"
    m = parents.shape[0]
    if on_tpu and m % _BLOCK == 0 and matrix.ndim == 2:
        return gather_rows_pallas(matrix, parents)
    return jnp.take(matrix, parents, axis=0)
