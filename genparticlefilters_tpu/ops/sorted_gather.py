"""Pallas TPU kernel: clustered ancestry gather via ranged DMA + MXU select.

XLA's row gather on TPU pays a full (8,128) tile read per gathered row
(~4KB even for a 32-byte row — measured ~100x over data size at N=100K).
But resampling parents produced by offspring counts
(:func:`~..smc.resample.counts_to_parents`) are **non-decreasing**, so the
source rows needed by a block of consecutive outputs form a contiguous
range. This kernel:

1. DMAs each block's source range HBM→VMEM in CHUNK-row slabs
   (sequential reads at full HBM bandwidth);
2. selects output rows with an exact one-hot matmul on the MXU
   (int32 values split into two 16-bit halves, each exactly representable
   in f32 — one-hot times exact floats is exact).

Cost ≈ one sequential sweep of the parent span + a trivial matmul, instead
of per-row tile reads. Works for any *locally clustered* parents (each
256-row output block reads its own [min,max] range), degrading gracefully —
use ``jnp.take`` for genuinely random parents.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gather_rows_clustered"]

_B = 256       # output rows per grid step
_CHUNK = 512   # source rows per DMA slab


def _kernel(parents_ref, src_ref, out_ref, chunk_ref, acc0, acc1, acc2, acc3,
            sem):
    pvec = parents_ref[:, 0]                       # [B] int32 (VMEM)
    lo = jnp.min(pvec)
    hi = jnp.max(pvec)
    lo8 = (lo // 8) * 8
    n_chunks = (hi - lo8) // _CHUNK + 1

    for acc in (acc0, acc1, acc2, acc3):
        acc[:] = jnp.zeros_like(acc)

    def chunk_body(c, _):
        base = lo8 + c * _CHUNK
        cp = pltpu.make_async_copy(
            src_ref.at[pl.ds(base, _CHUNK), :], chunk_ref, sem)
        cp.start()
        cp.wait()
        q = pvec - base                             # [B] local row index
        cols = jax.lax.broadcasted_iota(jnp.int32, (_B, _CHUNK), 1)
        onehot = (cols == q[:, None]).astype(jnp.bfloat16)
        vals = chunk_ref[:]
        # split into four unsigned bytes: each is exact in bf16, and a
        # one-hot matmul against exact values is exact, so the select runs
        # at full-rate bf16 on the MXU with f32 accumulation
        for shift, acc in ((0, acc0), (8, acc1), (16, acc2), (24, acc3)):
            byte = jax.lax.bitwise_and(
                jax.lax.shift_right_logical(vals, shift), 0xFF
            ).astype(jnp.bfloat16)
            acc[:] += jnp.dot(onehot, byte,
                              preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
    out = jnp.zeros(out_ref.shape, jnp.int32)
    for shift, acc in ((0, acc0), (8, acc1), (16, acc2), (24, acc3)):
        out = out | jax.lax.shift_left(acc[:].astype(jnp.int32), shift)
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows_clustered(matrix, parents, interpret: bool = False):
    """``matrix[parents]`` for int32 [N, D] and locally-clustered int32 [M]
    indices (non-decreasing parents from offspring-count resampling).
    M must be a multiple of 256."""
    n, d = matrix.shape
    m = parents.shape[0]
    assert m % _B == 0, m
    assert matrix.dtype == jnp.int32
    d_pad = -(-d // 128) * 128
    n_pad = -(-n // 8) * 8 + _CHUNK
    mat = jnp.pad(matrix, ((0, n_pad - n), (0, d_pad - d)))
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((m, d_pad), jnp.int32),
        grid=(m // _B,),
        in_specs=[
            pl.BlockSpec((_B, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((_B, d_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_CHUNK, d_pad), jnp.int32),
            pltpu.VMEM((_B, d_pad), jnp.float32),
            pltpu.VMEM((_B, d_pad), jnp.float32),
            pltpu.VMEM((_B, d_pad), jnp.float32),
            pltpu.VMEM((_B, d_pad), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(parents.astype(jnp.int32).reshape(m, 1), mat)
    return out[:, :d] if d_pad != d else out
