"""Pallas TPU kernel: clustered ancestry gather emitting a lane-dense
transposed matrix, so the per-leaf unpack is cheap sublane slices.

The resampling hot path gathers ``traces[parents]`` with the trace pytree
packed into one ``[N, D]`` int32 matrix (see ``smc/resample.py``). Measured
on v5e at N=100K, D=96: the row gather is cheap (~0.4ms) but *unpacking* the
gathered ``[M, D]`` matrix back into the 14 trace leaves costs ~3ms — every
narrow lane-slice re-reads full (8,128) tiles, and emitting per-leaf
``[M, 10]`` outputs from a kernel is no better (Mosaic lane-pads them to 128,
a 12.8x write amplification).

This kernel exploits that resampling parents from offspring counts
(``counts_to_parents``) are **non-decreasing**: each block of ``B``
consecutive outputs reads a contiguous source range via sequential DMA and
selects rows with an exact one-hot byte-plane matmul on the MXU (int32 split
into four bytes, each exact in bf16) — contracted in the ``[D, B]``
orientation, so the result ``[D, M]`` is lane-dense (lane axis = particles).
The caller unpacks leaves as *sublane* slices ``out[off:off+w, :]`` (which
read only their own tile rows) followed by cheap narrow transposes; width-1
leaves are single rows, no transpose at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["gather_transposed_clustered"]

_B = 256       # output rows (particles) per grid step
_CHUNK = 512   # source rows per DMA slab


def _kernel(parents_ref, src_ref, out_ref, chunk_ref, acc0, acc1, acc2, acc3,
            sem):
    pvec = parents_ref[:, 0]                   # [B] int32
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
        q = pvec - base
        cols = jax.lax.broadcasted_iota(jnp.int32, (_B, _CHUNK), 1)
        onehot = (cols == q[:, None]).astype(jnp.bfloat16)
        vals = chunk_ref[:]
        # four unsigned byte planes: each exact in bf16; one-hot times exact
        # values is exact, so the select runs at full bf16 MXU rate. The
        # contraction is over the CHUNK axis of both operands, producing the
        # transposed [D, B] block directly — no VMEM transpose needed.
        for shift, acc in ((0, acc0), (8, acc1), (16, acc2), (24, acc3)):
            byte = jax.lax.bitwise_and(
                jax.lax.shift_right_logical(vals, shift), 0xFF
            ).astype(jnp.bfloat16)
            acc[:] += jax.lax.dot_general(
                byte, onehot, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
    d_out = out_ref.shape[0]  # 8-aligned; accs are 128-aligned for the DMA
    out = jnp.zeros((d_out, out_ref.shape[1]), jnp.int32)
    for shift, acc in ((0, acc0), (8, acc1), (16, acc2), (24, acc3)):
        out = out | jax.lax.shift_left(
            acc[:d_out, :].astype(jnp.int32), shift)
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_transposed_clustered(matrix, parents, interpret: bool = False):
    """``matrix[parents].T`` for int32 [N, D] and locally-clustered int32 [M]
    indices (non-decreasing parents from offspring-count resampling).
    Returns int32 [D, M], lane-dense."""
    n, d = matrix.shape
    assert matrix.dtype == jnp.int32
    m = parents.shape[0]
    m_pad = -(-m // _B) * _B
    d_out = -(-d // 8) * 8    # output sublane alignment
    d_pad = -(-d // 128) * 128  # DMA slab lane alignment
    n_pad = -(-n // 8) * 8 + _CHUNK
    mat = jnp.pad(matrix, ((0, n_pad - n), (0, d_pad - d)))
    par = parents.astype(jnp.int32)
    if m_pad != m:
        par = jnp.concatenate(
            [par, jnp.broadcast_to(par[-1], (m_pad - m,))])

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((d_out, m_pad), jnp.int32),
        grid=(m_pad // _B,),
        in_specs=[
            pl.BlockSpec((_B, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((d_out, _B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_CHUNK, d_pad), jnp.int32),
            pltpu.VMEM((d_pad, _B), jnp.float32),
            pltpu.VMEM((d_pad, _B), jnp.float32),
            pltpu.VMEM((d_pad, _B), jnp.float32),
            pltpu.VMEM((d_pad, _B), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(par.reshape(m_pad, 1), mat)
    return out[:d, :m] if (d_out != d or m_pad != m) else out
