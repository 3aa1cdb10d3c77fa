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

__all__ = ["gather_transposed_clustered", "resample_gather_transposed"]

_B = 256       # output rows (particles) per grid step
_CHUNK = 512   # source rows per DMA slab
_FSLAB = 4096  # F values per counting slab (8 rows x 512 lanes)


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


def _kernel_resample(bases_ref, src_ref, f2_ref, out_ref,
                     chunk_ref, fslab, acc0, acc1, acc2, acc3, sem, semf):
    """Fused resampling gather: phase 1 derives this block's parent indices
    from the monotone cumulative hit counts F (``p_j = #{i : F_i <= j}``,
    counted over DMA'd F slabs — replaces the XLA scatter+cummax in
    ``counts_to_parents``); phase 2 is the ranged-DMA one-hot select. The
    parents themselves come out as an extra sublane row of the output — the
    caller appends a row-index column to the matrix, which the exact
    byte-plane select gathers like any other column."""
    i = pl.program_id(0)
    lo = bases_ref[i, 0]
    hi = bases_ref[i, 1]

    # ---- phase 1: count parents: p_b = slab_base + #{v in slabs: F_v <= j_b}
    slab0 = lo // _FSLAB
    n_slabs = hi // _FSLAB - slab0 + 1
    j_b = i * _B + jax.lax.broadcasted_iota(jnp.int32, (_B, 1), 0)

    def count_body(k, cnt):
        cp = pltpu.make_async_copy(
            f2_ref.at[pl.ds((slab0 + k) * 8, 8), :], fslab, semf)
        cp.start()
        cp.wait()
        for s in range(8):
            ge = fslab[s, :][None, :] <= j_b      # [B, 512]
            cnt = cnt + jnp.sum(ge, axis=1, keepdims=True,
                                dtype=jnp.int32)
        return cnt

    cnt = jax.lax.fori_loop(0, n_slabs, count_body,
                            jnp.zeros((_B, 1), jnp.int32))
    pvec = slab0 * _FSLAB + cnt[:, 0]             # [B] int32

    # ---- phase 2: ranged-DMA gather + exact one-hot byte-plane select
    dlo = jnp.min(pvec)
    dhi = jnp.max(pvec)
    lo8 = (dlo // 8) * 8
    n_chunks = (dhi - lo8) // _CHUNK + 1

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
        for shift, acc in ((0, acc0), (8, acc1), (16, acc2), (24, acc3)):
            byte = jax.lax.bitwise_and(
                jax.lax.shift_right_logical(vals, shift), 0xFF
            ).astype(jnp.bfloat16)
            acc[:] += jax.lax.dot_general(
                byte, onehot, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

    # data rows plus the appended row-index column (= parents), all gathered
    # through the same exact byte-plane select
    d_out = out_ref.shape[0]
    out = jnp.zeros((d_out, _B), jnp.int32)
    for shift, acc in ((0, acc0), (8, acc1), (16, acc2), (24, acc3)):
        out = out | jax.lax.shift_left(
            acc[:d_out, :].astype(jnp.int32), shift)
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("interpret", "has_index_col"))
def resample_gather_transposed(matrix, F, interpret: bool = False,
                               has_index_col: bool = False):
    """Resampling ancestry gather directly from cumulative hit counts.

    ``matrix``: int32 [N, D]; ``F``: int32 [N], nondecreasing with
    ``F[-1] == N`` — ``F_i`` = number of output slots with parent <= i
    (systematic/stratified offspring counts, cumulated). Output slot ``j``
    takes parent ``p_j = #{i : F_i <= j}``. Returns ``(out, parents)`` with
    ``out`` int32 [D, N] lane-dense (= ``matrix[parents].T``) and
    ``parents`` int32 [N] — recovered by gathering a row-index column
    through the same exact byte-plane select. Pass ``has_index_col=True``
    when the caller already appended ``arange(N)`` as the last column (so
    it rides the caller's single pack concat instead of a second copy).
    """
    n, d1_in = matrix.shape
    assert matrix.dtype == jnp.int32
    m = n
    m_pad = -(-m // _B) * _B
    nb = m_pad // _B
    if has_index_col:
        mat = matrix
        d = d1_in - 1
    else:
        mat = jnp.concatenate(
            [matrix, jnp.arange(n, dtype=jnp.int32)[:, None]], axis=1)
        d = d1_in
    d1 = d + 1                     # data + row-index column
    d_rows = -(-d1 // 8) * 8       # output sublane alignment
    d_pad = -(-d1 // 128) * 128    # DMA slab lane alignment
    n_pad = -(-n // 8) * 8 + _CHUNK
    mat = jnp.pad(mat, ((0, n_pad - n), (0, d_pad - d1)))

    # per-block parent bounds via a tiny binary search (replaces the XLA
    # scatter): lo_i = p at output i*B, hi_i = p at output (i+1)*B
    grid = jnp.arange(nb + 1, dtype=jnp.int32) * _B
    ss = jnp.searchsorted(F, grid, side="right").astype(jnp.int32)
    bases = jnp.stack([ss[:-1], jnp.minimum(ss[1:], n - 1)], axis=1)

    # F padded with INT32_MAX (never counted) into [rows, 512] slabs
    nf = -(-(n + 1) // _FSLAB) * _FSLAB
    f2 = jnp.pad(F, (0, nf - n),
                 constant_values=jnp.iinfo(jnp.int32).max).reshape(-1, 512)

    out = pl.pallas_call(
        _kernel_resample,
        out_shape=jax.ShapeDtypeStruct((d_rows, m_pad), jnp.int32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            ],
            out_specs=pl.BlockSpec((d_rows, _B), lambda i, bases: (0, i)),
            scratch_shapes=[
                pltpu.VMEM((_CHUNK, d_pad), jnp.int32),
                pltpu.VMEM((8, 512), jnp.int32),
                pltpu.VMEM((d_pad, _B), jnp.float32),
                pltpu.VMEM((d_pad, _B), jnp.float32),
                pltpu.VMEM((d_pad, _B), jnp.float32),
                pltpu.VMEM((d_pad, _B), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        interpret=interpret,
    )(bases, mat, f2)
    parents = out[d, :m]  # gathered row-index column = parents
    return out[:d, :m], parents


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
