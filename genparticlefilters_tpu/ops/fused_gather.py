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

__all__ = ["gather_transposed_clustered", "resample_gather_transposed",
           "gather_rows_clustered", "resample_gather_rows",
           "resample_gather_rows_u", "resample_gather_split",
           "resample_gather_split_u"]

_BL = 512   # output lanes per grid step (lane-major kernels)
_SL = 1024  # source lanes per DMA chunk (lane-major kernels)


def _lane_kernel_body(vals, onehot, acc):
    """Accumulate the exact int8 byte-plane one-hot select for one chunk,
    as ONE stacked matmul: the four byte planes of ``vals`` (biased to
    [-128,127], undone after the loop since each output's one-hot hits
    exactly once across all chunks) are stacked on sublanes into a single
    [4R, S] operand sharing one one-hot, so the MXU runs one full-row-
    occupancy [4R x S x B] int8 contraction instead of four quarter-
    occupancy [R x S x B] passes (R~56 uses 44% of the 128 MXU rows; 4R
    uses ~88-100% — measured ~1.7x on the in-filter resample phase).

    ``vals`` rows are padded to a multiple of 32 (the int8 sublane tile)
    by the callers' chunk buffers, so every concat boundary is
    tile-aligned and the stacking is relayout-free; the padded rows carry
    garbage that lands in accumulator rows the recombine never reads."""
    planes = [
        (jax.lax.bitwise_and(
            jax.lax.shift_right_logical(vals, shift), 0xFF)
         - 128).astype(jnp.int8)
        for shift in (0, 8, 16, 24)]
    stacked = jnp.concatenate(planes, axis=0)
    acc[:] += jax.lax.dot_general(
        stacked, onehot, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)


def _lane_kernel_out(acc, r32, d_out):
    """Recombine the stacked byte-plane accumulator [4*r32, B] into int32
    output rows [d_out, B] (undoing the -128 bias); ``r32`` is the padded
    per-plane row stride."""
    out = jnp.zeros((d_out, acc.shape[1]), jnp.int32)
    for k, shift in enumerate((0, 8, 16, 24)):
        byte = jax.lax.bitwise_and(acc[k * r32:k * r32 + d_out, :] + 128,
                                   0xFF)
        out = out | jax.lax.shift_left(byte, shift)
    return out


def _r32(r8: int) -> int:
    """Chunk-buffer row count: r8 padded to the int8 sublane tile (32) so
    the four byte planes concat at tile-aligned boundaries."""
    return -(-r8 // 32) * 32



def _ss_two_level(a, q, side):
    """Exact searchsorted of an ascending [n] array against [Q] queries
    WITHOUT XLA's binary-search while-loop lowering (measured ~30 µs per
    call at n=100K, ~287 µs at n=1M): a coarse block index from one
    [Q, n/512] compare-sum against the per-512-block maxima, then an exact
    in-block count on the gathered 512-lane row. Exact for both sides
    because the edge-padding (value a[-1]) can only miscount when the
    query already clears the last block's maximum, in which case the
    coarse index is K and the padded row is never consulted."""
    n = a.shape[0]
    K = -(-n // 512)
    ap = jnp.pad(a, (0, K * 512 - n), mode="edge")
    rows = ap.reshape(K, 512)
    tops = rows[:, -1]
    if side == "right":
        blk = jnp.sum((tops[None, :] <= q[:, None]).astype(jnp.int32),
                      axis=1)
        row = rows[jnp.clip(blk, 0, K - 1)]
        cnt = jnp.sum((row <= q[:, None]).astype(jnp.int32), axis=1)
    else:
        blk = jnp.sum((tops[None, :] < q[:, None]).astype(jnp.int32),
                      axis=1)
        row = rows[jnp.clip(blk, 0, K - 1)]
        cnt = jnp.sum((row < q[:, None]).astype(jnp.int32), axis=1)
    return jnp.where(blk >= K, n, blk * 512 + cnt).astype(jnp.int32)


def _bases_F(F, m, n):
    """Per-output-block source sweep bounds from monotone hit counts F —
    exact at every n (two-level search; no while-loop, no conservative
    widening of the kernel sweep)."""
    m_pad = -(-m // _BL) * _BL
    grid = jnp.arange(m_pad // _BL + 1, dtype=jnp.int32) * _BL
    if n < 4096:
        ss = jnp.searchsorted(F, grid, side="right").astype(jnp.int32)
    else:
        ss = _ss_two_level(F, grid, "right")
    return jnp.stack([ss[:-1], jnp.minimum(ss[1:], n - 1)], axis=1)


def _bases_u(c, up, m, n):
    """Per-output-block source sweep bounds for ascending float queries
    against ascending cumulative weights (see :func:`_bases_F`)."""
    m_pad = -(-m // _BL) * _BL
    nb = m_pad // _BL
    grid = jnp.arange(nb, dtype=jnp.int32) * _BL
    qlo = up[grid]
    qhi = up[jnp.minimum(grid + _BL - 1, m - 1)]
    if n < 4096:
        ss_lo = jnp.searchsorted(c, qlo, side="left").astype(jnp.int32)
        ss_hi = jnp.searchsorted(c, qhi, side="left").astype(jnp.int32)
    else:
        ss_lo = _ss_two_level(c, qlo, "left")
        ss_hi = _ss_two_level(c, qhi, "left")
    return jnp.stack([jnp.minimum(ss_lo, n - 1),
                      jnp.minimum(ss_hi, n - 1)], axis=1)


def _kernel_stairs_lanes(bases_ref, src_ref, out_ref,
                         chunk_ref, acc, sem):
    """Lane-major fused resampling gather: the packed matrix is [R, N] with
    particles on LANES (the native time-major packing) and two extra sublane
    rows carrying the cumulative-hit-count bracket ``[F_prev, F)`` per
    source particle. The one-hot select is built directly from the
    staircase condition ``F_prev[s] <= j < F[s]`` with output slots j on
    sublanes and source lanes s on lanes — a pure broadcast compare, no
    counting phase, no transposes anywhere. Each grid step emits a [R, B]
    output block; the gathered row-index row doubles as the parents."""
    i = pl.program_id(0)
    lo = bases_ref[i, 0]
    hi = bases_ref[i, 1]
    # start the sweep at a 128-lane (tile-lane) boundary, not a full
    # chunk boundary: HBM lane tiling is 128, so the DMA stays tile-aligned
    # while the average number of swept chunks per block drops (~2 -> ~1.3
    # for resampling-shaped ranges)
    lo_al = (lo // 128) * 128
    n_chunks = (hi - lo_al) // _SL + 1
    r8 = out_ref.shape[0]
    rfp = r8 - 2  # F_prev row; F row is r8-1

    j_col = i * _BL + jax.lax.broadcasted_iota(jnp.int32, (_BL, 1), 0)

    acc[:] = jnp.zeros_like(acc)

    def dma(c, buf):
        return pltpu.make_async_copy(
            src_ref.at[:, pl.ds(lo_al + c * _SL, _SL)],
            chunk_ref.at[buf, :r8], sem.at[buf])

    dma(0, 0).start()

    def chunk_body(c, _):
        cur = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            dma(c + 1, 1 - cur).start()

        dma(c, cur).wait()
        vals = chunk_ref[cur]                     # [R, S]
        fp = vals[rfp, :][None, :]                # [1, S]
        fc = vals[rfp + 1, :][None, :]
        onehot = jnp.logical_and(fp <= j_col, j_col < fc).astype(jnp.int8)
        _lane_kernel_body(vals, onehot, acc)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
    out_ref[:] = _lane_kernel_out(acc, chunk_ref.shape[1], out_ref.shape[0])


def _kernel_stairs_lanes_u(bases_ref, u_ref, src_ref, out_ref,
                           chunk_ref, acc, sem):
    """Float-bracket variant of :func:`_kernel_stairs_lanes` for multinomial
    resampling: the two appended sublane rows carry the *cumulative weights*
    ``(c_prev, c]`` per source particle (f32 bitcast into the int32 matrix)
    and each output slot j carries its sorted uniform ``u_j`` (block-sliced
    VMEM operand). The one-hot select is the inverse-CDF condition
    ``c_prev[s] < u_j <= c[s]`` directly — no merged count array F ever
    exists, so the XLA-side scatter that dominated the sort-free multinomial
    formulation (measured 1.07 ms of the 1.87 ms total at N=100K) is gone
    entirely."""
    i = pl.program_id(0)
    lo = bases_ref[i, 0]
    hi = bases_ref[i, 1]
    # start the sweep at a 128-lane (tile-lane) boundary, not a full
    # chunk boundary: HBM lane tiling is 128, so the DMA stays tile-aligned
    # while the average number of swept chunks per block drops (~2 -> ~1.3
    # for resampling-shaped ranges)
    lo_al = (lo // 128) * 128
    n_chunks = (hi - lo_al) // _SL + 1
    r8 = out_ref.shape[0]
    rcp = r8 - 2  # c_prev row; c row is r8-1

    u_col = u_ref[...].astype(jnp.float32)        # [B, 1]

    acc[:] = jnp.zeros_like(acc)

    def dma(c, buf):
        return pltpu.make_async_copy(
            src_ref.at[:, pl.ds(lo_al + c * _SL, _SL)],
            chunk_ref.at[buf, :r8], sem.at[buf])

    dma(0, 0).start()

    def chunk_body(c, _):
        cur = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            dma(c + 1, 1 - cur).start()

        dma(c, cur).wait()
        vals = chunk_ref[cur]                     # [R, S]
        cp = jax.lax.bitcast_convert_type(vals[rcp, :], jnp.float32)[None, :]
        cc = jax.lax.bitcast_convert_type(vals[rcp + 1, :],
                                          jnp.float32)[None, :]
        onehot = jnp.logical_and(cp < u_col, u_col <= cc).astype(jnp.int8)
        _lane_kernel_body(vals, onehot, acc)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
    out_ref[:] = _lane_kernel_out(acc, chunk_ref.shape[1], out_ref.shape[0])


def _kernel_clustered_lanes(parents_ref, src_ref, out_ref,
                            chunk_ref, acc, sem):
    """Lane-major clustered gather from explicit non-decreasing parents:
    like :func:`_kernel_stairs_lanes` but the one-hot is an equality match
    against this block's parent indices (block-indexed VMEM operand)."""
    pvec = parents_ref[:, 0]                      # [B]
    lo = jnp.min(pvec)
    hi = jnp.max(pvec)
    # start the sweep at a 128-lane (tile-lane) boundary, not a full
    # chunk boundary: HBM lane tiling is 128, so the DMA stays tile-aligned
    # while the average number of swept chunks per block drops (~2 -> ~1.3
    # for resampling-shaped ranges)
    lo_al = (lo // 128) * 128
    n_chunks = (hi - lo_al) // _SL + 1
    p_col = pvec[:, None]                         # [B, 1]
    r8 = out_ref.shape[0]

    acc[:] = jnp.zeros_like(acc)

    def dma(c, buf):
        return pltpu.make_async_copy(
            src_ref.at[:, pl.ds(lo_al + c * _SL, _SL)],
            chunk_ref.at[buf, :r8], sem.at[buf])

    dma(0, 0).start()

    def chunk_body(c, _):
        cur = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            dma(c + 1, 1 - cur).start()

        dma(c, cur).wait()
        vals = chunk_ref[cur]                     # [R, S]
        base = lo_al + c * _SL
        lane = base + jax.lax.broadcasted_iota(jnp.int32, (1, _SL), 1)
        onehot = (p_col == lane).astype(jnp.int8)  # [B, S]
        _lane_kernel_body(vals, onehot, acc)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
    out_ref[:] = _lane_kernel_out(acc, chunk_ref.shape[1], out_ref.shape[0])


def _pad_lanes(mat, n_pad, fill=0):
    n = mat.shape[1]
    if n_pad == n:
        return mat
    return jnp.pad(mat, ((0, 0), (0, n_pad - n)), constant_values=fill)


def _make_pack_kernel(n_pieces: int, fill_rows: int, blk: int):
    """Kernel assembling the gather matrix block [r8, blk] from per-leaf
    row pieces + an in-kernel index row + zero fill + the two bracket rows.
    Every write is a full aligned VMEM->HBM block, so the assembly runs at
    copy speed — the XLA ``concatenate`` it replaces pays an 8-sublane
    tile read-modify-write per sub-8-row piece (measured 1.8 ms vs 0.55 ms
    for a same-size plain copy at N=1M)."""
    def kern(*refs):
        pieces, (br_ref, out_ref) = refs[:n_pieces], refs[n_pieces:]
        i = pl.program_id(0)
        idx_row = i * blk + jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
        blocks = [p[...] for p in pieces]
        blocks.append(idx_row)
        if fill_rows:
            blocks.append(jnp.zeros((fill_rows, blk), jnp.int32))
        blocks.append(br_ref[...])
        out_ref[...] = jnp.concatenate(blocks, axis=0)
    return kern


def _pack_mat(pieces, brackets, r8: int, n_pad: int,
              interpret: bool = False):
    """Assemble the lane-major gather matrix [r8, >=n_pad] directly from
    the unpadded per-leaf row blocks (``pieces``: [w_i, n] int32, read
    in place — no XLA concat/pad copies) plus the pre-padded bracket rows
    (``brackets``: [2, >=n_pad]; lanes beyond n MUST carry an
    empty/never-matching bracket, making the garbage data lanes of the
    edge blocks inert). The row-index row (parents source) is generated
    in-kernel. Returns ``mat [r8, n_pad2]``."""
    n = pieces[0].shape[1]
    blk = 2048 if n_pad >= 2048 else n_pad
    n_pad2 = -(-n_pad // blk) * blk
    if brackets.shape[1] < n_pad2:
        brackets = jnp.pad(brackets,
                           ((0, 0), (0, n_pad2 - brackets.shape[1])),
                           mode="edge")
    d1 = sum(p.shape[0] for p in pieces) + 1
    fill = r8 - d1 - 2
    kern = _make_pack_kernel(len(pieces), fill, blk)
    # the pieces are [w, n] with n < n_pad2: clamp their block index so no
    # grid step maps to a FULLY out-of-bounds input block (a wholly-OOB
    # block DMA faults the TPU worker; a partial edge block is fine). The
    # duplicated tail lanes this reads are inert — the bracket rows (full
    # n_pad2, in-bounds) carry never-matching brackets beyond n.
    last_ok = max((n - 1) // blk, 0)
    piece_idx = lambda i: (0, jnp.minimum(i, last_ok))
    in_specs = ([pl.BlockSpec((p.shape[0], blk), piece_idx)
                 for p in pieces]
                + [pl.BlockSpec((2, blk), lambda i: (0, i))])
    mat = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((r8, n_pad2), jnp.int32),
        grid=(n_pad2 // blk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((r8, blk), lambda i: (0, i)),
        interpret=interpret,
    )(*pieces, brackets)
    return mat, d1


@functools.partial(jax.jit,
                   static_argnames=("interpret", "has_index_row", "n_out"))
def resample_gather_rows(big, F, has_index_row: bool = False,
                         interpret: bool = False, n_out: int | None = None):
    """Fused resampling gather for a lane-dense [D, N] packed matrix
    (particles on lanes — the native time-major trace packing) from
    cumulative hit counts ``F`` (int32 [N], nondecreasing, ``F[-1] ==
    n_out``; output slot j takes parent ``p_j = #{i : F_i <= j}``). Returns
    ``(out [D, n_out] lane-dense, parents [n_out])`` with no transposes on
    either side: the staircase one-hot is built in-kernel from two appended
    bracket sublane rows, and the parents come from a gathered row-index
    row. ``n_out`` defaults to N (resampling); pass a different static
    value for resizing. Falls back to the [N, D] row-oriented kernel (via
    one transpose) when D exceeds the lane-kernel VMEM budget.

    ``big`` may also be a LIST of unpadded [w_i, N] int32 row blocks (the
    per-leaf pieces from ``smc.resample._pack_rows``): the matrix is then
    assembled by the Pallas pack kernel reading the pieces in place —
    no XLA concat/pad copies anywhere (``has_index_row`` is implied; the
    index row is generated in-kernel)."""
    pieces = list(big) if isinstance(big, (list, tuple)) else None
    if pieces is not None:
        n = pieces[0].shape[1]
        d1 = sum(p.shape[0] for p in pieces) + 1
    else:
        d_in, n = big.shape
        assert big.dtype == jnp.int32
        if not has_index_row:
            big = jnp.concatenate(
                [big, jnp.arange(n, dtype=jnp.int32)[None, :]], axis=0)
        d1 = big.shape[0]      # data rows + row-index row
    m = n if n_out is None else n_out
    if d1 > 1022:              # acc VMEM cap; route through the row kernel
        assert m == n, "resize with >1022 packed rows is unsupported"
        if pieces is not None:
            big = jnp.concatenate(
                pieces + [jnp.arange(n, dtype=jnp.int32)[None, :]], axis=0)
        outT, parents = resample_gather_transposed(
            big.T, F, interpret=interpret, has_index_col=True)
        return outT[:d1 - 1], parents
    r8 = -(-(d1 + 2) // 8) * 8
    m_pad = -(-m // _BL) * _BL
    n_pad = -(-n // _SL) * _SL + 2 * _SL
    # bracket rows, lane-padded up front ([N]-vector ops are cheap —
    # padded source lanes get an empty bracket [m, m) -> never match)
    f_prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), F[:-1],
                              jnp.full((n_pad - n,), m, jnp.int32)])
    F_row = jnp.concatenate([F, jnp.full((n_pad - n,), m, jnp.int32)])
    brackets = jnp.stack([f_prev, F_row], axis=0)
    if pieces is not None:
        mat, _ = _pack_mat(pieces, brackets, r8, n_pad,
                           interpret=interpret)
    else:
        mat = jnp.concatenate([
            _pad_lanes(big, n_pad),
            jnp.zeros((r8 - d1 - 2, n_pad), jnp.int32),
            brackets], axis=0)

    bases = _bases_F(F, m, n)

    out = pl.pallas_call(
        _kernel_stairs_lanes,
        out_shape=jax.ShapeDtypeStruct((r8, m_pad), jnp.int32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m_pad // _BL,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
            out_specs=pl.BlockSpec((r8, _BL), lambda i, bases: (0, i)),
            scratch_shapes=[
                pltpu.VMEM((2, _r32(r8), _SL), jnp.int32),
                pltpu.VMEM((4 * _r32(r8), _BL), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        interpret=interpret,
    )(bases, mat)
    parents = out[d1 - 1, :m]
    return out[:d1 - 1, :m], parents


@functools.partial(jax.jit, static_argnames=("interpret", "has_index_row"))
def resample_gather_rows_u(big, c, u, has_index_row: bool = False,
                           interpret: bool = False):
    """Fused multinomial resampling gather from float brackets: output slot
    j takes parent ``p_j`` = the unique s with ``c[s-1] < u[j] <= c[s]``
    (inverse CDF of the normalized cumulative weights ``c`` [N] f32,
    ``c[-1] == 1``, at the ascending sorted uniforms ``u`` [N] f32 in
    (0, 1)). Returns ``(out [D, N] lane-dense, parents [N])``.

    Equivalent to ``resample_gather_rows(big, F)`` with
    ``F_i = #{j : u_j <= c_i}`` — but F is never materialized, eliminating
    the bitonic merge AND the XLA scatter that extracted F from it. Exact
    tie semantics: ``u == c`` lands on the first s with ``c[s] >= u``,
    matching the merge formulation's side='right' counting bit-for-bit.
    The output count ``m = len(u)`` may differ from the source count N
    (resizing). Requires D+1 <= 1022 (callers route larger packs through
    the F path).
    """
    pieces = list(big) if isinstance(big, (list, tuple)) else None
    if pieces is not None:
        n = pieces[0].shape[1]
        d1 = sum(p.shape[0] for p in pieces) + 1
    else:
        d_in, n = big.shape
        assert big.dtype == jnp.int32
        if not has_index_row:
            big = jnp.concatenate(
                [big, jnp.arange(n, dtype=jnp.int32)[None, :]], axis=0)
        d1 = big.shape[0]
    m = u.shape[0]
    assert d1 <= 1022, d1
    r8 = -(-(d1 + 2) // 8) * 8
    m_pad = -(-m // _BL) * _BL
    n_pad = -(-n // _SL) * _SL + 2 * _SL
    c = c.astype(jnp.float32)
    asi = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
    # bracket rows, lane-padded up front: padded source lanes get an empty
    # bracket (2, 2] -> never match any u<1; the LAST real source's upper
    # edge is widened from c[-1] to 2.0 as a catch-all so every real query
    # u in (c_prev[n-1], 2.0] matches SOME bracket even if roundoff (or a
    # degenerate direct-caller c) leaves c[-1] < max(u) — otherwise a
    # matchless query emits the un-debiased 0x80808080 byte pattern as
    # both data and parent. Brackets stay disjoint (only the last upper
    # edge moves), and the 3.0 padding queries still match nothing (they
    # are sliced off).
    pad2 = jnp.full((n_pad - n,), 2.0, jnp.float32)
    c_prev = jnp.concatenate([jnp.zeros((1,), jnp.float32), c[:-1], pad2])
    c_row = jnp.concatenate([c[:-1], jnp.full((1,), 2.0, jnp.float32),
                             pad2])
    brackets = jnp.stack([asi(c_prev), asi(c_row)], axis=0)
    if pieces is not None:
        mat, _ = _pack_mat(pieces, brackets, r8, n_pad,
                           interpret=interpret)
    else:
        mat = jnp.concatenate([
            _pad_lanes(big, n_pad),
            jnp.zeros((r8 - d1 - 2, n_pad), jnp.int32),
            brackets], axis=0)

    # enforce the documented u-in-(0,1] contract: an exact-zero query would
    # match no bracket (condition is strictly c_prev < u) even with the
    # catch-all edge below, emitting corrupt 0x80808080 output
    up = jnp.maximum(u.astype(jnp.float32), 1e-37)
    if m_pad != m:
        # padded output slots match no bracket (u=3 > every c) -> zeros out
        up = jnp.concatenate([up, jnp.full((m_pad - m,), 3.0, jnp.float32)])

    # per-block source bounds: parent of output j is #{c < u_j} (clamped)
    bases = _bases_u(c, up, m, n)
    nb = m_pad // _BL

    out = pl.pallas_call(
        _kernel_stairs_lanes_u,
        out_shape=jax.ShapeDtypeStruct((r8, m_pad), jnp.int32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((_BL, 1), lambda i, bases: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            ],
            out_specs=pl.BlockSpec((r8, _BL), lambda i, bases: (0, i)),
            scratch_shapes=[
                pltpu.VMEM((2, _r32(r8), _SL), jnp.int32),
                pltpu.VMEM((4 * _r32(r8), _BL), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        interpret=interpret,
    )(bases, up.reshape(m_pad, 1), mat)
    parents = out[d1 - 1, :m]
    return out[:d1 - 1, :m], parents


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows_clustered(big, parents, interpret: bool = False):
    """In-lane clustered gather for a lane-dense [D, N] packed matrix:
    ``out[:, j] = big[:, parents[j]]`` for non-decreasing int32 parents.
    No transposes on either side (see :func:`resample_gather_rows`)."""
    d, n = big.shape
    assert big.dtype == jnp.int32
    m = parents.shape[0]
    if d > 1022:
        return gather_transposed_clustered(big.T, parents,
                                           interpret=interpret)
    r8 = -(-d // 8) * 8
    m_pad = -(-m // _BL) * _BL
    n_pad = -(-n // _SL) * _SL + 2 * _SL
    mat = jnp.concatenate([big, jnp.zeros((r8 - d, n), jnp.int32)], axis=0)
    mat = _pad_lanes(mat, n_pad)
    par = parents.astype(jnp.int32)
    if m_pad != m:
        par = jnp.concatenate([par, jnp.broadcast_to(par[-1], (m_pad - m,))])

    out = pl.pallas_call(
        _kernel_clustered_lanes,
        out_shape=jax.ShapeDtypeStruct((r8, m_pad), jnp.int32),
        grid=(m_pad // _BL,),
        in_specs=[
            pl.BlockSpec((_BL, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((r8, _BL), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, _r32(r8), _SL), jnp.int32),
            pltpu.VMEM((4 * _r32(r8), _BL), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(par.reshape(m_pad, 1), mat)
    return out[:d, :m]

# ---------------------------------------------------------------------------
# Pack-free split-output staircase kernels: pieces in, pieces out
# ---------------------------------------------------------------------------

def _make_stairs_split_kernel(meta, is_float):
    """Staircase resampling gather with NO pack pass on either side: the
    8-row-aligned HEAD of every per-leaf row piece is DMA'd chunkwise
    STRAIGHT from its own HBM buffer into the chunk scratch at a static
    aligned row offset (Mosaic requires partial sublane DMA slices aligned
    to the 8-row tile), the sub-8-row RAGGED TAILS plus a lane-index row
    (the parents source) plus the bracket rows ride ONE small
    XLA-assembled aux operand DMA'd to an aligned offset, and each piece
    gets its OWN output buffer — so the gathered matrix needs no post-slicing either (the
    round-5 packed trace storage makes the trace ONE piece; its output
    here IS the new storage matrix).

    Edge handling: chunk c's semantic lane range is
    ``[lo_al + c*S, lo_al + (c+1)*S)`` but the DMA offset is clamped to
    ``min(base, n128 - S)`` so no read passes the 128-lane-padded physical
    end of a piece (a fully OOB manual DMA faults the TPU worker; padding
    lanes get never-matching brackets); a ``lane >= base`` mask keeps
    shifted chunks from matching a lane twice. Requires n >= S (the
    per-path chunk width from meta: 512 on this small-n kernel so pieces
    down to n=600 stay DMA-able, _SL on the slab kernel); in
    interpret mode the driver lane-pads pieces to n128 so the emulated
    dynamic_slice clamping agrees with hardware."""
    (n_pieces, heads, tails, A, aux8, rt, d_rec, r32, n128, _SL) = meta
    idx_row = A + rt       # lane-index row; brackets follow it
    brk0 = A + rt + 1

    def kern(*refs):
        if is_float:
            bases_ref, u_ref = refs[0], refs[1]
            aux_ref = refs[2]
            pieces = refs[3:3 + n_pieces]
            rest = refs[3 + n_pieces:]
        else:
            bases_ref = refs[0]
            aux_ref = refs[1]
            pieces = refs[2:2 + n_pieces]
            rest = refs[2 + n_pieces:]
        outs = rest[:n_pieces]
        parents_ref = rest[n_pieces]
        chunk_ref, acc, sem = rest[n_pieces + 1:]

        i = pl.program_id(0)
        lo = bases_ref[i, 0]
        hi = bases_ref[i, 1]
        lo_al = (lo // 128) * 128
        n_chunks = (hi - lo_al) // _SL + 1
        max_rb = max(n128 - _SL, 0)

        if is_float:
            u_col = u_ref[...].astype(jnp.float32)      # [B, 1]
        else:
            j_col = i * _BL + jax.lax.broadcasted_iota(
                jnp.int32, (_BL, 1), 0)

        acc[:] = jnp.zeros_like(acc)

        def rb_of(c):
            base = lo_al + c * _SL
            # the //128*128 is a no-op (both operands are 128-aligned) but
            # lets Mosaic PROVE the HBM lane offset divisible by the tiling
            return base, (jnp.minimum(base, max_rb) // 128) * 128

        def dmas(c, buf):
            _, rb = rb_of(c)
            cps = []
            k = 0
            for (p_idx, off, hw) in heads:
                cps.append(pltpu.make_async_copy(
                    pieces[p_idx].at[:hw, pl.ds(rb, _SL)],
                    chunk_ref.at[buf, off:off + hw], sem.at[buf, k]))
                k += 1
            cps.append(pltpu.make_async_copy(
                aux_ref.at[:, pl.ds(rb, _SL)],
                chunk_ref.at[buf, A:A + aux8], sem.at[buf, k]))
            return cps

        for cp in dmas(0, 0):
            cp.start()

        def chunk_body(c, _):
            cur = jax.lax.rem(c, 2)

            @pl.when(c + 1 < n_chunks)
            def _():
                for cp in dmas(c + 1, 1 - cur):
                    cp.start()

            for cp in dmas(c, cur):
                cp.wait()
            base, rb = rb_of(c)
            lane = rb + jax.lax.broadcasted_iota(jnp.int32, (1, _SL), 1)
            # shifted-edge-chunk dedup (never match a lane already covered
            # by the previous chunk) folded into the [1, S] bracket row —
            # one lane-row select instead of an extra [B, S] AND pass
            shifted = lane >= base
            if is_float:
                cp_row = jax.lax.bitcast_convert_type(
                    chunk_ref[cur, brk0, :], jnp.float32)[None, :]
                cc_row = jax.lax.bitcast_convert_type(
                    chunk_ref[cur, brk0 + 1, :], jnp.float32)[None, :]
                cp_row = jnp.where(shifted, cp_row, jnp.float32(jnp.inf))
                onehot = jnp.logical_and(cp_row < u_col,
                                         u_col <= cc_row).astype(jnp.int8)
            else:
                fp = chunk_ref[cur, brk0, :][None, :]
                fc = chunk_ref[cur, brk0 + 1, :][None, :]
                fp = jnp.where(shifted, fp, jnp.int32(0x7FFFFFFF))
                onehot = jnp.logical_and(fp <= j_col,
                                         j_col < fc).astype(jnp.int8)
            _lane_kernel_body(chunk_ref[cur], onehot, acc)
            return 0

        jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
        full = _lane_kernel_out(acc, r32, d_rec)
        for out_ref, (ho, hw, toff, tw) in zip(outs, tails):
            parts = []
            if hw:
                parts.append(full[ho:ho + hw, :])
            if tw:
                parts.append(full[A + toff:A + toff + tw, :])
            out_ref[...] = (parts[0] if len(parts) == 1
                            else jnp.concatenate(parts, axis=0))
        parents_ref[...] = full[idx_row:idx_row + 1, :]
    return kern


_SLAB = 1024   # lanes per block-level slab DMA (slab kernel variant)


def _make_stairs_slab_kernel(meta, is_float, nb):
    """Slab variant of the split kernel: per OUTPUT BLOCK, one slab DMA of
    ``_SLAB`` lanes per input (double-buffered ACROSS grid steps — block
    i+1's slab loads while block i computes), statically-unrolled
    sub-chunk matmuls sliced from VMEM, and a rare residual chunk loop for
    weight-skewed blocks whose parent range overflows the slab. This
    amortizes the per-chunk DMA issue/wait cost that dominates the v1
    kernel at large N (measured ~2.6 ms of a 4.1 ms 42-row gather at
    N=1M with near-uniform weights). Out-of-range lanes are inert by
    construction — their brackets cannot match this block's outputs — so
    slab over-coverage is pure (small) extra matmul work, never a
    correctness concern."""
    (n_pieces, heads, tails, A, aux8, rt, d_rec, r32, n128, _SL) = meta
    idx_row = A + rt
    brk0 = A + rt + 1
    NSUB = _SLAB // _SL
    H = len(heads)

    def kern(*refs):
        if is_float:
            bases_ref, u_ref = refs[0], refs[1]
            aux_ref = refs[2]
            pieces = refs[3:3 + n_pieces]
            rest = refs[3 + n_pieces:]
        else:
            bases_ref = refs[0]
            aux_ref = refs[1]
            pieces = refs[2:2 + n_pieces]
            rest = refs[2 + n_pieces:]
        outs = rest[:n_pieces]
        parents_ref = rest[n_pieces]
        slab_ref, chunk_ref, acc, sem_s, sem_c = rest[n_pieces + 1:]

        i = pl.program_id(0)
        lo = bases_ref[i, 0]
        hi = bases_ref[i, 1]

        def rb0_of(blk):
            lo_al = (bases_ref[blk, 0] // 128) * 128
            return (jnp.minimum(lo_al, n128 - _SLAB) // 128) * 128

        def slab_dmas(blk, buf):
            rb = rb0_of(blk)
            cps = []
            k = 0
            for (p_idx, off, hw) in heads:
                cps.append(pltpu.make_async_copy(
                    pieces[p_idx].at[:hw, pl.ds(rb, _SLAB)],
                    slab_ref.at[buf, off:off + hw], sem_s.at[buf, k]))
                k += 1
            cps.append(pltpu.make_async_copy(
                aux_ref.at[:, pl.ds(rb, _SLAB)],
                slab_ref.at[buf, A:A + aux8], sem_s.at[buf, k]))
            return cps

        cur = jax.lax.rem(i, 2)

        @pl.when(i == 0)
        def _():
            for cp in slab_dmas(0, 0):
                cp.start()

        @pl.when(i + 1 < nb)
        def _():
            for cp in slab_dmas(i + 1, 1 - cur):
                cp.start()

        if is_float:
            u_col = u_ref[...].astype(jnp.float32)      # [B, 1]
        else:
            j_col = i * _BL + jax.lax.broadcasted_iota(
                jnp.int32, (_BL, 1), 0)

        acc[:] = jnp.zeros_like(acc)
        for cp in slab_dmas(i, cur):
            cp.wait()

        rb0 = rb0_of(i)

        def select_body(vals, lane, premask_base):
            """One [*, S] sub-chunk: build the one-hot from the bracket
            rows (with optional shifted-coverage premask) + accumulate."""
            if is_float:
                cp_row = jax.lax.bitcast_convert_type(
                    vals[brk0, :], jnp.float32)[None, :]
                cc_row = jax.lax.bitcast_convert_type(
                    vals[brk0 + 1, :], jnp.float32)[None, :]
                if premask_base is not None:
                    cp_row = jnp.where(lane >= premask_base, cp_row,
                                       jnp.float32(jnp.inf))
                onehot = jnp.logical_and(cp_row < u_col,
                                         u_col <= cc_row).astype(jnp.int8)
            else:
                fp = vals[brk0, :][None, :]
                fc = vals[brk0 + 1, :][None, :]
                if premask_base is not None:
                    fp = jnp.where(lane >= premask_base, fp,
                                   jnp.int32(0x7FFFFFFF))
                onehot = jnp.logical_and(fp <= j_col,
                                         j_col < fc).astype(jnp.int8)
            _lane_kernel_body(vals, onehot, acc)

        # statically-unrolled slab sub-chunks (disjoint lanes, no premask)
        for k in range(NSUB):
            vals = slab_ref[cur, :, k * _SL:(k + 1) * _SL]
            lane = (rb0 + k * _SL
                    + jax.lax.broadcasted_iota(jnp.int32, (1, _SL), 1))
            select_body(vals, lane, None)

        # residual chunks for ranges overflowing the slab (rare)
        n_res = jnp.maximum(0, (hi - rb0) // _SL + 1 - NSUB)
        max_rb = max(n128 - _SL, 0)

        @pl.when(n_res > 0)
        def _():
            def res_body(c, _):
                base = rb0 + (NSUB + c) * _SL
                rc = (jnp.minimum(base, max_rb) // 128) * 128
                cps = []
                k = 0
                for (p_idx, off, hw) in heads:
                    cps.append(pltpu.make_async_copy(
                        pieces[p_idx].at[:hw, pl.ds(rc, _SL)],
                        chunk_ref.at[0, off:off + hw], sem_c.at[k]))
                    k += 1
                cps.append(pltpu.make_async_copy(
                    aux_ref.at[:, pl.ds(rc, _SL)],
                    chunk_ref.at[0, A:A + aux8], sem_c.at[k]))
                for cp in cps:
                    cp.start()
                for cp in cps:
                    cp.wait()
                lane = rc + jax.lax.broadcasted_iota(jnp.int32, (1, _SL), 1)
                select_body(chunk_ref[0], lane, base)
                return 0

            jax.lax.fori_loop(0, n_res, res_body, 0)

        full = _lane_kernel_out(acc, r32, d_rec)
        for out_ref, (ho, hw, toff, tw) in zip(outs, tails):
            parts = []
            if hw:
                parts.append(full[ho:ho + hw, :])
            if tw:
                parts.append(full[A + toff:A + toff + tw, :])
            out_ref[...] = (parts[0] if len(parts) == 1
                            else jnp.concatenate(parts, axis=0))
        parents_ref[...] = full[idx_row:idx_row + 1, :]
    return kern


def _stairs_split_call(pieces, brackets, bases, u, m, interpret):
    """Shared driver for the split kernels: returns (outs, parents).
    ``brackets``: [2, n_pad] int32 (bit patterns)."""
    n = pieces[0].shape[1] if pieces else brackets.shape[1]
    n128 = -(-n // 128) * 128
    if interpret and n128 != n:
        # hardware DMAs may read the physical 128-lane tile padding; the
        # interpreter's dynamic_slice would CLAMP instead — pad explicitly
        # so both worlds read the same lanes
        pieces = [jnp.pad(p_, ((0, 0), (0, n128 - n))) for p_ in pieces]
    widths = tuple(p.shape[0] for p in pieces)
    # chunk-buffer layout: 8-aligned piece heads first, then ONE aux block
    # holding the ragged tails + the two bracket rows (8-row padded)
    heads = []       # (piece_idx, chunk_off, head_rows)
    tails = []       # per piece: (head_off, head_rows, tail_off, tail_rows)
    tail_srcs = []
    A = 0
    rt = 0
    for idx, w in enumerate(widths):
        hw = (w // 8) * 8
        tw = w - hw
        ho = A
        if hw:
            heads.append((idx, A, hw))
            A += hw
        toff = rt
        if tw:
            tail_srcs.append(pieces[idx][hw:])
            rt += tw
        tails.append((ho, hw, toff, tw))
    # aux rows: ragged tails, then the lane-index row (the parents come
    # out of the byteplane matmul exactly like any data row — int32-exact
    # for any n), then the brackets, padded to 8
    aux8 = -(-(rt + 3) // 8) * 8
    n_pad = brackets.shape[1]
    aux_parts = [jnp.pad(t, ((0, 0), (0, n_pad - t.shape[1])))
                 for t in tail_srcs]
    aux_parts.append(jnp.arange(n_pad, dtype=jnp.int32)[None, :])
    aux_parts.append(brackets)
    pad_rows = aux8 - rt - 3
    if pad_rows:
        aux_parts.append(jnp.zeros((pad_rows, n_pad), jnp.int32))
    aux = jnp.concatenate(aux_parts, axis=0)

    d_rec = A + rt + 1         # rows the recombine must produce
    r32 = _r32(max(A + aux8, 8))
    m_pad = -(-m // _BL) * _BL
    is_float = u is not None
    use_slab = n128 >= _SLAB
    # chunk lane width: _SL on the slab kernel (fewer, bigger sub-chunk
    # matmuls); 512 on the small-n kernel so pieces narrower than _SL
    # (n128 >= 640 after tile padding) stay DMA-able in place
    S = _SL if use_slab else min(_SL, 512)
    meta = (len(pieces), tuple(heads), tuple(tails), A, aux8, rt,
            max(d_rec, 1), r32, n128, S)
    if use_slab:
        kern = _make_stairs_slab_kernel(meta, is_float, m_pad // _BL)
    else:
        kern = _make_stairs_split_kernel(meta, is_float)
    # outputs are [w, m] (NOT m_pad): Mosaic masks the final partial
    # lane block's stores, which saves XLA a full [Σw, m] copy just to
    # drop the padding (measured 24.5 µs per resample at N=100K). The
    # interpreter CLAMPS the final block's store offset instead of
    # masking (it would overwrite earlier lanes), so interpret mode keeps
    # the padded outputs + the explicit slice.
    m_out = m_pad if interpret else m
    out_shape = ([jax.ShapeDtypeStruct((w, m_out), jnp.int32)
                  for w in widths]
                 + [jax.ShapeDtypeStruct((1, m_out), jnp.int32)])
    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    in_specs = ([pl.BlockSpec((_BL, 1), lambda i, bases: (i, 0),
                              memory_space=pltpu.VMEM)] if is_float else [])
    in_specs += [hbm] * (1 + len(pieces))
    out_specs = ([pl.BlockSpec((w, _BL), lambda i, bases: (0, i))
                  for w in widths]
                 + [pl.BlockSpec((1, _BL), lambda i, bases: (0, i))])
    args = ([u.reshape(m_pad, 1)] if is_float else []) + [aux] + list(pieces)
    outs = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(m_pad // _BL,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=(
                [pltpu.VMEM((2, r32, _SLAB), jnp.int32),
                 pltpu.VMEM((1, r32, S), jnp.int32),
                 pltpu.VMEM((4 * r32, _BL), jnp.int32),
                 pltpu.SemaphoreType.DMA((2, len(heads) + 1)),
                 pltpu.SemaphoreType.DMA((len(heads) + 1,))]
                if use_slab else
                [pltpu.VMEM((2, r32, S), jnp.int32),
                 pltpu.VMEM((4 * r32, _BL), jnp.int32),
                 pltpu.SemaphoreType.DMA((2, len(heads) + 1))]),
        ),
        interpret=interpret,
    )(bases, *args)
    parents = outs[-1][0, :m]
    return [o_[:, :m] for o_ in outs[:-1]], parents


@functools.partial(jax.jit, static_argnames=("interpret", "n_out"))
def resample_gather_split(pieces, F, n_out: int | None = None,
                          interpret: bool = False):
    """Pack-free fused resampling gather from cumulative hit counts ``F``
    (semantics of :func:`resample_gather_rows`) reading the unpadded
    [w_i, N] pieces in place and emitting one gathered [w_i, n_out] output
    PER PIECE plus the parents — no packed matrix on either side. Pieces
    must all share N >= 2*_SL (callers route smaller inputs through the
    packing path)."""
    pieces = list(pieces)
    n = F.shape[0]
    m = n if n_out is None else n_out
    n_pad = -(-n // _SL) * _SL + 2 * _SL
    f_prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), F[:-1],
                              jnp.full((n_pad - n,), m, jnp.int32)])
    F_row = jnp.concatenate([F, jnp.full((n_pad - n,), m, jnp.int32)])
    aux = jnp.stack([f_prev, F_row], axis=0)

    bases = _bases_F(F, m, n)
    return _stairs_split_call(pieces, aux, bases, None, m, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def resample_gather_split_u(pieces, c, u, interpret: bool = False):
    """Float-bracket (multinomial) variant of :func:`resample_gather_split`
    (semantics of :func:`resample_gather_rows_u`)."""
    pieces = list(pieces)
    n = c.shape[0]
    m = u.shape[0]
    n_pad = -(-n // _SL) * _SL + 2 * _SL
    c = c.astype(jnp.float32)
    asi = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
    pad2 = jnp.full((n_pad - n,), 2.0, jnp.float32)
    c_prev = jnp.concatenate([jnp.zeros((1,), jnp.float32), c[:-1], pad2])
    c_row = jnp.concatenate([c[:-1], jnp.full((1,), 2.0, jnp.float32),
                             pad2])
    aux = jnp.stack([asi(c_prev), asi(c_row)], axis=0)

    up = jnp.maximum(u.astype(jnp.float32), 1e-37)
    m_pad = -(-m // _BL) * _BL
    if m_pad != m:
        up = jnp.concatenate([up, jnp.full((m_pad - m,), 3.0, jnp.float32)])
    bases = _bases_u(c, up, m, n)
    return _stairs_split_call(pieces, aux, bases, up, m, interpret)


_B = 512       # output rows (particles) per grid step
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


_CHUNK_P = 256  # packed rows per chunk in the staircase kernel (512 source)


def _kernel_resample_stairs(bases_ref, src_ref, out_ref,
                            chunk_ref, acc0, acc1, acc2, acc3, sem):
    """Staircase variant of the fused resampling gather, for d1 <= 62:
    two source rows share one 128-lane VMEM row (row 2i in lanes [0,64),
    row 2i+1 in lanes [64,128)), and lanes 62/63 (126/127) carry that
    row's cumulative-hit-count bracket ``[F_prev, F)``. The one-hot select
    is built DIRECTLY from the staircase condition ``F_prev[i] <= j < F[i]``
    (output j's parent is row i), so no parent-counting phase and no
    separate F DMAs exist at all; the parents come out of the gathered
    row-index column like any other data. Output sublanes [0,64) hold the
    even-parity gather, [64,128) the odd; a lane-parity select collapses
    them. Each chunk covers 2*_CHUNK_P source rows, halving the one-hot
    MXU work per gathered row vs the unpacked kernel."""
    i = pl.program_id(0)
    lo = bases_ref[i, 0]
    hi = bases_ref[i, 1]
    S2 = 2 * _CHUNK_P
    lo8 = (lo // S2) * S2
    n_chunks = (hi - lo8) // S2 + 1
    # output slots of this block, on lanes
    j_lane = i * _B + jax.lax.broadcasted_iota(jnp.int32, (1, _B), 1)

    for acc in (acc0, acc1, acc2, acc3):
        acc[:] = jnp.zeros_like(acc)

    def dma(c, buf):
        base = lo8 + c * S2
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(base // 2, _CHUNK_P), :],
            chunk_ref.at[buf], sem.at[buf])

    # double-buffered chunk pipeline: the next chunk's DMA runs while the
    # MXU selects from the current one (DMA issue latency was ~half the
    # kernel time at the typical 1-2 chunks per block)
    dma(0, 0).start()

    def chunk_body(c, parity):
        cur = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            dma(c + 1, 1 - cur).start()

        dma(c, cur).wait()
        vals = chunk_ref[cur]
        # staircase match per packed row: even half brackets in lanes 62/63,
        # odd half in 126/127
        m_e = jnp.logical_and(vals[:, 62:63] <= j_lane,
                              j_lane < vals[:, 63:64])    # [S, B]
        m_o = jnp.logical_and(vals[:, 126:127] <= j_lane,
                              j_lane < vals[:, 127:128])
        onehot = jnp.logical_or(m_e, m_o).astype(jnp.int8)
        # int32 carry: Mosaic cannot legalize a bool vector through scf.for
        parity = parity | jnp.any(m_o, axis=0, keepdims=True).astype(jnp.int32)
        for shift, acc in ((0, acc0), (8, acc1), (16, acc2), (24, acc3)):
            # int8 MXU (2x bf16 rate on v5e): bias bytes to [-128,127];
            # each output's one-hot hits exactly once across all chunks,
            # so the exact byte is acc + 128 after the loop
            byte = (jax.lax.bitwise_and(
                jax.lax.shift_right_logical(vals, shift), 0xFF)
                - 128).astype(jnp.int8)
            # contract both dim 0 (chunk rows): [S,128] x [S,B] -> [128,B]
            acc[:] += jax.lax.dot_general(
                byte, onehot, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        return parity

    parity = jax.lax.fori_loop(0, n_chunks, chunk_body,
                               jnp.zeros((1, _B), jnp.int32))
    packed = jnp.zeros((128, _B), jnp.int32)
    for shift, acc in ((0, acc0), (8, acc1), (16, acc2), (24, acc3)):
        byte = jax.lax.bitwise_and(acc[:] + 128, 0xFF)  # undo the int8 bias
        packed = packed | jax.lax.shift_left(byte, shift)
    d_out = out_ref.shape[0]                        # <= 64
    out_ref[:] = jnp.where(parity != 0, packed[64:64 + d_out, :],
                           packed[:d_out, :])


@functools.partial(jax.jit, static_argnames=("interpret", "has_index_col"))
def _resample_gather_packed(matrix, F, interpret: bool = False,
                            has_index_col: bool = False):
    """Packed-pair staircase resampling gather (see
    _kernel_resample_stairs); requires data + row-index columns <= 62."""
    n, d1_in = matrix.shape
    assert matrix.dtype == jnp.int32
    m_pad = -(-n // _B) * _B
    nb = m_pad // _B
    if has_index_col:
        mat = matrix
        d = d1_in - 1
    else:
        mat = jnp.concatenate(
            [matrix, jnp.arange(n, dtype=jnp.int32)[:, None]], axis=1)
        d = d1_in
    d1 = d + 1
    assert d1 <= 62, d1
    d_rows = -(-d1 // 8) * 8
    # rows: even count + chunk slack; cols: data+idx then [F_prev, F) bracket
    # in lanes 62/63 (padded rows get an empty bracket [n, n) -> never match)
    n_pad = -(-n // 16) * 16 + 2 * _CHUNK_P * 2
    f_prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), F[:-1]])
    mat = jnp.pad(mat, ((0, 0), (0, 62 - d1)))
    mat = jnp.concatenate([mat, f_prev[:, None], F[:, None]], axis=1)
    mat = jnp.pad(mat, ((0, n_pad - n), (0, 0)), constant_values=n)
    mat2 = mat.reshape(n_pad // 2, 128)

    grid = jnp.arange(nb + 1, dtype=jnp.int32) * _B
    ss = jnp.searchsorted(F, grid, side="right").astype(jnp.int32)
    bases = jnp.stack([ss[:-1], jnp.minimum(ss[1:], n - 1)], axis=1)

    out = pl.pallas_call(
        _kernel_resample_stairs,
        out_shape=jax.ShapeDtypeStruct((d_rows, m_pad), jnp.int32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            ],
            out_specs=pl.BlockSpec((d_rows, _B), lambda i, bases: (0, i)),
            scratch_shapes=[
                pltpu.VMEM((2, _CHUNK_P, 128), jnp.int32),
                pltpu.VMEM((128, _B), jnp.int32),
                pltpu.VMEM((128, _B), jnp.int32),
                pltpu.VMEM((128, _B), jnp.int32),
                pltpu.VMEM((128, _B), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        interpret=interpret,
    )(bases, mat2)
    parents = out[d, :n]
    return out[:d, :n], parents


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

    When the total column count fits in 62 lanes, dispatches to the
    packed-pair staircase kernel (2 source rows per VMEM row + in-row F
    brackets -> half the MXU work per gathered row and no counting phase).
    """
    n, d1_in = matrix.shape
    if d1_in + (0 if has_index_col else 1) <= 62:
        return _resample_gather_packed(matrix, F, interpret=interpret,
                                       has_index_col=has_index_col)
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
