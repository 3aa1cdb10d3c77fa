"""VMEM-resident bitonic MERGE for sorted-sequence counting.

``F_i = #{j : u_j <= c_i}`` for two sorted sequences is the core of
sort-free multinomial/residual resampling (smc/resample._merge_count).
The XLA formulation pays ~log2(M) full HBM passes of roll/min/max
(~1.5 ms at N=100K — as slow as a concat sort); here the whole packed
int32 key array (1 MB at N=100K) sits in VMEM and all log2(M) merge
stages run at VPU speed with zero HBM traffic in between.

Layout: the flattened [M] array is viewed as [R, 128] (lane-major).
A compare-exchange at distance d is
- d >= 128: row-aligned — partner row at d/128, a sublane roll;
- d <  128: a lane roll with row carry (flattened roll crosses row
  boundaries every 128 lanes).

Input keys are order-preserving int32 views of positive floats with the
origin tag in the low bit (see smc/resample._merge_count); the sequence
``[c_asc, pad, u_desc]`` is bitonic, so one merge network fully sorts it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["bitonic_merge_sorted", "merge_fits_vmem"]


def merge_fits_vmem(m: int) -> bool:
    """True when the padded array (plus working set) fits the kernel's VMEM
    budget: cap at 2^19 elements (2 MB array). v5e physically has 128 MB of
    VMEM and ``CompilerParams(vmem_limit_bytes=...)`` lifts the 16 MB
    scoped cap, but Mosaic compilation of the fully-unrolled merge network
    hangs beyond ~2^20 elements (measured on v5e: 2^18 compiles in ~2 min,
    2^21 never finishes) — larger arrays take the XLA roll-merge path."""
    return m <= (1 << 19)


def _kernel(z_ref, out_ref, *, stages):
    from jax.experimental import pallas as pl  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu

    z = z_ref[...]
    R, C = z.shape  # C == 128
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)

    for d in stages:  # static unroll: log2(M) stages
        # pltpu.roll requires non-negative shifts: -s on size L == L - s
        if d >= C:
            dr = d // C
            lo = (rows & dr) == 0
            fwd = pltpu.roll(z, shift=R - dr, axis=0)
            bwd = pltpu.roll(z, shift=dr, axis=0)
        else:
            lo = (lanes & d) == 0
            # flattened roll by -d: lane roll, rows carry at the seam
            a = pltpu.roll(z, shift=C - d, axis=1)
            fwd = jnp.where(lanes < C - d, a,
                            pltpu.roll(a, shift=R - 1, axis=0))
            b = pltpu.roll(z, shift=d, axis=1)
            bwd = jnp.where(lanes >= d, b, pltpu.roll(b, shift=1, axis=0))
        z = jnp.where(lo, jnp.minimum(z, fwd), jnp.maximum(z, bwd))
    out_ref[...] = z


@functools.partial(jax.jit, static_argnames=("interpret",))
def bitonic_merge_sorted(z, interpret: bool = False):
    """Fully sort a BITONIC int32 array ``z`` [M] (M a power of two,
    M % 128 == 0) with one in-VMEM merge network. Returns the sorted array.
    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU
    tests)."""
    from jax.experimental import pallas as pl

    (M,) = z.shape
    assert M & (M - 1) == 0 and M % 128 == 0, M
    R = M // 128
    stages = []
    d = M >> 1
    while d >= 1:
        stages.append(d)
        d >>= 1
    from jax.experimental.pallas import tpu as pltpu
    out = pl.pallas_call(
        functools.partial(_kernel, stages=tuple(stages)),
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
        # the whole array + rolled temporaries live in VMEM; v5e has
        # 128 MB physical — lift the compiler's default 16 MB scoped cap
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(z.reshape(R, 128))
    return out.reshape(M)
