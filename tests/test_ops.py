"""Pallas kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from genparticlefilters_tpu.ops.sorted_gather import gather_rows_clustered
from genparticlefilters_tpu.ops.fused_gather import gather_transposed_clustered
from genparticlefilters_tpu.ops.gather import gather_rows_pallas


def test_clustered_gather_interpret():
    n, d, m = 2048, 72, 512
    mat = jr.randint(jr.key(0), (n, d), -2**30, 2**30, dtype=jnp.int32)
    parents = jnp.sort(jr.randint(jr.key(1), (m,), 0, n, dtype=jnp.int32))
    out = gather_rows_clustered(mat, parents, interpret=True)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(jnp.take(mat, parents, axis=0)))


def test_clustered_gather_extreme_values():
    # byte-split must be exact for all int32 bit patterns
    n, m = 256, 256
    vals = jnp.array([[0, -1, 2**31 - 1, -2**31, 12345, -12345, 65536,
                       -65536]] * n, jnp.int32)
    parents = jnp.sort(jr.randint(jr.key(1), (m,), 0, n, dtype=jnp.int32))
    out = gather_rows_clustered(vals, parents, interpret=True)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(jnp.take(vals, parents, axis=0)))


def test_clustered_gather_tight_cluster():
    # all parents equal (fully degenerate resampling)
    n, d, m = 1024, 40, 256
    mat = jr.randint(jr.key(0), (n, d), -1000, 1000, dtype=jnp.int32)
    parents = jnp.full((m,), 777, jnp.int32)
    out = gather_rows_clustered(mat, parents, interpret=True)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(jnp.take(mat, parents, axis=0)))


@pytest.mark.parametrize("n,m,d", [
    (2048, 512, 72),     # mixed
    (1000, 1000, 43),    # m not a multiple of 256, d not a multiple of 8
    (256, 256, 128),     # exactly one full tile
])
def test_fused_gather_transposed_interpret(n, m, d):
    mat = jr.randint(jr.key(0), (n, d), -2**30, 2**30, dtype=jnp.int32)
    parents = jnp.sort(jr.randint(jr.key(1), (m,), 0, n, dtype=jnp.int32))
    out = gather_transposed_clustered(mat, parents, interpret=True)
    ref = jnp.take(mat, parents, axis=0).T
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_fused_gather_transposed_degenerate_parents():
    n, m, d = 1024, 512, 32
    mat = jr.randint(jr.key(0), (n, d), -2**31, 2**31 - 1, dtype=jnp.int32)
    parents = jnp.full((m,), 1023, jnp.int32)  # all mass on the last particle
    out = gather_transposed_clustered(mat, parents, interpret=True)
    ref = jnp.take(mat, parents, axis=0).T
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_fused_gather_transposed_extreme_values():
    n, m = 256, 256
    vals = jnp.array([[0, -1, 2**31 - 1, -2**31, 12345, -12345, 65536,
                       -65536]] * n, jnp.int32)
    parents = jnp.sort(jr.randint(jr.key(1), (m,), 0, n, dtype=jnp.int32))
    out = gather_transposed_clustered(vals, parents, interpret=True)
    ref = jnp.take(vals, parents, axis=0).T
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_dma_row_gather_interpret():
    n, d, m = 1024, 64, 256
    mat = jr.normal(jr.key(0), (n, d))
    parents = jr.randint(jr.key(1), (m,), 0, n)
    out = gather_rows_pallas(mat, parents, interpret=True)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(jnp.take(mat, parents, axis=0)))
