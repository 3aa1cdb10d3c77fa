"""HLO-evidence tests for the explicit collective layer (VERDICT r3 #1).

The multi-chip performance story rests on three lowering claims
(docs/parallel.md): block rotation is a one-hop ``collective-permute``,
blockwise (shard-local) resampling emits ZERO cross-device collectives, and
only exact global resampling pays an ``all-gather``. These tests compile
each op over an 8-virtual-device mesh and assert those claims on the
optimized HLO text — plus bit-identical semantics between the shard_map
collective paths and the single-device gather fallbacks.
"""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

import genparticlefilters_tpu as g
from genparticlefilters_tpu.parallel import (
    particle_mesh, shard_state, pf_resample_blockwise, pf_rotate_blocks,
    pf_shuffle_blocks)
from fixtures import line_model, line_choicemap

COLLECTIVES = ("collective-permute", "all-gather", "all-to-all",
               "all-reduce", "reduce-scatter", "collective-broadcast")


def _hlo(fn, *args):
    return jax.jit(fn).lower(*args).compile().as_text()


def _collective_counts(txt):
    return {op: txt.count(f" {op}(") + txt.count(f" {op}-start(")
            for op in COLLECTIVES}


@pytest.fixture(scope="module")
def setup():
    mesh = particle_mesh(jax.devices()[:8])
    state = g.pf_initialize(jr.key(0), line_model, (10,),
                            line_choicemap(10), 256)
    return mesh, state, shard_state(state, mesh)


def _assert_trees_equal(a, b):
    for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


# ---------------------------------------------------------------------------
# Lowering evidence
# ---------------------------------------------------------------------------

def test_rotate_lowers_to_collective_permute_only(setup):
    mesh, _, sharded = setup
    txt = _hlo(lambda s: pf_rotate_blocks(s, 8, 1, mesh=mesh), sharded)
    counts = _collective_counts(txt)
    assert counts["collective-permute"] >= 1, counts
    for op in ("all-gather", "all-to-all", "all-reduce", "reduce-scatter"):
        assert counts[op] == 0, (op, counts)


def test_shuffle_lowers_to_all_to_all_only(setup):
    mesh, _, sharded = setup
    txt = _hlo(lambda s: pf_shuffle_blocks(s, 8, mesh=mesh), sharded)
    counts = _collective_counts(txt)
    assert counts["all-to-all"] >= 1, counts
    for op in ("all-gather", "all-reduce", "reduce-scatter",
               "collective-permute"):
        assert counts[op] == 0, (op, counts)


@pytest.mark.parametrize("method", ["systematic", "multinomial", "residual",
                                    "stratified"])
def test_blockwise_resample_is_collective_free(setup, method):
    mesh, _, sharded = setup
    txt = _hlo(lambda k, s: pf_resample_blockwise(k, s, 8, method=method,
                                                  mesh=mesh),
               jr.key(1), sharded)
    counts = _collective_counts(txt)
    assert all(v == 0 for v in counts.values()), counts


def test_global_resample_pays_all_gather(setup):
    mesh, _, sharded = setup
    txt = _hlo(lambda k, s: g.pf_resample(k, s, "systematic", check=False),
               jr.key(1), sharded)
    counts = _collective_counts(txt)
    assert counts["all-gather"] >= 1, counts


def test_global_diagnostics_lower_to_all_reduce(setup):
    mesh, _, sharded = setup
    txt = _hlo(lambda s: (g.effective_sample_size(s), g.log_ml_estimate(s)),
               sharded)
    counts = _collective_counts(txt)
    assert counts["all-reduce"] >= 1, counts
    for op in ("all-gather", "all-to-all", "collective-permute"):
        assert counts[op] == 0, (op, counts)


# ---------------------------------------------------------------------------
# Semantics: shard_map collective path == single-device gather fallback
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shift", [1, 3, 7])
def test_rotate_mesh_matches_fallback(setup, shift):
    mesh, state, sharded = setup
    out_m = jax.jit(lambda s: pf_rotate_blocks(s, 8, shift, mesh=mesh))(
        sharded)
    out_f = jax.jit(lambda s: pf_rotate_blocks(s, 8, shift))(state)
    np.testing.assert_array_equal(np.asarray(out_m.parents),
                                  np.asarray(out_f.parents))
    np.testing.assert_array_equal(np.asarray(out_m.log_weights),
                                  np.asarray(out_f.log_weights))
    _assert_trees_equal(out_m.traces, out_f.traces)
    # block j's particles moved to block (j+shift) mod 8
    b = 256 // 8
    parents = np.asarray(out_f.parents)
    for j in range(8):
        src = (j - shift) % 8
        np.testing.assert_array_equal(parents[j * b:(j + 1) * b],
                                      np.arange(src * b, (src + 1) * b))


def test_shuffle_mesh_matches_fallback(setup):
    mesh, state, sharded = setup
    out_m = jax.jit(lambda s: pf_shuffle_blocks(s, 8, mesh=mesh))(sharded)
    out_f = jax.jit(lambda s: pf_shuffle_blocks(s, 8))(state)
    np.testing.assert_array_equal(np.asarray(out_m.parents),
                                  np.asarray(out_f.parents))
    np.testing.assert_array_equal(np.asarray(out_m.log_weights),
                                  np.asarray(out_f.log_weights))
    _assert_trees_equal(out_m.traces, out_f.traces)
    # equal-split block transpose: new block i holds b/K particles from
    # every old block
    K, b = 8, 256 // 8
    parents = np.asarray(out_f.parents).reshape(K, b)
    for i in range(K):
        blocks_hit = np.unique(parents[i] // b)
        np.testing.assert_array_equal(blocks_hit, np.arange(K))


@pytest.mark.parametrize("method", ["systematic", "multinomial", "residual",
                                    "stratified"])
def test_blockwise_mesh_matches_fallback(setup, method):
    mesh, state, sharded = setup
    out_m = jax.jit(lambda k, s: pf_resample_blockwise(
        k, s, 8, method=method, mesh=mesh))(jr.key(1), sharded)
    out_f = jax.jit(lambda k, s: pf_resample_blockwise(
        k, s, 8, method=method))(jr.key(1), state)
    np.testing.assert_array_equal(np.asarray(out_m.parents),
                                  np.asarray(out_f.parents))
    np.testing.assert_allclose(np.asarray(out_m.log_weights),
                               np.asarray(out_f.log_weights), atol=1e-6)
    _assert_trees_equal(out_m.traces, out_f.traces)
    # output stays sharded over all 8 devices
    assert len(out_m.log_weights.sharding.device_set) == 8


def test_blockwise_stratified_unsorted_mesh_matches_fallback(setup):
    # the fused unsorted-stratified formulation (sort_particles=False):
    # mesh shard_map body and single-device fallback must agree exactly
    mesh, state, sharded = setup
    out_m = jax.jit(lambda k, s: pf_resample_blockwise(
        k, s, 8, method="stratified", sort_particles=False,
        mesh=mesh))(jr.key(4), sharded)
    out_f = jax.jit(lambda k, s: pf_resample_blockwise(
        k, s, 8, method="stratified", sort_particles=False))(
        jr.key(4), state)
    np.testing.assert_array_equal(np.asarray(out_m.parents),
                                  np.asarray(out_f.parents))
    np.testing.assert_allclose(np.asarray(out_m.log_weights),
                               np.asarray(out_f.log_weights), atol=1e-6)
    _assert_trees_equal(out_m.traces, out_f.traces)
    # parents are clustered per block (the fused-gather precondition)
    par = np.asarray(out_m.parents).reshape(8, -1)
    assert all((np.diff(row) >= 0).all() for row in par)


def test_blockwise_mesh_priority_fn(setup):
    mesh, state, sharded = setup
    pf = lambda w: w / 2
    out_m = jax.jit(lambda k, s: pf_resample_blockwise(
        k, s, 8, method="multinomial", priority_fn=pf, mesh=mesh))(
        jr.key(2), sharded)
    out_f = jax.jit(lambda k, s: pf_resample_blockwise(
        k, s, 8, method="multinomial", priority_fn=pf))(jr.key(2), state)
    np.testing.assert_array_equal(np.asarray(out_m.parents),
                                  np.asarray(out_f.parents))
    np.testing.assert_allclose(np.asarray(out_m.log_weights),
                               np.asarray(out_f.log_weights), atol=1e-5)


def test_shuffle_requires_equal_splits():
    state = g.pf_initialize(jr.key(0), line_model, (1,), line_choicemap(1),
                            32)
    with pytest.raises(ValueError, match="equal splits"):
        pf_shuffle_blocks(state, 8)  # b=4 not divisible by K=8


def test_mesh_size_mismatch_raises(setup):
    mesh, state, _ = setup
    with pytest.raises(ValueError, match="devices"):
        pf_rotate_blocks(state, 4, 1, mesh=mesh)
