"""Sharding tests on an 8-virtual-device CPU mesh (SURVEY.md §4: the
reference's multi-node answer is mesh-on-CPU simulation)."""

import math

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import genparticlefilters_tpu as g
from genparticlefilters_tpu.parallel import (
    particle_mesh, shard_state, state_sharding,
    pf_resample_blockwise, pf_shuffle_blocks, pf_rotate_blocks,
    block_log_weight_imbalance)
from genparticlefilters_tpu.utils.weights import logsumexp
from fixtures import line_model, line_choicemap


def test_eight_devices_available():
    assert jax.device_count() >= 8


def test_blockwise_resample_semantics():
    # block totals preserved; ancestry stays within blocks; LML untouched
    state = g.pf_initialize(jr.key(0), line_model, (10,), line_choicemap(10),
                            128)
    out = pf_resample_blockwise(jr.key(1), state, 8, method="systematic")
    b = 128 // 8
    for k in range(8):
        blk = slice(k * b, (k + 1) * b)
        np.testing.assert_allclose(
            float(logsumexp(out.log_weights[blk])),
            float(logsumexp(state.log_weights[blk])), atol=1e-4)
        parents = np.asarray(out.parents[blk])
        assert ((parents >= k * b) & (parents < (k + 1) * b)).all()
    assert float(out.log_ml_est) == float(state.log_ml_est)
    np.testing.assert_allclose(float(g.log_ml_estimate(out)),
                               float(g.log_ml_estimate(state)), atol=1e-4)


def test_blockwise_priority_fn():
    state = g.pf_initialize(jr.key(0), line_model, (10,), line_choicemap(10),
                            64)
    out = pf_resample_blockwise(jr.key(1), state, 4, method="multinomial",
                                priority_fn=lambda w: w / 2)
    b = 64 // 4
    for k in range(4):
        blk = slice(k * b, (k + 1) * b)
        np.testing.assert_allclose(
            float(logsumexp(out.log_weights[blk])),
            float(logsumexp(state.log_weights[blk])), atol=1e-3)


def test_shuffle_and_rotate_preserve_multiset():
    state = g.pf_initialize(jr.key(0), line_model, (10,), line_choicemap(10),
                            64)
    for op in (lambda s: pf_shuffle_blocks(s, 8),
               lambda s: pf_rotate_blocks(s, 8, 3)):
        out = op(state)
        np.testing.assert_allclose(
            np.sort(np.asarray(out.log_weights)),
            np.sort(np.asarray(state.log_weights)), atol=1e-6)
        np.testing.assert_allclose(float(g.log_ml_estimate(out)),
                                   float(g.log_ml_estimate(state)),
                                   atol=1e-5)
    imb = float(block_log_weight_imbalance(state, 8))
    assert imb >= 0.0


def test_sharded_smc_step_executes():
    """Full SMC step (update + blockwise resample + diagnostics) jitted over
    an 8-device mesh with the particle axis sharded."""
    mesh = particle_mesh(jax.devices()[:8])
    n = 256
    state = g.pf_initialize(jr.key(0), line_model, (1,), line_choicemap(1), n)
    sharded = shard_state(state, mesh)
    shardings = state_sharding(mesh, state)

    @jax.jit
    def smc_step(key, s):
        k1, k2 = jr.split(key)
        s = g.pf_update(k1, s, (2,), (g.UnknownChange(),),
                        line_choicemap(2), check=False)
        s = pf_resample_blockwise(k2, s, 8, method="systematic")
        return s, g.effective_sample_size(s), g.log_ml_estimate(s)

    out, ess, lml = smc_step(jr.key(1), sharded)
    # semantics identical to the unsharded run with the same keys
    out2, ess2, lml2 = smc_step(jr.key(1), state)
    np.testing.assert_allclose(float(ess), float(ess2), rtol=1e-4)
    np.testing.assert_allclose(float(lml), float(lml2), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.log_weights),
                               np.asarray(out2.log_weights), atol=1e-5)
    # output particle axis is still sharded across the 8 devices
    assert len(out.log_weights.sharding.device_set) == 8


def test_sharded_state_leaf_shardings():
    mesh = particle_mesh(jax.devices()[:8])
    state = g.pf_initialize(jr.key(0), line_model, (1,), line_choicemap(1),
                            64)
    sharded = shard_state(state, mesh)
    assert len(sharded.log_weights.sharding.device_set) == 8
    # scalar lml is replicated
    assert sharded.log_ml_est.sharding.is_fully_replicated
