"""Resampling tests (mirror of /root/reference/test/resample.jl)."""

import math

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

import genparticlefilters_tpu as g
from genparticlefilters_tpu.utils.weights import logsumexp
from fixtures import line_model, line_choicemap, slope_choicemap


def _ancestry_ok(old_state, new_state):
    """new_traces == old_traces[parents] (ref: test/resample.jl:11)."""
    from genparticlefilters_tpu.core.batching import tree_take
    gathered = tree_take(old_state.traces, new_state.parents)
    for a, b in zip(jax.tree_util.tree_leaves(gathered),
                    jax.tree_util.tree_leaves(new_state.traces)):
        if not np.array_equal(np.asarray(a), np.asarray(b)):
            return False
    return True


@pytest.mark.parametrize("method", ["multinomial", "residual", "stratified",
                                    "systematic"])
@pytest.mark.parametrize("use_priority", [False, True])
def test_resample_invariants(method, use_priority):
    # ref: test/resample.jl:3-32,34-79,81-128 — ancestry + LML invariance
    p_fn = (lambda w: w / 2) if use_priority else None
    old = g.pf_initialize(jr.key(0), line_model, (10,), line_choicemap(10),
                          100)
    old_lml = float(logsumexp(old.log_weights) - math.log(100))
    new = g.pf_resample(jr.key(1), old, method, priority_fn=p_fn)
    assert _ancestry_ok(old, new)
    np.testing.assert_allclose(float(g.log_ml_estimate(new)), old_lml,
                               atol=1e-4)
    if not use_priority:
        np.testing.assert_allclose(new.log_weights, 0.0, atol=1e-5)


@pytest.mark.parametrize("method", ["residual", "stratified", "systematic"])
def test_resample_identity_on_equal_weights(method):
    # ref: test/resample.jl:36-40,83-87 — equal weights => no resampling
    old = g.pf_initialize(jr.key(0), line_model, (0,), g.choicemap(), 100)
    new = g.pf_resample(jr.key(1), old, method)
    slopes_old = np.asarray(g.batched_choice(old, "slope"))
    slopes_new = np.asarray(g.batched_choice(new, "slope"))
    if method == "residual":
        np.testing.assert_array_equal(slopes_old, slopes_new)
    else:
        # stratified/systematic sort by weight first; multiset is preserved
        np.testing.assert_array_equal(np.sort(slopes_old),
                                      np.sort(slopes_new))


def test_residual_min_copies():
    # ref: test/resample.jl:42-52 — at least ⌊Nw⌋ copies of each particle
    old = g.pf_initialize(jr.key(0), line_model, (10,), line_choicemap(10),
                          100)
    w = np.asarray(g.get_norm_weights(old))
    min_copies = np.floor(w * 100).astype(int)
    new = g.pf_resample(jr.key(1), old, "residual")
    parents = np.asarray(new.parents)
    counts = np.bincount(parents, minlength=100)
    assert (counts >= min_copies).all()


def test_stratified_max_weight_copies():
    # ref: test/resample.jl:89-102
    old = g.pf_initialize(jr.key(0), line_model, (10,), line_choicemap(10),
                          100)
    w = np.asarray(g.get_norm_weights(old))
    max_idx = int(np.argmax(w))
    new = g.pf_resample(jr.key(1), old, "stratified", sort_particles=True)
    counts = np.bincount(np.asarray(new.parents), minlength=100)
    assert counts[max_idx] >= math.floor(w[max_idx] * 100)


def test_resample_invalid_weights():
    # ref: test/resample.jl:26-31 — impossible constraint (slope = -3)
    state = g.pf_initialize(jr.key(0), line_model, (0,), slope_choicemap(-3),
                            100)
    assert bool(jnp.all(jnp.isinf(state.log_weights)))
    for method in ["multinomial", "residual", "stratified"]:
        with pytest.raises(FloatingPointError):
            g.pf_resample(jr.key(1), state, method, check=True)
        out = g.pf_resample(jr.key(1), state, method, check=False)
        np.testing.assert_allclose(out.log_weights, 0.0, atol=1e-5)


def test_resample_invalid_weights_jitted():
    # jitted check=True must STILL fail on degenerate weights — the
    # reference's hard-stop contract (src/utils.jl:117-140) holds inside
    # compiled filters via a raising debug callback that surfaces as
    # JaxRuntimeError at execution time.
    @jax.jit
    def bad_filter(key):
        state = g.pf_initialize(key, line_model, (0,), slope_choicemap(-3),
                                100)
        state = g.pf_resample(jr.key(1), state, "systematic", check=True)
        return state.log_ml_est

    with pytest.raises(Exception, match="Invalid weights"):
        np.asarray(bad_filter(jr.key(0)))  # fetch forces the error

    @jax.jit
    def good_filter(key):
        state = g.pf_initialize(key, line_model, (10,), line_choicemap(10),
                                100)
        state = g.pf_resample(jr.key(1), state, "systematic", check=True)
        return state.log_ml_est

    assert np.isfinite(np.asarray(good_filter(jr.key(0))))


def test_update_discard_check_jitted():
    # overwriting a previous observation inside a jitted pf_update with
    # check=True raises at execution time (ref: src/update.jl:18-20)
    @jax.jit
    def overwriting(key):
        state = g.pf_initialize(key, line_model, (3,), line_choicemap(3), 16)
        # re-constrain an already-observed step -> non-empty discard
        state = g.pf_update(jr.key(1), state, (3,), None, line_choicemap(3),
                            check=True)
        return state.log_ml_est

    with pytest.raises(Exception,
                       match="updated or deleted during pf_update"):
        np.asarray(overwriting(jr.key(0)))


@pytest.mark.parametrize("method", ["multinomial", "residual", "stratified"])
@pytest.mark.parametrize("use_priority", [False, True])
def test_blockwise_views(method, use_priority):
    # ref: test/resample.jl:130-162 — per-block resampling preserves the
    # global LML and ancestry
    p_fn = (lambda w: w / 2) if use_priority else None
    state = g.pf_initialize(jr.key(0), line_model, (10,), line_choicemap(10),
                            100)
    old = state
    old_lml_full = float(logsumexp(state.log_weights) - math.log(100))
    for blk in (slice(0, 50), slice(50, 100)):
        sub = state[blk]
        sub_lml = float(g.log_ml_estimate(sub))
        state = g.pf_resample(jr.fold_in(jr.key(1), blk.start), sub, method,
                              priority_fn=p_fn)
        np.testing.assert_allclose(float(g.log_ml_estimate(state[blk])),
                                   sub_lml, atol=1e-4)
    # global invariants on the full state
    np.testing.assert_allclose(float(g.log_ml_estimate(state)),
                               old_lml_full, atol=1e-4)
    # ancestry: parents recorded per block are block-local gathers
    from genparticlefilters_tpu.core.batching import tree_take
    gathered = tree_take(old.traces, state.parents)
    for a, b in zip(jax.tree_util.tree_leaves(gathered),
                    jax.tree_util.tree_leaves(state.traces)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_resample_jits():
    state = g.pf_initialize(jr.key(0), line_model, (10,), line_choicemap(10),
                            64)

    @jax.jit
    def step(key, s):
        return g.pf_resample(key, s, "systematic", check=False)

    out = step(jr.key(1), state)
    assert out.n_particles == 64
