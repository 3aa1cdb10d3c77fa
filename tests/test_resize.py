"""Resizing tests (mirror of /root/reference/test/resize.jl)."""

import math

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

import genparticlefilters_tpu as g
from genparticlefilters_tpu.utils.weights import logsumexp
from genparticlefilters_tpu.smc.resize import find_inv_w_threshold
from fixtures import (line_model, line_choicemap, slope_choicemap,
                      outlier_choicemap)


def _ancestry_ok(old_state, new_state):
    from genparticlefilters_tpu.core.batching import tree_take
    gathered = tree_take(old_state.traces, new_state.parents)
    for a, b in zip(jax.tree_util.tree_leaves(gathered),
                    jax.tree_util.tree_leaves(new_state.traces)):
        if not np.array_equal(np.asarray(a), np.asarray(b)):
            return False
    return True


@pytest.mark.parametrize("method", ["multinomial", "residual"])
@pytest.mark.parametrize("n_new", [50, 150])
@pytest.mark.parametrize("use_priority", [False, True])
def test_resize_invariants(method, n_new, use_priority):
    # ref: test/resize.jl:3-84 — size change + ancestry + LML invariance
    p_fn = (lambda w: w / 2) if use_priority else None
    old = g.pf_initialize(jr.key(0), line_model, (10,), line_choicemap(10),
                          100)
    old_lml = float(g.log_ml_estimate(old))
    new = g.pf_resize(jr.key(1), old, n_new, method, priority_fn=p_fn)
    assert new.n_particles == n_new
    assert _ancestry_ok(old, new)
    np.testing.assert_allclose(float(g.log_ml_estimate(new)), old_lml,
                               atol=1e-4)
    if method == "residual":
        if use_priority:
            lp = np.asarray(old.log_weights, np.float64) / 2
        else:
            lp = np.asarray(old.log_weights, np.float64)
        w = np.exp(lp - lp.max())
        w /= w.sum()
        min_copies = np.floor(w * n_new).astype(int)
        counts = np.bincount(np.asarray(new.parents), minlength=100)
        assert (counts >= min_copies).all()


def test_resize_invalid_weights():
    # ref: test/resize.jl:31-37
    state = g.pf_initialize(jr.key(0), line_model, (0,), slope_choicemap(-3),
                            100)
    with pytest.raises(FloatingPointError):
        g.pf_resize(jr.key(1), state, 50, "multinomial", check=True)
    out = g.pf_resize(jr.key(1), state, 50, "multinomial", check=False)
    np.testing.assert_allclose(out.log_weights, 0.0, atol=1e-5)


def test_optimal_resize():
    # ref: test/resize.jl:86-105 — kept particles: shifted weights; all
    # survivors unique; LML ≈ invariant
    for n_new in [25, 50]:
        old = g.pf_initialize(jr.key(0), line_model, (10,),
                              line_choicemap(10), 100)
        old_lml = float(g.log_ml_estimate(old))
        # reference threshold loop, in f64 log space to avoid underflow
        lw = np.asarray(old.log_weights, np.float64)
        w = np.exp(lw - lw.max())
        w /= w.sum()
        ws = np.sort(w)
        A, B, thresh = len(ws), 0.0, float(n_new)
        for kappa in ws:
            A -= 1
            B += kappa
            if kappa > 0 and B / kappa + A <= n_new + 1e-9:
                thresh = (n_new - A) / B
                break
        keep_idxs = np.where(thresh * w >= 1 - 1e-6)[0]
        n_keep = len(keep_idxs)
        log_ratio = math.log(n_new) - math.log(100)
        new = g.pf_resize(jr.key(1), old, n_new, "optimal")
        assert new.n_particles == n_new
        assert _ancestry_ok(old, new)
        # kept block comes first, in index order, with shifted weights
        np.testing.assert_array_equal(np.asarray(new.parents[:n_keep]),
                                      keep_idxs)
        np.testing.assert_allclose(
            np.asarray(new.log_weights[:n_keep]),
            np.asarray(old.log_weights)[keep_idxs] + log_ratio, atol=1e-4)
        # survivors unique
        assert len(np.unique(np.asarray(new.parents))) == n_new
        np.testing.assert_allclose(float(g.log_ml_estimate(new)), old_lml,
                                   rtol=1e-3, atol=2e-3)


def test_replicate_layouts():
    # ref: test/resize.jl:116-145
    strata = [slope_choicemap(s) for s in range(-2, 3)]
    state = g.pf_initialize(jr.key(0), line_model, (1,), line_choicemap(1), 5,
                            strata=strata)
    old_lml = float(g.log_ml_estimate(state))
    rep = g.pf_replicate(state, 20, layout="contiguous")
    assert rep.n_particles == 100
    slopes = np.asarray(g.batched_choice(rep, "slope"))
    for b, s in enumerate(range(-2, 3)):
        assert (slopes[b * 20:(b + 1) * 20] == s).all()
    np.testing.assert_allclose(float(g.log_ml_estimate(rep)), old_lml,
                               atol=1e-4)
    rep = g.pf_replicate(state, 20, layout="interleaved")
    slopes = np.asarray(g.batched_choice(rep, "slope"))
    for k, s in enumerate(range(-2, 3)):
        assert (slopes[k::5] == s).all()
    np.testing.assert_allclose(float(g.log_ml_estimate(rep)), old_lml,
                               atol=1e-4)


@pytest.mark.parametrize("layout", ["contiguous", "interleaved"])
def test_dereplicate_keepfirst_inverts_replicate(layout):
    # ref: test/resize.jl:147-182
    strata = [slope_choicemap(s) for s in range(-2, 3)]
    state = g.pf_initialize(jr.key(0), line_model, (1,), line_choicemap(1), 5,
                            strata=strata)
    old_slopes = np.asarray(g.batched_choice(state, "slope"))
    old_lw = np.asarray(state.log_weights)
    old_lml = float(g.log_ml_estimate(state))
    rep = g.pf_replicate(state, 20, layout=layout)
    der = g.pf_dereplicate(jr.key(1), rep, 20, layout=layout,
                           method="keepfirst")
    assert der.n_particles == 5
    np.testing.assert_array_equal(np.asarray(g.batched_choice(der, "slope")),
                                  old_slopes)
    np.testing.assert_allclose(np.asarray(der.log_weights), old_lw, atol=1e-6)
    np.testing.assert_allclose(float(g.log_ml_estimate(der)), old_lml,
                               atol=1e-4)


@pytest.mark.parametrize("layout", ["contiguous", "interleaved"])
def test_dereplicate_sample(layout):
    # ref: test/resize.jl:184-225 — block-average weights, LML invariant
    strata = [slope_choicemap(s) for s in range(-2, 3)]
    state = g.pf_initialize(jr.key(0), line_model, (0,), g.choicemap(), 5,
                            strata=strata)
    state = g.pf_replicate(state, 20, layout=layout)
    state = g.pf_update(jr.key(1), state, (1,), (g.UnknownChange(),),
                        line_choicemap(1))
    old_lw = np.asarray(state.log_weights)
    old_lml = float(g.log_ml_estimate(state))
    der = g.pf_dereplicate(jr.key(2), state, 20, layout=layout,
                           method="sample")
    assert der.n_particles == 5
    slopes = np.asarray(g.batched_choice(der, "slope"))
    np.testing.assert_array_equal(slopes, np.arange(-2, 3))
    for i in range(5):
        if layout == "contiguous":
            blk = old_lw[i * 20:(i + 1) * 20]
        else:
            blk = old_lw[i::5]
        expect = np.log(np.sum(np.exp(blk - blk.max()))) + blk.max() \
            - math.log(20)
        np.testing.assert_allclose(float(der.log_weights[i]), expect,
                                   atol=1e-4)
    np.testing.assert_allclose(float(g.log_ml_estimate(der)), old_lml,
                               atol=1e-3)


def test_coalesce():
    # ref: test/resize.jl:227-254 — merge equal-choicemap particles;
    # static-shape variant: losers get -inf weight, stats/LML match
    obs = line_choicemap(1).merge(outlier_choicemap(1, False))
    state = g.pf_initialize(jr.key(0), line_model, (1,), obs, 100)
    old_lml = float(g.log_ml_estimate(state))
    co = g.pf_coalesce(state)
    # effective particle count = number of unique slopes (<= 5)
    alive = np.isfinite(np.asarray(co.log_weights))
    slopes = np.asarray(g.batched_choice(state, "slope"))
    assert alive.sum() == len(np.unique(slopes)) <= 5
    # alive slots carry merged weight; weighted stats match original
    np.testing.assert_allclose(float(g.mean(co, "slope")),
                               float(g.mean(state, "slope")), atol=1e-4)
    # LML: reference multiplies by n_unique/n_old and divides by n_unique in
    # the estimator; our padded state divides by N with the same numerator
    n_unique = int(alive.sum())
    expect_lml = old_lml
    got = float(logsumexp(co.log_weights)) - math.log(n_unique)
    np.testing.assert_allclose(got, expect_lml, atol=1e-3)


def test_coalesce_replicated_identity():
    strata = [slope_choicemap(s) for s in range(-2, 3)]
    obs = line_choicemap(1).merge(outlier_choicemap(1, False))
    state = g.pf_initialize(jr.key(0), line_model, (1,), obs, 5,
                            strata=strata)
    state = g.pf_replicate(state, 20, layout="contiguous")
    co = g.pf_coalesce(state)
    alive = np.isfinite(np.asarray(co.log_weights))
    assert alive.sum() == 5


def test_introduce_default():
    # ref: test/resize.jl:256-284
    state = g.pf_initialize(jr.key(0), line_model, (0,), g.choicemap(), 50)
    state = g.pf_introduce(jr.key(1), state, g.choicemap(), 50)
    assert state.n_particles == 100
    slopes = np.asarray(g.batched_choice(state, "slope"))
    assert ((slopes >= -2) & (slopes <= 2)).all()
    np.testing.assert_allclose(state.log_weights, 0.0, atol=1e-5)

    state = g.pf_initialize(jr.key(2), line_model, (10,), line_choicemap(10),
                            50)
    state = g.pf_introduce(jr.key(3), state, line_choicemap(10), 50)
    assert state.n_particles == 100
    np.testing.assert_allclose(
        np.asarray(g.batched_choice(state, ("line", 9, "y"))), 0.0, atol=1e-6)


def test_introduce_custom_proposal():
    # ref: test/resize.jl:286-339
    @g.gen
    def line_propose(_s):
        g.trace("slope", g.uniform_discrete(0, 0))

    state = g.pf_initialize(jr.key(0), line_model, (0,), g.choicemap(), 50,
                            proposal=line_propose, proposal_args=(0,))
    state = g.pf_introduce(jr.key(1), state, g.choicemap(), 50,
                           proposal=line_propose, proposal_args=(0,))
    assert state.n_particles == 100
    slopes = np.asarray(g.batched_choice(state, "slope"))
    assert (slopes == 0).all()
    np.testing.assert_allclose(state.log_weights, math.log(1 / 5), atol=1e-4)


def test_introduce_folds_lml():
    # after a resample (log_ml_est != 0), introduce folds it into weights
    state = g.pf_initialize(jr.key(0), line_model, (10,), line_choicemap(10),
                            50)
    state = g.pf_resample(jr.key(1), state, "residual")
    lml_before = float(g.log_ml_estimate(state))
    state = g.pf_introduce(jr.key(2), state, line_choicemap(10), 50)
    assert float(state.log_ml_est) == 0.0
    # old particles carry the folded lml in their weights
    np.testing.assert_allclose(np.asarray(state.log_weights[:50]),
                               lml_before, atol=1e-4)


def test_coalesce_large_int_keys():
    """Choices above 2**24 that differ by 1 must stay in separate groups —
    a float32 key cast would collapse them (ref keys on exact choicemap
    equality, src/resize.jl:309-334)."""
    obs = line_choicemap(1).merge(outlier_choicemap(1, False))
    state = g.pf_initialize(jr.key(0), line_model, (1,), obs, 8)
    big = jnp.asarray([16777216, 16777217, 16777216, 16777217,
                       16777218, 16777218, 16777216, 16777219],
                      jnp.int32)
    co = g.pf_coalesce(state, by=lambda _traces: big)
    alive = np.isfinite(np.asarray(co.log_weights))
    assert alive.sum() == 4  # 4 distinct values, not 1 f32-rounded group


def test_coalesce_float_bit_keys():
    """Float keys distinct only in low mantissa bits must not merge, and
    -0.0 must merge with +0.0 (value equality)."""
    obs = line_choicemap(1).merge(outlier_choicemap(1, False))
    state = g.pf_initialize(jr.key(0), line_model, (1,), obs, 6)
    f = jnp.asarray([1.0, np.nextafter(np.float32(1.0), np.float32(2.0)),
                     0.0, -0.0, 1.0, 0.0], jnp.float32)
    co = g.pf_coalesce(state, by=lambda _traces: f)
    alive = np.isfinite(np.asarray(co.log_weights))
    assert alive.sum() == 3  # {1.0, nextafter(1.0), 0.0}
