"""Update tests (mirror of /root/reference/test/update.jl)."""

import math

import jax.numpy as jnp
import jax.random as jr
import numpy as np

import genparticlefilters_tpu as g
from fixtures import (line_model, line_choicemap, outlier_choicemap,
                      lp_normal, lp_bern)


def make_outlier_propose(idxs, p=0.0):
    @g.gen
    def outlier_propose(tr):
        for i in idxs:
            g.trace(("line", i, "outlier"), g.bernoulli(p))
    return outlier_propose


def test_update_default_proposal():
    # ref: test/update.jl:3-11 — exact weight = logpdf(y=0 | slope, outlier)
    state = g.pf_initialize(jr.key(0), line_model, (0,), g.choicemap(), 100)
    state = g.pf_update(jr.key(1), state, (1,), (g.UnknownChange(),),
                        line_choicemap(1))
    ys = g.batched_choice(state, ("line", 0, "y"))
    np.testing.assert_allclose(ys, 0.0, atol=1e-6)
    outl = np.asarray(g.batched_choice(state, ("line", 0, "outlier")))
    slopes = np.asarray(g.batched_choice(state, "slope"), np.float64)
    expected = np.array([lp_normal(0.0, s, 10.0 if o else 1.0)
                         for o, s in zip(outl, slopes)])
    np.testing.assert_allclose(state.log_weights, expected, atol=1e-4)


def test_update_stratified():
    # ref: test/update.jl:13-40 — weight = lp(outlier) + log 2 + lp(y|...)
    strata = [outlier_choicemap(1, False), outlier_choicemap(1, True)]
    for layout, sel in (("contiguous", lambda a, k: a[k * 50:(k + 1) * 50]),
                        ("interleaved", lambda a, k: a[k::2])):
        state = g.pf_initialize(jr.key(0), line_model, (0,), g.choicemap(),
                                100)
        state = g.pf_update(jr.key(1), state, (1,), (g.UnknownChange(),),
                            line_choicemap(1), strata=strata, layout=layout)
        outl = np.asarray(g.batched_choice(state, ("line", 0, "outlier")))
        slopes = np.asarray(g.batched_choice(state, "slope"), np.float64)
        lw = np.asarray(state.log_weights)
        for k, val in enumerate([False, True]):
            assert (sel(outl, k) == val).all()
            std = 10.0 if val else 1.0
            expected = np.array([lp_bern(val, 0.1) + math.log(2)
                                 + lp_normal(0.0, s, std)
                                 for s in sel(slopes, k)])
            np.testing.assert_allclose(sel(lw, k), expected, atol=1e-4)


def test_update_custom_proposal():
    # ref: test/update.jl:47-54
    state = g.pf_initialize(jr.key(0), line_model, (0,), g.choicemap(), 100)
    state = g.pf_update(jr.key(1), state, (10,), (g.UnknownChange(),),
                        line_choicemap(10),
                        proposal=make_outlier_propose(range(10)),
                        proposal_args=())
    np.testing.assert_allclose(
        g.batched_choice(state, ("line", 9, "y")), 0.0, atol=1e-6)
    assert not bool(jnp.any(g.batched_choice(state, ("line", 9, "outlier"))))
    assert bool(jnp.all(state.log_weights != 0))


def test_update_custom_proposal_stratified():
    # ref: test/update.jl:55-66 — default layout interleaved
    strata = [outlier_choicemap(1, False), outlier_choicemap(1, True)]
    state = g.pf_initialize(jr.key(0), line_model, (0,), g.choicemap(), 100)
    state = g.pf_update(jr.key(1), state, (2,), (g.UnknownChange(),),
                        line_choicemap(2), strata=strata,
                        proposal=make_outlier_propose([1]),
                        proposal_args=())
    outl0 = np.asarray(g.batched_choice(state, ("line", 0, "outlier")))
    outl1 = np.asarray(g.batched_choice(state, ("line", 1, "outlier")))
    ys = np.asarray(g.batched_choice(state, ("line", 1, "y")))
    for k, val in enumerate([False, True]):
        assert (outl0[k::2] == val).all()
    assert not outl1.any()
    np.testing.assert_allclose(ys, 0.0, atol=1e-6)


def test_update_fwd_bwd_proposals():
    # ref: test/update.jl:69-90 — Del Moral SMC update replacing choices
    state = g.pf_initialize(jr.key(0), line_model, (10,), line_choicemap(10),
                            100)
    state = g.pf_update(jr.key(1), state, (10,), (g.UnknownChange(),),
                        g.choicemap(),
                        proposal=make_outlier_propose(range(10), p=0.0),
                        proposal_args=(),
                        bwd_proposal=make_outlier_propose(range(10), p=0.1),
                        bwd_args=())
    assert not bool(jnp.any(g.batched_choice(state, ("line", 9, "outlier"))))
    np.testing.assert_allclose(
        g.batched_choice(state, ("line", 9, "y")), 0.0, atol=1e-6)
    assert bool(jnp.all(state.log_weights != 0))


def test_update_fwd_bwd_exact_weight():
    """Hand-checked Del Moral weight on a 1-step model: replacing outlier_0
    with False via fwd Bern(0.0), bwd Bern(0.1).

    w = Δscore − fwd + bwd, where Δscore = [lp(out_new) + lp(y|new)] −
    [lp(out_old) + lp(y|old)], fwd = log 1, bwd = lp_bern(old, 0.1).
    """
    state = g.pf_initialize(jr.key(0), line_model, (1,), line_choicemap(1), 64)
    old_outl = np.asarray(g.batched_choice(state, ("line", 0, "outlier")))
    slopes = np.asarray(g.batched_choice(state, "slope"), np.float64)
    old_lw = np.asarray(state.log_weights)
    state = g.pf_update(jr.key(1), state, (1,), (g.UnknownChange(),),
                        g.choicemap(),
                        proposal=make_outlier_propose([0], p=0.0),
                        proposal_args=(),
                        bwd_proposal=make_outlier_propose([0], p=0.1),
                        bwd_args=())
    new_lw = np.asarray(state.log_weights)
    for i in range(64):
        o, s = bool(old_outl[i]), slopes[i]
        dscore = ((lp_bern(False, 0.1) + lp_normal(0, s, 1.0))
                  - (lp_bern(o, 0.1) + lp_normal(0, s, 10.0 if o else 1.0)))
        expected = dscore - 0.0 + lp_bern(o, 0.1)
        np.testing.assert_allclose(new_lw[i] - old_lw[i], expected, atol=1e-4)


def test_update_views():
    # ref: test/update.jl:179-189 — different proposals per view
    state = g.pf_initialize(jr.key(0), line_model, (0,), g.choicemap(), 100)
    state = g.pf_update(jr.key(1), state[0:50], (10,), (g.UnknownChange(),),
                        line_choicemap(10))
    state = g.pf_update(jr.key(2), state[50:100], (10,), (g.UnknownChange(),),
                        line_choicemap(10),
                        proposal=make_outlier_propose(range(10)),
                        proposal_args=())
    ys = g.batched_choice(state, ("line", 9, "y"))
    np.testing.assert_allclose(ys, 0.0, atol=1e-6)
    outl = np.asarray(g.batched_choice(state, ("line", 9, "outlier")))
    assert not outl[50:].any()
    assert bool(jnp.all(state.log_weights != 0))


def test_update_fwd_bwd_stratified():
    # ref: test/update.jl:77-89 — stratified Del Moral update
    strata = [outlier_choicemap(1, False), outlier_choicemap(1, True)]
    state = g.pf_initialize(jr.key(0), line_model, (0,), g.choicemap(), 100)
    state = g.pf_update(jr.key(1), state, (2,), (g.UnknownChange(),),
                        line_choicemap(2), strata=strata,
                        proposal=make_outlier_propose([1], p=0.0),
                        proposal_args=(),
                        bwd_proposal=make_outlier_propose([1], p=0.1),
                        bwd_args=())
    outl0 = np.asarray(g.batched_choice(state, ("line", 0, "outlier")))
    outl1 = np.asarray(g.batched_choice(state, ("line", 1, "outlier")))
    for k, val in enumerate([False, True]):
        assert (outl0[k::2] == val).all()
    assert not outl1.any()
    assert bool(jnp.all(state.log_weights != 0))
