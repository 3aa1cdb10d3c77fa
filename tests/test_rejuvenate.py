"""Rejuvenation tests (mirror of /root/reference/test/rejuvenate.jl).

The reference's @debug log-capture oracle becomes ``return_stats=True``:
accept flags / relative weights come back as arrays.
"""

import math

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

import genparticlefilters_tpu as g
from fixtures import line_model, line_choicemap, lp_normal, lp_bern


def test_move_reweight_selection_exact():
    # ref: test/rejuvenate.jl:9-15 — rel weight = lp(y|new) − lp(y|old)
    obs = line_choicemap(1)
    tr, _ = line_model.generate(jr.key(0), (1,), obs)
    slope = float(np.asarray(tr["slope"]))
    out_old = bool(np.asarray(tr[("line", 0, "outlier")]))
    sel = g.select(("line", 0, "outlier"))
    for i in range(30):
        new_tr, w = g.move_reweight(jr.key(i + 1), tr, sel)
        out_new = bool(np.asarray(new_tr[("line", 0, "outlier")]))
        expected = (lp_normal(0, slope, 10.0 if out_new else 1.0)
                    - lp_normal(0, slope, 10.0 if out_old else 1.0))
        np.testing.assert_allclose(float(w), expected, atol=1e-4)


def test_move_reweight_proposal_exact():
    # ref: test/rejuvenate.jl:17-27 — proposal Bern(0.9) on outlier
    obs = line_choicemap(1)
    tr, _ = line_model.generate(jr.key(0), (1,), obs)
    slope = float(np.asarray(tr["slope"]))
    out_old = bool(np.asarray(tr[("line", 0, "outlier")]))

    @g.gen
    def outlier_propose(tr_, idx):
        g.trace(("line", 0, "outlier"), g.bernoulli(0.9))

    def expected_w(out_old, out_new, slope):
        w = (lp_bern(out_new, 0.1) - lp_bern(out_old, 0.1)
             + lp_normal(0, slope, 10.0 if out_new else 1.0)
             - lp_normal(0, slope, 10.0 if out_old else 1.0))
        # fwd proposes out_new with p=.9; bwd assesses out_old with p=.9:
        # −fwd + bwd = −lp_bern(new,.9) + lp_bern(old,.9)
        w += -lp_bern(out_new, 0.9) + lp_bern(out_old, 0.9)
        return w

    for i in range(30):
        new_tr, w = g.move_reweight(jr.key(i + 1), tr, outlier_propose, (0,))
        out_new = bool(np.asarray(new_tr[("line", 0, "outlier")]))
        np.testing.assert_allclose(float(w),
                                   expected_w(out_old, out_new, slope),
                                   atol=1e-4)


def test_move_accept_only_accepted_change():
    # ref: test/rejuvenate.jl:30-50
    state = g.pf_initialize(jr.key(0), line_model, (10,),
                            line_choicemap(10, 1.0), 100)
    old_slopes = np.asarray(g.batched_choice(state, "slope"))
    new_state, stats = g.pf_move_accept(
        jr.key(1), state, g.mh, (g.select("slope"),), 1, return_stats=True)
    accepts = np.asarray(stats["accepts"])[:, 0].astype(bool)
    new_slopes = np.asarray(g.batched_choice(new_state, "slope"))
    # slope-regenerate draws uniformly; a slope can also be re-proposed to
    # its old value and accepted, so only check: rejected => unchanged
    assert (new_slopes[~accepts] == old_slopes[~accepts]).all()
    assert 0.0 <= float(stats["accept_rate"]) <= 1.0


def test_move_reweight_accumulates_weights():
    # ref: test/rejuvenate.jl:52-71
    state = g.pf_initialize(jr.key(0), line_model, (10,),
                            line_choicemap(10, 1.0), 100)
    old_w = np.asarray(state.log_weights)
    new_state, stats = g.pf_move_reweight(
        jr.key(1), state, g.move_reweight, (g.select("slope"),), 1,
        return_stats=True)
    rel = np.asarray(stats["rel_weights"])[:, 0]
    np.testing.assert_allclose(np.asarray(new_state.log_weights),
                               old_w + rel, atol=1e-3)


def test_rejuvenate_views():
    # ref: test/rejuvenate.jl:73-103
    state = g.pf_initialize(jr.key(0), line_model, (10,),
                            line_choicemap(10, 1.0), 100)
    from genparticlefilters_tpu.core.batching import tree_take
    old_traces_hi = tree_take(state.traces, jnp.arange(50, 100))
    old_w_hi = np.asarray(state.log_weights[50:])
    state = g.pf_rejuvenate(jr.key(1), state[0:50], g.mh,
                            (g.select("slope"),), 1, method="move")
    state2, stats = g.pf_move_reweight(
        jr.key(2), state[50:100], g.move_reweight, (g.select("slope"),), 1,
        return_stats=True)
    rel = np.asarray(stats["rel_weights"])[:, 0]
    np.testing.assert_allclose(np.asarray(state2.log_weights[50:]),
                               old_w_hi + rel, atol=1e-3)
    # first block's weights untouched by move
    np.testing.assert_allclose(np.asarray(state2.log_weights[:50]),
                               np.asarray(state.log_weights[:50]), atol=1e-6)


def test_mh_stationarity_uniform_slope():
    """MH on slope with flat likelihood leaves the uniform prior invariant
    (statistical sanity of regenerate+accept)."""
    state = g.pf_initialize(jr.key(0), line_model, (0,), g.choicemap(), 500)
    for i in range(5):
        state = g.pf_rejuvenate(jr.key(i + 1), state, g.mh,
                                (g.select("slope"),), 1)
    slopes = np.asarray(g.batched_choice(state, "slope"))
    counts = np.bincount(slopes + 2, minlength=5) / len(slopes)
    np.testing.assert_allclose(counts, 0.2, atol=0.08)


def test_mh_involution():
    """Involutive MH: a reflection x -> -x on a symmetric posterior must
    accept always (weight 0) and preserve the distribution."""
    @g.gen
    def sym_model():
        g.trace("x", g.normal(0.0, 1.0))

    @g.gen
    def dummy_prop(tr):
        g.trace("u", g.bernoulli(0.5))

    def reflect(trace, fwd_choices, fwd_ret, p_args):
        x = trace["x"]
        new_tr, w, _, _ = sym_model.update(
            jr.key(0), trace, (), None, g.choicemap(("x", -x)))
        return new_tr, g.choicemap(("u", fwd_choices["u"])), w

    tr = sym_model.simulate(jr.key(1), ())
    x0 = float(np.asarray(tr["x"]))
    new_tr, accept = g.mh(jr.key(2), tr, dummy_prop, (), involution=reflect)
    # symmetric target + symmetric aux => acceptance weight 0 => accept
    assert bool(np.asarray(accept))
    np.testing.assert_allclose(float(np.asarray(new_tr["x"])), -x0,
                               atol=1e-6)


def test_check_observations_raises_under_jit():
    # ref: src/rejuvenate.jl:5,130 — check=True must verify observation
    # preservation; inside jit the raising debug callback surfaces the
    # violation as a runtime error instead of silently passing
    import jax
    import pytest

    @g.gen
    def xo_model():
        x = g.trace("x", g.normal(0.0, 1.0))
        g.trace("y", g.normal(x, 1.0))

    @g.gen
    def bad_proposal(tr):
        g.trace("y", g.normal(100.0, 0.01))  # perturbs the observation

    @g.gen
    def good_proposal(tr):
        g.trace("x", g.normal(0.0, 1.0))  # leaves the observation alone

    obs = g.choicemap(("y", 0.0))
    state = g.pf_initialize(jr.key(0), xo_model, (), obs, 8)

    from functools import partial

    @partial(jax.jit, static_argnums=2)
    def rejuv(state, key, proposal):
        # reweight moves unconditionally, so the bad proposal WILL clobber y
        return g.pf_rejuvenate(key, state, kern=g.move_reweight,
                               kern_args=(proposal, ()), method="reweight",
                               check=True, observations=obs).log_weights

    ok = np.asarray(rejuv(state, jr.key(1), good_proposal))
    assert ok.shape == (8,)
    with pytest.raises(Exception, match="was modified"):
        np.asarray(rejuv(state, jr.key(2), bad_proposal))
