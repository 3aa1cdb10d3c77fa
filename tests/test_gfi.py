"""Core GFI unit tests: exact weights for simulate/generate/update/
regenerate on the line fixture (spec: Gen GFI contract, SURVEY.md §1 L0)."""

import math

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

import genparticlefilters_tpu as g
from fixtures import line_model, lp_normal, lp_bern


def test_generate_weight_exact():
    obs = g.choicemap((("line", 0, "y"), 0.0), (("line", 1, "y"), 0.0),
                      ("slope", 0))
    tr, w = line_model.generate(jr.key(1), (2,), obs)
    outl = np.asarray(tr.get_choices()[("line", "outlier")])
    expected = math.log(1 / 5)
    for t in range(2):
        s = 10.0 if outl[t] else 1.0
        expected += lp_normal(0.0, 0.0, s)
    np.testing.assert_allclose(float(w), expected, atol=1e-4)


def test_update_extension_weight_exact():
    obs = g.choicemap((("line", 0, "y"), 0.0), ("slope", 0))
    tr, _ = line_model.generate(jr.key(1), (1,), obs)
    obs2 = g.choicemap((("line", 1, "y"), 0.5))
    tr2, w, _, disc = g.update(jr.key(2), tr, (2,), (g.UnknownChange(),), obs2)
    assert not bool(disc.total_mask_any())
    outl = bool(np.asarray(tr2.get_choices()[("line", 1, "outlier")]))
    s = 10.0 if outl else 1.0
    np.testing.assert_allclose(float(w), lp_normal(0.5, 0.0, s), atol=1e-4)
    # score additivity: new score = old + new-step sites
    d = float(tr2.score - tr.score)
    expected_d = lp_bern(outl, 0.1) + lp_normal(0.5, 0.0, s)
    np.testing.assert_allclose(d, expected_d, atol=1e-4)


def test_update_overwrite_discard():
    obs = g.choicemap((("line", 0, "y"), 0.0), ("slope", 0))
    tr, _ = line_model.generate(jr.key(1), (1,), obs)
    # overwrite the y at step 0 -> discard must contain the old value
    obs2 = g.choicemap((("line", 0, "y"), 3.0))
    tr2, w, _, disc = g.update(jr.key(2), tr, (1,), (g.UnknownChange(),), obs2)
    assert bool(disc.total_mask_any())
    e = disc.resolve(("line", 0, "y"))
    assert e is not None
    np.testing.assert_allclose(float(np.asarray(e.value)), 0.0, atol=1e-6)
    outl = bool(np.asarray(tr2.get_choices()[("line", 0, "outlier")]))
    s = 10.0 if outl else 1.0
    np.testing.assert_allclose(
        float(w), lp_normal(3.0, 0.0, s) - lp_normal(0.0, 0.0, s), atol=1e-4)


def test_update_shrink_discards_steps():
    obs = g.choicemap((("line", 0, "y"), 0.0), (("line", 1, "y"), 1.0),
                      ("slope", 0))
    tr, _ = line_model.generate(jr.key(1), (2,), obs)
    tr2, w, _, disc = g.update(jr.key(2), tr, (1,), (g.UnknownChange(),),
                               g.EMPTY)
    e = disc.resolve(("line", 1, "y"))
    assert e is not None and bool(np.asarray(e.mask))
    np.testing.assert_allclose(float(np.asarray(e.value)), 1.0, atol=1e-6)
    # step-0 entries not discarded
    e0 = disc.resolve(("line", 0, "y"))
    assert not bool(np.asarray(e0.mask))


def test_regenerate_weight_exact():
    """Regenerating slope: weight = Σ_y [lp(y|new slope) − lp(y|old slope)]."""
    obs = g.choicemap((("line", 0, "y"), 1.0), (("line", 1, "y"), 2.0))
    tr, _ = line_model.generate(jr.key(3), (2,), obs)
    old_slope = float(np.asarray(tr["slope"]))
    outl = np.asarray(tr.get_choices()[("line", "outlier")])
    for i in range(20):
        tr2, w = g.regenerate(jr.key(i), tr, (2,), (g.NoChange(),),
                              g.select("slope"))
        new_slope = float(np.asarray(tr2["slope"]))
        expected = 0.0
        for t, y in enumerate([1.0, 2.0]):
            s = 10.0 if outl[t] else 1.0
            x = t + 1.0
            expected += (lp_normal(y, x * new_slope, s)
                         - lp_normal(y, x * old_slope, s))
        np.testing.assert_allclose(float(w), expected, atol=1e-4)


def test_assess_matches_score():
    tr = line_model.simulate(jr.key(5), (3,))
    choices = tr.get_choices()
    _, score = line_model.assess((3,), choices)
    np.testing.assert_allclose(float(score), float(tr.score), atol=1e-4)


def test_propose_consistency():
    choices, score, _ = line_model.propose(jr.key(6), (2,))
    _, score2 = line_model.assess((2,), choices)
    np.testing.assert_allclose(float(score), float(score2), atol=1e-4)


def test_vmap_jit_composition():
    obs = g.choicemap((("line", 0, "y"), 0.0))

    @jax.jit
    def batch_gen(keys):
        return jax.vmap(lambda k: line_model.generate(k, (1,), obs))(keys)

    trs, ws = batch_gen(jr.split(jr.key(0), 32))
    assert ws.shape == (32,)
    assert trs.score.shape == (32,)


def test_windowed_regenerate_matches_full():
    """window=k regenerate on Unfold is exact when the selection only
    touches the last k active steps; also propagates through a wrapping
    @gen model."""
    obs = g.choicemap(*[(("line", t, "y"), 0.5 * t) for t in range(5)])
    tr, _ = line_model.generate(jr.key(0), (5,), obs)
    steps = jnp.arange(10)
    mask = (steps == 3) | (steps == 4)
    sel = g.Selection({("line", "outlier"): mask, ("line", "y"): mask})
    full, wf = g.regenerate(jr.key(7), tr, (5,), (g.NoChange(),), sel)
    fast, ww = g.regenerate(jr.key(7), tr, (5,), (g.NoChange(),), sel,
                            window=2)
    np.testing.assert_allclose(float(wf), float(ww), atol=1e-4)
    np.testing.assert_allclose(float(full.score), float(fast.score),
                               atol=1e-4)
    cf, cw = full.get_choices(), fast.get_choices()
    for k in cf.entries:
        a, b = np.asarray(cf[k]), np.asarray(cw[k])
        ma = np.asarray(cf.get_mask(k))
        np.testing.assert_allclose(np.where(ma, a.astype(float), 0),
                                   np.where(ma, b.astype(float), 0),
                                   atol=1e-5)


def test_extend_through_nested_model():
    """Extend argdiffs reach the Unfold inside a wrapping @gen model and
    produce results identical to a full re-execution."""
    from fixtures import line_choicemap
    tr, _ = line_model.generate(jr.key(0), (2,), line_choicemap(2))
    obs = g.choicemap((("line", 2, "y"), 0.5))
    slow, ws, _, _ = g.update(jr.key(5), tr, (3,), (g.UnknownChange(),), obs)
    fast, wf, _, _ = g.update(jr.key(5), tr, (3,), (g.Extend(1),), obs)
    np.testing.assert_allclose(float(ws), float(wf), atol=1e-5)
    np.testing.assert_allclose(float(slow.score), float(fast.score),
                               atol=1e-5)
    cs, cf = slow.get_choices(), fast.get_choices()
    for k in cs.entries:
        a, b = np.asarray(cs[k]), np.asarray(cf[k])
        ma = np.asarray(cs.get_mask(k))
        np.testing.assert_array_equal(ma, np.asarray(cf.get_mask(k)))
        np.testing.assert_allclose(np.where(ma, a.astype(float), 0),
                                   np.where(ma, b.astype(float), 0),
                                   atol=1e-5)


def test_extend_does_not_corrupt_sibling_unfolds():
    """A fixed-length sibling Unfold must be untouched by Extend targeted
    at another sub-call (code-review regression: blind propagation appended
    phantom steps to every combinator)."""
    @g.gen
    def step(t, x):
        return g.trace("x", g.normal(x, 1.0))

    grow = g.Unfold(step, 6)
    fixed = g.Unfold(step, 5)

    @g.gen
    def model(n):
        g.trace("grow", grow, (n, jnp.float32(0.0)))
        g.trace("fix", fixed, (5, jnp.float32(0.0)))

    tr, _ = model.generate(jr.key(0), (2,))
    obs = g.choicemap((("grow", 2, "x"), 0.3))
    fast, wf, _, _ = g.update(jr.key(1), tr, (3,),
                              (g.Extend(1, at="grow"),), obs)
    slow, ws, _, _ = g.update(jr.key(1), tr, (3,), (g.UnknownChange(),), obs)
    np.testing.assert_allclose(float(wf), float(ws), atol=1e-5)
    np.testing.assert_allclose(float(fast.score), float(slow.score),
                               atol=1e-5)
    # the fixed chain's choices and score are bit-identical to the original
    np.testing.assert_array_equal(
        np.asarray(fast.get_choices()[("fix", "x")]),
        np.asarray(tr.get_choices()[("fix", "x")]))
    # a follow-up no-op update must report zero weight (score consistency)
    noop, w0, _, _ = g.update(jr.key(2), fast, (3,), (g.UnknownChange(),),
                              g.EMPTY)
    np.testing.assert_allclose(float(w0), 0.0, atol=1e-4)


def test_regenerate_structurally_new_site():
    """Regenerate a trace under a model with an extra site (model-sequence
    SMC): the old-absent site is freshly sampled, its lp cancels in the
    weight, and the forced old-logp pass contributes 0 for it instead of
    raising."""
    @g.gen
    def m1():
        g.trace("a", g.normal(0.0, 1.0))

    @g.gen
    def m2():
        g.trace("a", g.normal(0.0, 1.0))
        g.trace("extra", g.normal(2.0, 1.0))

    tr, _ = m1.generate(jr.key(0), (), g.choicemap(("a", 0.5)))
    sel = g.Selection({("a",): True})
    new_tr, sel_new, sel_old = m2._regenerate(jr.key(1), tr, (), sel)
    a_new = float(new_tr.get_choices()["a"])
    ex = float(new_tr.get_choices()["extra"])
    lp_a_new = lp_normal(a_new, 0.0, 1.0)
    lp_ex = lp_normal(ex, 2.0, 1.0)
    # new score covers both sites; sel_new = resampled a + fresh extra;
    # sel_old = old lp of a only (extra absent from the old trace)
    np.testing.assert_allclose(float(new_tr.score), lp_a_new + lp_ex,
                               atol=1e-5)
    np.testing.assert_allclose(float(sel_new), lp_a_new + lp_ex, atol=1e-5)
    np.testing.assert_allclose(float(sel_old), lp_normal(0.5, 0.0, 1.0),
                               atol=1e-5)
