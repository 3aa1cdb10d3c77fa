"""MapCombinator (plate) and Unfold edge-case tests."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

import genparticlefilters_tpu as g
from fixtures import lp_normal


@g.gen
def unit(t, mu):
    x = g.trace("x", g.normal(mu, 1.0))
    g.trace("y", g.normal(x, 0.5))
    return x


plate = g.MapCombinator(unit, 8)


def test_map_simulate_and_choices():
    tr = plate.simulate(jr.key(0), (jnp.arange(8), jnp.zeros(8)))
    xs = tr.get_choices()["x"]
    assert xs.shape == (8,)
    # score = sum of per-element site scores
    ys = tr.get_choices()["y"]
    expect = sum(lp_normal(float(x), 0.0, 1.0) + lp_normal(float(y), float(x), 0.5)
                 for x, y in zip(np.asarray(xs), np.asarray(ys)))
    np.testing.assert_allclose(float(tr.score), expect, rtol=1e-5)


def test_map_generate_weight():
    from genparticlefilters_tpu.core.choicemap import ChoiceMap, Entry
    ys = jnp.linspace(-1, 1, 8)
    constraints = ChoiceMap({("y",): Entry(ys, True)})
    tr, w = plate.generate(jr.key(1), (jnp.arange(8), jnp.zeros(8)),
                           constraints)
    xs = np.asarray(tr.get_choices()["x"])
    expect = sum(lp_normal(float(y), float(x), 0.5)
                 for x, y in zip(xs, np.asarray(ys)))
    np.testing.assert_allclose(float(w), expect, rtol=1e-4)


def test_map_update_and_regenerate():
    from genparticlefilters_tpu.core.choicemap import ChoiceMap, Entry
    tr = plate.simulate(jr.key(0), (jnp.arange(8), jnp.zeros(8)))
    new_ys = jnp.full((8,), 0.3)
    tr2, w, _, disc = plate.update(
        jr.key(1), tr, (jnp.arange(8), jnp.zeros(8)), None,
        ChoiceMap({("y",): Entry(new_ys, True)}))
    old_ys = np.asarray(tr.get_choices()["y"])
    xs = np.asarray(tr.get_choices()["x"])
    expect = sum(lp_normal(0.3, float(x), 0.5) - lp_normal(float(y), float(x), 0.5)
                 for x, y in zip(xs, old_ys))
    np.testing.assert_allclose(float(w), expect, rtol=1e-4)
    # discard holds old ys
    np.testing.assert_allclose(np.asarray(disc.resolve(("y",)).value),
                               old_ys, atol=1e-6)
    tr3, rw = plate.regenerate(jr.key(2), tr2,
                               (jnp.arange(8), jnp.zeros(8)), None,
                               g.select("x"))
    assert np.isfinite(float(rw))


def test_unfold_inside_gen_inside_pf():
    """Nested: DSL model wrapping Unfold wrapping DSL step — full pipeline."""
    @g.gen
    def step(t, x, drift):
        x = g.trace("x", g.normal(x + drift, 1.0))
        g.trace("y", g.normal(x, 1.0))
        return x

    chain = g.Unfold(step, 4)

    @g.gen
    def model(n):
        drift = g.trace("drift", g.normal(0.0, 1.0))
        g.trace("chain", chain, (n, jnp.float32(0.0), drift))
        return drift

    obs = g.choicemap(*[(("chain", t, "y"), 0.5) for t in range(3)])
    state = g.pf_initialize(jr.key(0), model, (3,), obs, 256)
    state = g.pf_resample(jr.key(1), state, "systematic", check=False)
    state = g.pf_rejuvenate(jr.key(2), state, g.mh, (g.select("drift"),))
    state = g.pf_update(jr.key(3), state, (4,), (g.UnknownChange(),),
                        g.choicemap((("chain", 3, "y"), 0.7)))
    assert bool(jnp.all(jnp.isfinite(state.log_weights)))
    m = float(g.mean(state, "drift"))
    assert np.isfinite(m)
    # posterior on drift should be pulled toward observations' implied drift
    assert abs(m) < 1.5


def test_map_batched_interpretation():
    """MapCombinator under batched interpretation: plate stacking lands at
    axis 1 (particle-major preserved), scores stay per-particle, and the
    batched trace is structurally identical to the vmapped one."""
    import copy
    from genparticlefilters_tpu.core.choicemap import ChoiceMap, Entry

    @g.gen
    def unit_b(t, mu):
        x = g.trace("x", g.normal(mu, 1.0))
        g.trace("y", g.normal(x, 0.5))
        return x

    unit_b.batch_safe = True
    plate_b = g.MapCombinator(unit_b, 8)

    @g.gen
    def model():
        g.trace("p", plate_b, (jnp.arange(8), jnp.zeros(8)))
        return 0.0

    model.batch_safe = True
    ys = jnp.linspace(-1, 1, 8)
    obs = ChoiceMap({("p", "y"): Entry(jnp.broadcast_to(ys, (8,)), True)})
    st = g.pf_initialize(jr.key(0), model, (), obs, 32)
    xs = g.batched_choice(st, ("p", "x"))
    assert xs.shape == (32, 8)
    assert st.log_weights.shape == (32,)

    unmarked = copy.copy(model)
    unmarked.batch_safe = False
    st_v = g.pf_initialize(jr.key(0), unmarked, (), obs, 32)
    # same pytree structure; per-leaf layout identical except (a) the
    # fully-constrained y site, stored SHARED plate-leading [8] batched vs
    # per-particle [32, 8] vmapped, and (b) the constant model retval
    # (shared scalar batched vs broadcast [32] vmapped)
    ch_b = st.traces.get_choices()
    ch_v = st_v.traces.get_choices()
    assert jnp.shape(ch_b.entries[("p", "y")].value) == (8,)
    assert jnp.shape(ch_v.entries[("p", "y")].value) == (32, 8)
    assert jnp.shape(ch_b.entries[("p", "x")].value) == (32, 8)
    assert jnp.shape(ch_v.entries[("p", "x")].value) == (32, 8)
    # fully-constrained weights are deterministic: both modes must agree
    # EXACTLY
    obs2 = ChoiceMap({
        ("p", "y"): Entry(jnp.broadcast_to(ys, (8,)), True),
        ("p", "x"): Entry(jnp.broadcast_to(jnp.linspace(-0.5, 0.5, 8),
                                           (8,)), True)})
    w_b = g.pf_initialize(jr.key(3), model, (), obs2, 4).log_weights
    w_v = g.pf_initialize(jr.key(3), unmarked, (), obs2, 4).log_weights
    np.testing.assert_allclose(np.asarray(w_b), np.asarray(w_v), atol=1e-5)

    # resampling gathers the plate leaves correctly
    st2 = g.pf_resample(jr.key(2), st, "systematic", check=False)
    xs2 = np.asarray(g.batched_choice(st2, ("p", "x")))
    np.testing.assert_allclose(xs2, np.asarray(xs)[np.asarray(st2.parents)],
                               atol=0)
