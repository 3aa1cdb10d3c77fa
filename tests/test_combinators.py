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
