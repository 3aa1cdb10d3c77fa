"""SMCP³ with auxiliary branch randomness (mirror of
/root/reference/test/update.jl:122-177).

The reference's fwd kernel branches on an auxiliary flip (replace outliers
OR replace the slope). Data-dependent *structure* becomes masked constraint
entries here: both branches' proposals are sampled, and the transform emits
constraints whose presence masks are the (traced) flip — exercising mask
algebra through the whole translator/update/discard pipeline.
"""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

import genparticlefilters_tpu as g
from genparticlefilters_tpu.core.choicemap import ChoiceMap, Entry
from fixtures import line_model, line_choicemap, T_MAX


@g.gen
def fwd_kernel(tr):
    g.trace("flip", g.bernoulli(0.5))
    for i in range(5):
        g.trace(("outlier", i), g.bernoulli(0.0))
    g.trace("slope", g.uniform_discrete(0, 0))


@g.gen
def bwd_kernel(tr):
    g.trace("flip", g.bernoulli(0.5))
    for i in range(5):
        g.trace(("outlier", i), g.bernoulli(0.1))
    g.trace("slope", g.uniform_discrete(-2, 2))


def transform_fn(prev, fwd):
    flip = fwd["flip"]
    not_flip = jnp.logical_not(flip)
    entries = {("slope",): Entry(fwd["slope"], not_flip)}
    bwd_entries = {("flip",): Entry(flip, True),
                   ("slope",): Entry(prev["slope"], not_flip)}
    for i in range(5):
        entries[("line", i, "outlier")] = Entry(fwd[("outlier", i)], flip)
        bwd_entries[("outlier", i)] = Entry(
            prev.resolve(("line", i, "outlier")).value, flip)
    return ChoiceMap(entries), ChoiceMap(bwd_entries)


def test_smcp3_masked_branch_update():
    state = g.pf_initialize(jr.key(0), line_model, (5,), line_choicemap(5),
                            64)
    old_lw = np.asarray(state.log_weights)
    transform = g.TraceTransform(transform_fn)
    translator = g.UpdatingTraceTranslator(
        p_new_args=(5,), p_argdiffs=(g.UnknownChange(),),
        new_observations=g.EMPTY,
        q_forward=fwd_kernel, q_backward=bwd_kernel, transform=transform)
    state = g.pf_update(jr.key(1), state, translator=translator)
    # y observations preserved
    np.testing.assert_allclose(
        np.asarray(g.batched_choice(state, ("line", 4, "y"))), 0.0, atol=1e-5)
    # every particle either had its outliers replaced by False (flip) or its
    # slope replaced by 0 (not flip) — ref assertion test/update.jl:160-161
    slopes = np.asarray(g.batched_choice(state, "slope"))
    outl = np.asarray(g.batched_choice(state, ("line", "outlier")))[:, :5]
    assert np.all((~outl.any(axis=1)) | (slopes == 0))
    # weights moved
    assert np.all(np.asarray(state.log_weights) != old_lw)


def test_smcp3_masked_branch_stratified():
    # stratified version (ref test/update.jl:163-176): strata constrain the
    # outlier at step 4
    from fixtures import outlier_choicemap
    strata = [outlier_choicemap(5, False), outlier_choicemap(5, True)]
    state = g.pf_initialize(jr.key(0), line_model, (5,), line_choicemap(5),
                            64)
    transform = g.TraceTransform(transform_fn)
    translator = g.UpdatingTraceTranslator(
        p_new_args=(5,), p_argdiffs=(g.UnknownChange(),),
        new_observations=g.EMPTY,
        q_forward=fwd_kernel, q_backward=bwd_kernel, transform=transform)
    state = g.pf_update(jr.key(1), state, translator=translator,
                        strata=strata)
    outl4 = np.asarray(g.batched_choice(state, ("line", 4, "outlier")))
    # interleaved default layout: even slots False, odd slots True...
    # stratum constraints override the transform's masked writes wherever
    # the stratum mask is set
    assert not outl4[0::2].any()
    assert outl4[1::2].all()
