"""Statistical soundness: LML unbiasedness and resampling properties."""

import math

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

import genparticlefilters_tpu as g
from genparticlefilters_tpu.smc.resample import (
    counts_to_parents, systematic_parents, stratified_parents,
    residual_parents, multinomial_parents)


def test_counts_to_parents_properties():
    key = jr.key(0)
    for i in range(20):
        n = 64
        w = jr.dirichlet(jr.fold_in(key, i), jnp.ones(n) * 0.3)
        parents = systematic_parents(jr.fold_in(key, 100 + i), w)
        p = np.asarray(parents)
        # sorted (non-decreasing) and in range
        assert (np.diff(p) >= 0).all()
        assert p.min() >= 0 and p.max() < n
        # offspring counts within 1 of n*w (systematic guarantee)
        counts = np.bincount(p, minlength=n)
        np.testing.assert_array_less(np.abs(counts - n * np.asarray(w)),
                                     1.0 + 1e-5)


def _F_parents(F_fn):
    from genparticlefilters_tpu.smc.resample import _F_to_parents

    def fn(k, w):
        return _F_to_parents(F_fn(k, w), w.shape[0])
    return fn


def _mn_F(k, w):
    from genparticlefilters_tpu.smc.resample import multinomial_F
    return _F_parents(multinomial_F)(k, w)


def _res_F(k, w):
    from genparticlefilters_tpu.smc.resample import residual_F
    return _F_parents(residual_F)(k, w)


@pytest.mark.parametrize("parent_fn", [
    lambda k, w: multinomial_parents(k, w),
    lambda k, w: residual_parents(k, w),
    lambda k, w: stratified_parents(k, w),
    lambda k, w: systematic_parents(k, w),
    _mn_F,
    _res_F,
], ids=["multinomial", "residual", "stratified", "systematic",
        "multinomial_F", "residual_F"])
def test_resampling_unbiased_counts(parent_fn):
    """E[offspring counts] = n * w for every method."""
    n = 32
    w = np.asarray(jr.dirichlet(jr.key(5), jnp.ones(n)), np.float64)
    w_j = jnp.asarray(w, jnp.float32)
    total = np.zeros(n)
    reps = 400
    fn = jax.jit(parent_fn)
    for i in range(reps):
        p = np.asarray(fn(jr.key(i), w_j))
        total += np.bincount(p, minlength=n)
    avg = total / reps
    stderr = np.sqrt(n * w * (1 - w) / reps) + 1e-3
    assert np.all(np.abs(avg - n * w) < 6 * stderr + 0.05), (
        np.abs(avg - n * w) / stderr)


def test_residual_F_min_copies():
    """residual_F preserves the ≥⌊n·w⌋ deterministic-copy guarantee
    (ref: src/resample.jl:96-106) in clustered slot order."""
    n = 64
    for i in range(10):
        w = jr.dirichlet(jr.fold_in(jr.key(9), i), jnp.ones(n) * 0.5)
        p = np.asarray(_res_F(jr.fold_in(jr.key(10), i), w))
        assert (np.diff(p) >= 0).all() and p.min() >= 0 and p.max() < n
        counts = np.bincount(p, minlength=n)
        assert (counts >= np.floor(n * np.asarray(w))).all()


def test_lml_unbiasedness():
    """E[exp(LML_hat)] = Z: the SMC marginal-likelihood estimator is
    unbiased (with resampling in the loop), checked against the exact
    Kalman evidence."""
    from genparticlefilters_tpu.models.linear_gaussian import (
        LGParams, kalman_filter, lgssm_particle_filter, synthesize_lg_data)
    p = LGParams(a=0.7, q=0.6, r=0.5)
    T = 5
    y = synthesize_lg_data(jr.key(0), T, p)
    _, _, lml_exact = kalman_filter(y, p)
    f = jax.jit(lgssm_particle_filter, static_argnums=(2, 3, 5))
    lmls = []
    for s in range(60):
        st = f(jr.key(100 + s), y, 256, T, p, "systematic")
        lmls.append(float(g.log_ml_estimate(st)))
    lmls = np.asarray(lmls, np.float64)
    z_hat = np.exp(lmls - float(lml_exact))  # should have mean 1
    stderr = z_hat.std() / np.sqrt(len(z_hat))
    assert abs(z_hat.mean() - 1.0) < 4 * stderr + 0.05, (
        z_hat.mean(), stderr)
