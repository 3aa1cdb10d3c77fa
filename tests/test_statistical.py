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


@pytest.mark.parametrize("parent_fn", [
    lambda k, w: multinomial_parents(k, w),
    lambda k, w: residual_parents(k, w),
    lambda k, w: stratified_parents(k, w),
    lambda k, w: systematic_parents(k, w),
], ids=["multinomial", "residual", "stratified", "systematic"])
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
