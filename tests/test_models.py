"""Model-family correctness (BASELINE configs 2-5): Kalman ground truth,
SV filter sanity, tempered-SMC LML vs quadrature, MOT posterior."""

import math

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

import genparticlefilters_tpu as g
from genparticlefilters_tpu.models.linear_gaussian import (
    LGParams, make_lgssm, kalman_filter, lgssm_particle_filter,
    synthesize_lg_data)
from genparticlefilters_tpu.models.stochastic_volatility import (
    SVParams, sv_particle_filter, synthesize_sv_data)
from genparticlefilters_tpu.models.tempered import (
    run_tempered_smc, tempered_log_z, MODES)
from genparticlefilters_tpu.models.multi_object import (
    MOTParams, mot_particle_filter, synthesize_mot_data)

T = 8


@pytest.mark.parametrize("method", ["systematic", "stratified"])
def test_lgssm_matches_kalman(method):
    """Config 2: SMC filtering mean/LML vs exact Kalman (10K particles)."""
    p = LGParams()
    y_obs = synthesize_lg_data(jr.key(0), T, p)
    mus, vars_, lml_exact = kalman_filter(y_obs, p)
    ests, lmls = [], []
    for s in range(3):
        st = jax.jit(lgssm_particle_filter,
                     static_argnums=(2, 3, 5))(jr.key(10 + s), y_obs, 10_000,
                                               T, p, method)
        ests.append(float(g.mean(st, (T - 1, "x"))))
        lmls.append(float(g.log_ml_estimate(st)))
    est, lml = np.mean(ests), np.mean(lmls)
    sd = math.sqrt(float(vars_[-1]))
    np.testing.assert_allclose(est, float(mus[-1]), atol=0.05 * sd + 0.02)
    np.testing.assert_allclose(lml, float(lml_exact), atol=0.05)
    # posterior variance too
    st = jax.jit(lgssm_particle_filter, static_argnums=(2, 3, 5))(
        jr.key(20), y_obs, 10_000, T, p, method)
    np.testing.assert_allclose(float(g.var(st, (T - 1, "x"))),
                               float(vars_[-1]), rtol=0.2)


def test_sv_filter_tracks_volatility():
    """Config 3: move-reweight rejuvenated SV filter produces finite
    weights, sane ESS, and volatility estimates correlated with |y|."""
    p = SVParams()
    y_obs = synthesize_sv_data(jr.key(1), T, p)
    st = jax.jit(sv_particle_filter, static_argnums=(2, 3))(
        jr.key(2), y_obs, 4000, T, p)
    assert bool(jnp.all(jnp.isfinite(st.log_weights)))
    ess = float(g.effective_sample_size(st))
    assert 1.0 <= ess <= 4000.0
    h_est = [float(g.mean(st, (t, "h"))) for t in range(T)]
    assert all(np.isfinite(h_est))
    assert float(g.var(st, (T - 1, "h"))) > 0


def test_tempered_smc_lml_and_modes():
    """Config 4: annealed SMC recovers log Z and both modes."""
    state, lml = jax.jit(run_tempered_smc, static_argnums=(1,))(
        jr.key(3), 4000)
    lz = float(tempered_log_z())
    np.testing.assert_allclose(float(lml), lz, atol=0.1)
    xs = np.asarray(g.batched_choice(state, "x"))
    w = np.asarray(g.get_norm_weights(state))
    # both modes populated
    m0 = w[(xs < 0)].sum()
    m1 = w[(xs >= 0)].sum()
    assert m0 > 0.05 and m1 > 0.05
    # particles concentrate near the modes
    near = (np.abs(xs[:, None] - np.array(MODES)) < 1.2).any(axis=1)
    assert w[near].sum() > 0.95


def test_mot_filter_posterior():
    """Config 5: MOT filter mean tracks the true object positions."""
    p = MOTParams(n_objects=3)
    y_obs = synthesize_mot_data(jr.key(4), T, p)
    st = jax.jit(mot_particle_filter, static_argnums=(2, 3, 4))(
        jr.key(5), y_obs, 4000, T, p)
    x_mean = np.asarray(g.mean(st, (T - 1, "x")))  # [K, 2]
    y_last = np.asarray(y_obs[T - 1])
    # posterior mean within a few observation stds of the last observation
    assert np.all(np.abs(x_mean - y_last) < 3 * p.r)
    # and online resizing works on this state
    st2 = g.pf_resize(jr.key(6), st, 2000, "residual")
    assert st2.n_particles == 2000
    np.testing.assert_allclose(float(g.log_ml_estimate(st2)),
                               float(g.log_ml_estimate(st)), atol=1e-3)


def test_mot_data_association():
    """MOT with unknown association: the filter must recover associations
    when objects are well separated."""
    from genparticlefilters_tpu.models.multi_object import (
        make_mot_da_model, mot_da_particle_filter, mot_obs_at_t)
    p = MOTParams(n_objects=3, q=0.05, r=0.1, s0=0.5)
    # well-separated, identity-anchored truth with a known association
    # permutation per step
    key = jr.key(7)
    x_true = jnp.asarray([[-4.0, 0.0], [0.0, 4.0], [4.0, -4.0]])
    T_ = 5
    perms = jnp.stack([jr.permutation(jr.fold_in(key, t), 3)
                       for t in range(T_)])
    y = x_true[perms] + 0.05 * jr.normal(jr.fold_in(key, 99), (T_, 3, 2))
    st = jax.jit(mot_da_particle_filter,
                 static_argnums=(2, 3, 4))(jr.key(8), y, 3000, T_, p,
                                           0.5, x_true)
    # posterior mode of assoc at the last step matches the generating perm
    assoc = np.asarray(g.batched_choice(st, (T_ - 1, "assoc")))  # [N, 3]
    w = np.asarray(g.get_norm_weights(st))
    for j in range(3):
        counts = np.zeros(3)
        for o in range(3):
            counts[o] = w[assoc[:, j] == o].sum()
        assert counts.argmax() == int(perms[T_ - 1][j]), (j, counts, perms)
