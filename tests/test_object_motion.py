"""End-to-end correctness: README object-motion filter vs exact enumeration
(BASELINE config 1; posterior targets per /root/reference/README.md:97-104)."""

import itertools
import math

import jax.random as jr
import numpy as np

import genparticlefilters_tpu as g
from genparticlefilters_tpu.models.object_motion import (
    synthesize_data, object_motion_filter)

T = 6


def _exact_posterior(yo):
    """Enumerate 2^T moving-paths; per-path scalar Kalman filter."""
    def path_loglik(m):
        mu, var, ll = 0.0, 0.0, 0.0
        for t in range(T):
            v = math.sin(t + 1) if m[t] else 0.0
            mu, var = mu + v, var + 0.01 ** 2
            S = var + 0.25 ** 2
            ll += -0.5 * ((yo[t] - mu) ** 2 / S) - 0.5 * math.log(
                2 * math.pi * S)
            K = var / S
            mu, var = mu + K * (yo[t] - mu), var * (1 - K)
        return ll

    def path_logprior(m):
        lp, prev = 0.0, False
        for t in range(T):
            p = 0.75 if prev else 0.25
            lp += math.log(p) if m[t] else math.log(1 - p)
            prev = m[t]
        return lp

    paths = list(itertools.product([False, True], repeat=T))
    lj = np.array([path_loglik(m) + path_logprior(m) for m in paths])
    w = np.exp(lj - lj.max())
    w /= w.sum()
    post = np.zeros(T)
    for wi, m in zip(w, paths):
        post += wi * np.array(m)
    lml = np.log(np.sum(np.exp(lj - lj.max()))) + lj.max()
    return post, lml


def test_object_motion_matches_exact_posterior():
    y_obs, _ = synthesize_data(jr.key(42), T, 3)
    yo = np.asarray(y_obs, np.float64)
    post, lml = _exact_posterior(yo)

    res, lmls = [], []
    for s in range(4):
        st = object_motion_filter(jr.key(100 + s), y_obs, 1500, T)
        res.append([float(g.mean(st, (t, "moving"))) for t in range(T)])
        lmls.append(float(g.log_ml_estimate(st)))
    res = np.array(res)
    est = res.mean(0)
    stderr = res.std(0) / np.sqrt(len(res)) + 1e-3
    # every timestep within 6 stderr (+ small abs slack) of exact
    assert np.all(np.abs(est - post) < 6 * stderr + 0.03), (est, post)
    assert abs(np.mean(lmls) - lml) < 0.2, (np.mean(lmls), lml)


def test_reference_readme_parity():
    """Pin the framework side of docs/reference_parity.md: at the
    reference's exact README settings (100 particles, residual resampling
    + MH rejuvenation, ESS 0.5, still-5-then-moving-5 data,
    /root/reference/README.md:85-104) the replicate mean of
    P(moving @ t=6) must match the exact enumeration posterior within MC
    error, and P(moving @ t=5) must match its (essentially zero) exact
    value — the reference's published 0.07 there is single-run particle
    noise (see scripts/reference_parity.py)."""
    import jax

    T10, switch, n_part, n_runs = 10, 5, 100, 32
    y_obs, _ = synthesize_data(jr.key(1000), T10, switch)

    def _exact10(yo):
        def path_loglik(m):
            mu, var, ll = 0.0, 0.0, 0.0
            for t in range(T10):
                v = math.sin(t + 1) if m[t] else 0.0
                mu, var = mu + v, var + 0.01 ** 2
                S = var + 0.25 ** 2
                ll += -0.5 * ((yo[t] - mu) ** 2 / S) - 0.5 * math.log(
                    2 * math.pi * S)
                mu, var = mu + (var / S) * (yo[t] - mu), var * (1 - var / S)
            return ll

        def path_logprior(m):
            lp, prev = 0.0, False
            for t in range(T10):
                p = 0.75 if prev else 0.25
                lp += math.log(p) if m[t] else math.log(1 - p)
                prev = m[t]
            return lp

        paths = list(itertools.product([False, True], repeat=T10))
        lj = np.array([path_loglik(m) + path_logprior(m) for m in paths])
        w = np.exp(lj - lj.max())
        w /= w.sum()
        return sum(wi * np.array(m) for wi, m in zip(w, paths))

    post = _exact10(np.asarray(y_obs, np.float64))
    filt = jax.jit(jax.vmap(object_motion_filter,
                            in_axes=(0, None, None, None)),
                   static_argnums=(2, 3))
    states = filt(jr.split(jr.key(7), n_runs), y_obs, n_part, T10)
    m5 = np.asarray(jax.vmap(lambda s: g.mean(s, (4, "moving")))(states))
    m6 = np.asarray(jax.vmap(lambda s: g.mean(s, (5, "moving")))(states))
    se6 = m6.std() / math.sqrt(n_runs) + 1e-3
    assert abs(m6.mean() - post[5]) < 4 * se6 + 0.03, (m6.mean(), post[5])
    assert abs(m5.mean() - post[4]) < 0.02, (m5.mean(), post[4])
