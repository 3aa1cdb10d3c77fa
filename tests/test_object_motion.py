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
