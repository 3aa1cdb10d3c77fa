"""Tempered SMC over a model sequence (BASELINE config 4).

A static latent with a multimodal likelihood, annealed from the prior
(β=0) to the posterior (β=1) through a geometric inverse-temperature
schedule. The model-sequence move is an args-``update`` whose incremental
weight is exactly Δβ·loglik via a :class:`~..core.distributions.Factor`
site — the pattern the reference realizes with
``UpdatingTraceTranslator``s (SMC-across-models, SURVEY.md C13); SMCP³
auxiliary-variable moves compose via ``pf_update(translator=...)``.

Ground truth: the normalizing constant Z(β=1) = ∫ prior·lik dx is computed
by quadrature, so the SMC LML estimate is exactly checkable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.random as jr
from jax.scipy.special import logsumexp

from ..core import gen, trace, normal, factor, select
from ..smc import pf_rejuvenate, mh
from ..smc.algorithms import tempered_smc

__all__ = ["make_tempered_model", "tempered_loglik", "run_tempered_smc",
           "tempered_log_z"]

PRIOR_LOC, PRIOR_SCALE = 0.0, 3.0
MODES = (-2.0, 2.5)
MODE_SCALE = 0.35


def tempered_loglik(x):
    """Bimodal likelihood: mixture of two narrow Gaussians."""
    comps = jnp.stack([
        -0.5 * ((x - m) / MODE_SCALE) ** 2
        - jnp.log(MODE_SCALE * jnp.sqrt(2.0 * jnp.pi))
        for m in MODES])
    return logsumexp(comps, axis=0) - jnp.log(float(len(MODES)))


def make_tempered_model():
    @gen
    def model(beta):
        x = trace("x", normal(PRIOR_LOC, PRIOR_SCALE))
        trace("lik", factor(beta * tempered_loglik(x)))
        return x

    model.batch_safe = True
    return model


def tempered_log_z(n_grid: int = 20001, lo=-15.0, hi=15.0):
    """Quadrature ground truth for log Z(β=1)."""
    xs = jnp.linspace(lo, hi, n_grid)
    lp = (-0.5 * ((xs - PRIOR_LOC) / PRIOR_SCALE) ** 2
          - jnp.log(PRIOR_SCALE * jnp.sqrt(2.0 * jnp.pi))
          + tempered_loglik(xs))
    dx = (hi - lo) / (n_grid - 1)
    return logsumexp(lp) + jnp.log(dx)


def run_tempered_smc(key, n_particles: int, n_temps: int = 50,
                     rejuv_iters: int = 2):
    model = make_tempered_model()
    betas = jnp.linspace(0.0, 1.0, n_temps) ** 2  # slow start

    def rejuvenate(key, state, beta):
        return pf_rejuvenate(key, state, mh, (select("x"),),
                             n_iters=rejuv_iters)

    return tempered_smc(key, model, betas, n_particles,
                        rejuvenate_fn=rejuvenate, ess_frac=0.75)
