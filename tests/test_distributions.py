"""Distribution logpdf correctness vs scipy and sampling moments."""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest
import scipy.stats as st

import genparticlefilters_tpu as g

CASES = [
    (g.normal(0.5, 2.0), st.norm(0.5, 2.0), 1.3),
    (g.uniform(-1.0, 3.0), st.uniform(-1.0, 4.0), 0.7),
    (g.exponential(2.0), st.expon(scale=0.5), 0.9),
    (g.gamma(2.5, 1.5), st.gamma(2.5, scale=1.5), 2.0),
    (g.beta(2.0, 3.0), st.beta(2.0, 3.0), 0.4),
    (g.lognormal(0.2, 0.6), st.lognorm(0.6, scale=np.exp(0.2)), 1.1),
    (g.laplace(0.0, 1.5), st.laplace(0.0, 1.5), -0.8),
    (g.cauchy(1.0, 2.0), st.cauchy(1.0, 2.0), 0.3),
    (g.student_t(4.0, 0.5, 1.2), st.t(4.0, 0.5, 1.2), 1.0),
    (g.poisson(3.5), st.poisson(3.5), 2),
    (g.geometric(0.3), st.geom(0.3, loc=-1), 4),
    (g.bernoulli(0.3), st.bernoulli(0.3), 1),
    (g.uniform_discrete(-2, 2), st.randint(-2, 3), 1),
]


@pytest.mark.parametrize("dist,ref,x", CASES,
                         ids=[type(c[0]).__name__ for c in CASES])
def test_logpdf_matches_scipy(dist, ref, x):
    got = float(dist.log_prob(jnp.asarray(x)))
    try:
        want = float(ref.logpdf(x))
    except AttributeError:
        want = float(ref.logpmf(x))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("dist,ref,_", CASES,
                         ids=[type(c[0]).__name__ for c in CASES])
def test_sampling_moments(dist, ref, _):
    if isinstance(dist, g.Cauchy):
        pytest.skip("Cauchy has no mean")
    keys = jr.split(jr.key(0), 20000)
    xs = jax.vmap(dist.sample)(keys)
    xs = np.asarray(xs, np.float64)
    m, v = ref.stats(moments="mv")
    np.testing.assert_allclose(xs.mean(), float(m),
                               atol=4 * np.sqrt(float(v) / 20000) + 1e-3)


def test_categorical():
    d = g.categorical(jnp.log(jnp.asarray([0.2, 0.3, 0.5])))
    np.testing.assert_allclose(float(d.log_prob(2)), np.log(0.5), rtol=1e-5)
    assert float(d.log_prob(3)) == -np.inf
    keys = jr.split(jr.key(0), 30000)
    xs = np.asarray(jax.vmap(d.sample)(keys))
    np.testing.assert_allclose(np.bincount(xs, minlength=3) / 30000,
                               [0.2, 0.3, 0.5], atol=0.02)


def test_mvnormal():
    cov = jnp.asarray([[2.0, 0.5], [0.5, 1.0]])
    loc = jnp.asarray([1.0, -1.0])
    d = g.mvnormal(loc, cov)
    x = jnp.asarray([0.3, 0.2])
    want = st.multivariate_normal(np.asarray(loc), np.asarray(cov)).logpdf(
        np.asarray(x))
    np.testing.assert_allclose(float(d.log_prob(x)), want, rtol=1e-5)
    d2 = g.mvnormal_diag(loc, jnp.asarray([1.4, 0.7]))
    want2 = (st.norm(1.0, 1.4).logpdf(0.3) + st.norm(-1.0, 0.7).logpdf(0.2))
    np.testing.assert_allclose(float(d2.log_prob(x)), want2, rtol=1e-5)


def test_factor_and_delta():
    f = g.factor(jnp.asarray(-3.25))
    assert float(f.log_prob(0.0)) == -3.25
    d = g.delta(jnp.asarray(2.0))
    assert float(d.log_prob(2.0)) == 0.0
    assert float(d.log_prob(1.0)) == -np.inf


def test_labeled_categorical():
    d = g.labeled_categorical(jnp.asarray([-2, 0, 5]),
                              jnp.asarray([0.1, 0.2, 0.7]))
    np.testing.assert_allclose(float(d.log_prob(5)), np.log(0.7), rtol=1e-5)
    assert float(d.log_prob(3)) == -np.inf
