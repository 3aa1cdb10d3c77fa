"""Shared test fixture: the line model (mirror of
/root/reference/test/runtests.jl:3-26, 0-based timesteps).

``slope ~ uniform_discrete(-2,2)``; per step t: ``x = t+1``,
``outlier ~ bernoulli(0.1)``, ``y ~ normal(x*slope, outlier ? 10 : 1)``.
Reference address ``:line => i => :y`` (1-based) is ``("line", i-1, "y")``
here (0-based).
"""

import math

import jax.numpy as jnp

import genparticlefilters_tpu as g

T_MAX = 10


@g.gen
def line_step(t, x, slope):
    x = x + 1.0
    outlier = g.trace("outlier", g.bernoulli(0.1))
    g.trace("y", g.normal(x * slope, jnp.where(outlier, 10.0, 1.0)))
    return x


line_step.batch_safe = True  # body is batch-polymorphic (elementwise only)
line_unfold = g.Unfold(line_step, T_MAX)


@g.gen
def line_model(n):
    slope = g.trace("slope", g.uniform_discrete(-2, 2))
    g.trace("line", line_unfold, (n, jnp.asarray(0.0, jnp.float32),
                                  slope.astype(jnp.float32)))
    return slope


line_model.batch_safe = True


def slope_choicemap(slope):
    return g.choicemap(("slope", slope))


def line_choicemap(n, slope=0.0):
    """Constrain y at steps 0..n-1 to (t+1)*slope
    (ref: test/runtests.jl:22-23)."""
    return g.choicemap(*[(("line", t, "y"), (t + 1) * slope)
                         for t in range(n)])


def outlier_choicemap(n, value):
    """Constrain outlier at step n-1 (ref: test/runtests.jl:25-26)."""
    return g.choicemap((("line", n - 1, "outlier"), value))


def lp_normal(x, mu, s):
    return -0.5 * ((x - mu) / s) ** 2 - math.log(s) - 0.5 * math.log(2 * math.pi)


def lp_bern(v, p):
    return math.log(p if v else 1.0 - p)
