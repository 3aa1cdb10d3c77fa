import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")

import math
import jax.numpy as jnp, jax.random as jr
import genparticlefilters_tpu as g

@g.gen
def line_step(t, x, slope):
    x = x + 1.0
    outlier = g.trace("outlier", g.bernoulli(0.1))
    y = g.trace("y", g.normal(x * slope, jnp.where(outlier, 10.0, 1.0)))
    return x

T = 6
line_unfold = g.Unfold(line_step, T)

@g.gen
def line_model(n):
    slope = g.trace("slope", g.uniform_discrete(-2, 2))
    line = g.trace("line", line_unfold, (n, 0.0, slope.astype(jnp.float32)))
    return line

key = jr.key(0)
tr = line_model.simulate(key, (3,))
print("score", tr.score)
ch = tr.get_choices()
print("slope", ch["slope"])
print("line y", ch[("line","y")], "mask", ch.get_mask(("line","y")))
print("addr int:", tr[("line", 1, "y")])

obs = g.choicemap((("line",0,"y"), 0.0), (("line",1,"y"), 0.0), ("slope", 0))
tr2, w = line_model.generate(jr.key(1), (2,), obs)
print("gen weight", w)
outl = tr2.get_choices()[("line","outlier")]
def lpnorm(x, mu, s): return -0.5*((x-mu)/s)**2 - math.log(s) - 0.5*math.log(2*math.pi)
expect = math.log(1/5)
for t in range(2):
    s = 10.0 if bool(outl[t]) else 1.0
    expect += lpnorm(0.0, 0.0, s)
print("expect", expect)

obs3 = g.choicemap(((("line"),2,("y")), 0.5))
tr3, w3, _, disc = g.update(jr.key(2), tr2, (3,), (g.UnknownChange(),), obs3)
print("update weight", w3, "disc any:", disc.total_mask_any())
outl3 = tr3.get_choices()[("line","outlier")]
s = 10.0 if bool(outl3[2]) else 1.0
print("expect update w", lpnorm(0.5, 0.0, s))

newtr, rw = g.regenerate(jr.key(3), tr3, (3,), (g.NoChange(),), g.select("slope"))
print("regen weight", rw, "new slope", newtr.get_choices()["slope"])

# vmap over particles
gen_v = jax.jit(jax.vmap(lambda k: line_model.generate(k, (2,), obs)))
trs, ws = gen_v(jr.split(jr.key(9), 16))
print("vmapped weights shape", ws.shape, "scores", trs.score.shape)
