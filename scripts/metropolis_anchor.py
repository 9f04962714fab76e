import os, sys
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
from functools import partial
from latticeqcd_tpu.ops import fields, gauge_action as ga, sun
from latticeqcd_tpu.updates.heatbath import _parity_masks

NC=3; BETA=5.7; LAT=(4,4,4,4)
act = ga.wilson_gauge_action(NC, BETA)
masks = _parity_masks(LAT, (2,2,2,2), True)

@jax.jit
def metro_sweep(u, key, step):
    for mu in range(4):
        for mask in masks:
            v = ga.staples(act, u, mu)
            key, k1, k2 = jax.random.split(key, 3)
            h = sun.random_hermitian_momentum(k1, u.shape[1:-2], NC, dtype=u.dtype)
            prop = jnp.matmul(sun.expi_hermitian(h, step), u[mu])
            # local exponent: (2/NC) Re tr(U V); dS = -(2/NC) Re tr((U'-U)V)
            w_old = (2.0/NC)*jnp.real(sun.trace(sun.mul(u[mu], v)))
            w_new = (2.0/NC)*jnp.real(sun.trace(sun.mul(prop, v)))
            r = jax.random.uniform(k2, w_old.shape)
            acc = jnp.logical_and(mask, jnp.exp(w_new - w_old) >= r)
            u = u.at[mu].set(jnp.where(acc[...,None,None], prop, u[mu]))
    return u, key

u = fields.hot_start(LAT, NC, seed=9)
key = jax.random.PRNGKey(42)
step = 0.35
for _ in range(60):
    u, key = metro_sweep(u, key, step)
ps=[]
for i in range(300):
    u, key = metro_sweep(u, key, step)
    ps.append(float(ga.mean_plaquette(u)))
ps=np.array(ps)
print("Metropolis <plaq> =", ps.mean(), "+-", ps.std()/np.sqrt(len(ps)/5))
