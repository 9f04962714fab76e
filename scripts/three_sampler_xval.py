import os, sys
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
from latticeqcd_tpu.ops import fields, gauge_action as ga, sun
from latticeqcd_tpu.io import load_bridge_text
from latticeqcd_tpu.updates import HMC
from latticeqcd_tpu.updates.heatbath import Heatbath, _parity_masks

NC=3; BETA=5.7; LAT=(4,4,4,4)
act = ga.wilson_gauge_action(NC, BETA)
u0 = load_bridge_text("/root/reference/test/confs_HMC_L04040404_beta5.7_quenched_su3/conf_00000100.ildg.txt", LAT, 3)
masks = _parity_masks(LAT, (2,2,2,2), True)

@jax.jit
def metro_sweep(u, key, step):
    n_acc = 0.0; n_tot = 0.0
    for mu in range(4):
        for mask in masks:
            v = ga.staples(act, u, mu)
            key, k1, k2 = jax.random.split(key, 3)
            h = sun.random_hermitian_momentum(k1, u.shape[1:-2], NC, dtype=u.dtype)
            prop = jnp.matmul(sun.expi_hermitian(h, step), u[mu])
            w_old = (2.0/NC)*jnp.real(sun.trace(sun.mul(u[mu], v)))
            w_new = (2.0/NC)*jnp.real(sun.trace(sun.mul(prop, v)))
            r = jax.random.uniform(k2, w_old.shape)
            acc = jnp.logical_and(mask, jnp.exp(w_new - w_old) >= r)
            u = u.at[mu].set(jnp.where(acc[...,None,None], prop, u[mu]))
            n_acc += jnp.sum(acc); n_tot += jnp.sum(mask)
    return u, key, n_acc/n_tot

def run(name, stepfn, u, key, n_therm, n_meas):
    for _ in range(n_therm):
        u, key = stepfn(u, key)[:2]
    ps=[]
    for _ in range(n_meas):
        u, key = stepfn(u, key)[:2]
        ps.append(float(ga.mean_plaquette(u)))
    ps=np.array(ps)
    blocks = ps[:len(ps)//10*10].reshape(10,-1).mean(axis=1)
    print(f"{name:10s} <plaq> = {ps.mean():.5f} +- {blocks.std(ddof=1)/np.sqrt(10):.5f}  (n={len(ps)})")
    return ps

key = jax.random.PRNGKey(1)
hb = Heatbath(action=act)
run("HB", lambda u,k: hb.sweep(u,k), u0, key, 30, 200)

hbor = Heatbath(action=act, use_or=True, num_or=2)
run("HB+OR", lambda u,k: hbor.update(u,k)[:2], u0, key, 30, 200)

hmc = HMC(action=act, dtau=1/15, md_steps=15)
run("HMC", lambda u,k: hmc.step(u,k)[:2], u0, jax.random.PRNGKey(2), 30, 200)

ms = lambda u,k: metro_sweep(u,k,0.25)[:2]
# print metro acceptance once
_,_,a = metro_sweep(u0, jax.random.PRNGKey(5), 0.25); print("metro acc:", float(a))
run("Metro", ms, u0, jax.random.PRNGKey(3), 100, 400)
