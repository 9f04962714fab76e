import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu"); jax.config.update("jax_enable_x64", True)
import numpy as np
from latticeqcd_tpu.ops import fields, gauge_action as ga
from latticeqcd_tpu.updates import HMC
from latticeqcd_tpu.updates.heatbath import Heatbath

act = ga.wilson_gauge_action(3, 5.7)
key = jax.random.PRNGKey(7)
u = fields.hot_start((4,4,4,4), 3, seed=5)
hb = Heatbath(action=act, use_or=True, num_or=2)
for _ in range(20):
    u, key, _ = hb.update(u, key)
ps = []
for _ in range(40):
    u, key, _ = hb.update(u, key)
    ps.append(float(ga.mean_plaquette(u)))
print("HB :", np.mean(ps), "+-", np.std(ps)/len(ps)**.5)

hmc = HMC(action=act, dtau=1/15, md_steps=15)
u2 = fields.hot_start((4,4,4,4), 3, seed=6)
key2 = jax.random.PRNGKey(8)
for _ in range(20):
    u2, key2, _ = hmc.step(u2, key2)
ps2 = []
for _ in range(40):
    u2, key2, st = hmc.step(u2, key2)
    ps2.append(float(ga.mean_plaquette(u2)))
print("HMC:", np.mean(ps2), "+-", np.std(ps2)/len(ps2)**.5)
