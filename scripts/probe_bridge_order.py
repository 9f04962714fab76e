import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp, sys
sys.path.insert(0, "/root/repo")
from latticeqcd_tpu.ops import gauge_action, sun

fn = "/root/reference/test/confs_HMC_L04040404_beta5.7_quenched_su3/conf_00000100.ildg.txt"
nc = 3
data = np.loadtxt(fn)
cplx = data[0::2] + 1j*data[1::2]

for site_order in ("t_slow", "x_slow"):
    for cm in ("rowmajor", "colmajor"):
        if site_order == "t_slow":
            arr = cplx.reshape(4,4,4,4,4,nc,nc)  # t,z,y,x,mu,a,b
            u = np.transpose(arr, (4,3,2,1,0,5,6))
        else:
            arr = cplx.reshape(4,4,4,4,4,nc,nc)  # x,y,z,t,mu,a,b
            u = np.transpose(arr, (4,0,1,2,3,5,6))
        if cm == "colmajor":
            u = np.swapaxes(u, -1, -2)
        uj = jnp.asarray(u)
        unit = float(sun.unitarity_defect(uj))
        det = np.linalg.det(np.asarray(uj).reshape(-1,nc,nc))
        detdev = np.max(np.abs(det-1))
        plaq = float(gauge_action.mean_plaquette(uj))
        print(f"{site_order:7s} {cm:9s} unit_defect={unit:.2e} det_dev={detdev:.2e} plaq={plaq:+.6f}")
