import os, glob, sys
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, "/root/repo")
from latticeqcd_tpu.ops import gauge_action, sun
from latticeqcd_tpu.io.bridge_text import load_bridge_text

cases = [
    ("confs_HMC_L04040404_beta5.7_quenched_su2", (4,4,4,4), 2),
    ("confs_HMC_L04040404_beta5.7_quenched_su3", (4,4,4,4), 3),
    ("confs_HMC_L04040404_beta5.7_quenched_su4", (4,4,4,4), 4),
    ("confs_Heatbath_L04040404_beta5.7_quenched_su2", (4,4,4,4), 2),
    ("confs_Heatbath_L04040404_beta5.7_quenched_su3", (4,4,4,4), 3),
    ("confs_Heatbath_L04040404_beta5.7_quenched_su4", (4,4,4,4), 4),
    ("confs_HMC_L04040404_beta5.7_Wilson_kappa0.141139", (4,4,4,4), 3),
    ("confs_HMC_L04040404_beta5.7_Staggered_mass0.5", (4,4,4,4), 3),
    ("confs_HMC_L04040404_beta5.7_Staggered_mass0.5_Nf2", (4,4,4,4), 3),
    ("confs_HMC_L04040404_beta5.7_Staggered_mass0.5_Nf3", (4,4,4,4), 3),
    ("confs_HMC_L04040404_beta5.7_Domainwall", (4,4,2,2), 3),
]
for d, lat, nc in cases:
    files = sorted(glob.glob(f"/root/reference/test/{d}/*.txt"))
    u = load_bridge_text(files[0], lat, nc)
    plaq = float(gauge_action.mean_plaquette(u))
    unit = float(sun.unitarity_defect(u))
    print(f"{d:55s} {os.path.basename(files[0]):24s} nc={nc} plaq={plaq:.8f} unit={unit:.1e}")
