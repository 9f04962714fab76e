"""complex64-vs-complex128 sampling-bias evidence (VERDICT r2 weak #6).

The TPU path runs complex64 with the CG tolerance clamped to a
relative |r|^2 of 2.5e-13 (ops/solvers.py _effective_eps), while the
CPU/f64 path honors the reference's eps_CG = 1e-19. This script
quantifies what that clamp does to the sampled measure:

* <dH> and acceptance over N trajectories (exactness of HMC needs
  <exp(-dH)> = 1; a biased solver shows up as a dH offset),
* reversibility: relative link error after integrating forward and
  back with negated momentum (the clamped CG makes the force slightly
  non-conservative; reversibility drift is the direct measure).

Runs BOTH dtypes on the same backend with the same trajectory keys so
the comparison isolates precision. CPU-runnable (fast lanes only).

Usage: python scripts/c64_bias.py [--cpu] [--traj N]
Prints one JSON line per (workload, dtype).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax  # noqa: E402

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from latticeqcd_tpu.io import load_bridge_text  # noqa: E402
from latticeqcd_tpu.md import integrators  # noqa: E402
from latticeqcd_tpu.ops import fields, gauge_action as ga, sun  # noqa: E402
from latticeqcd_tpu.ops.dirac.staggered import StaggeredDirac  # noqa: E402
from latticeqcd_tpu.ops.dirac.wilson import WilsonDirac  # noqa: E402
from latticeqcd_tpu.ops.fermion_action import (  # noqa: E402
    StaggeredFermiAction,
    WilsonFermiAction,
)
from latticeqcd_tpu.updates import HMC  # noqa: E402

REF_CONF = (
    "/root/reference/test/confs_HMC_L04040404_beta5.7_Wilson_kappa0.141139/"
    "conf_00000100.ildg.txt"
)


def _workload(name, dtype):
    """-> (u0, hmc). eps_CG = the reference 1e-19; the c64 clamp engages
    automatically inside the solvers."""
    if name == "wilson4":
        u = load_bridge_text(REF_CONF, (4, 4, 4, 4), 3, dtype=dtype)
        fa = WilsonFermiAction(
            WilsonDirac(kappa=0.141139, r=1.0), eps_cg=1e-19, max_cg=3000
        )
        hmc = HMC(action=ga.wilson_gauge_action(3, 6.0), dtau=0.1, md_steps=10,
                  fermi_action=fa, staged=False)
        return u, hmc
    if name == "staggered8":
        u = fields.hot_start((8, 8, 8, 8), 3, seed=2, dtype=dtype)
        fa = StaggeredFermiAction(
            StaggeredDirac(mass=0.5, lattice=(8, 8, 8, 8)), nf=4,
            eps_cg=1e-19, max_cg=3000,
        )
        # dtau sized for O(1) dH from a hot start (0.05 gave dH ~ 33,
        # acceptance 0 — a frozen chain is weak bias evidence)
        hmc = HMC(action=ga.wilson_gauge_action(3, 5.7), dtau=0.02, md_steps=10,
                  fermi_action=fa, staged=False)
        return u, hmc
    raise ValueError(name)


def run(name, dtype, n_traj, n_therm=4):
    u, hmc = _workload(name, dtype)
    key = jax.random.PRNGKey(111)
    for _ in range(n_therm):  # discard: hot-start equilibration spikes
        u, key, _ = hmc.step(u, key)
    dhs, n_acc = [], 0
    for _ in range(n_traj):
        u, key, st = hmc.step(u, key)
        dhs.append(float(st["dH"]))
        n_acc += int(st["accepted"])
    dhs = np.asarray(dhs)

    # reversibility: forward + reverse MD from the final configuration
    nc = hmc.action.nc
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    h = sun.random_hermitian_momentum(k1, u.shape[:-2], nc, dtype=u.dtype)
    _, eta = hmc.fermi_action.sample_pseudofermion(u, k2)
    force_g = lambda uu: ga.force(hmc.action, uu)
    force_f = lambda uu: hmc.fermi_action.force(uu, eta)

    def md(u0, h0):
        return integrators.run_md(u0, h0, force_g, hmc.dtau, hmc.md_steps,
                                  force_fermion=force_f, scheme=hmc.scheme)

    u_f, h_f = md(u, h)
    u_b, h_b = md(u_f, -h_f)
    rev_u = float(jnp.max(jnp.abs(u_b - u)))
    rev_h = float(jnp.max(jnp.abs(-h_b - h)))
    out = {
        "workload": name,
        "dtype": str(jnp.dtype(dtype)),
        "eps_cg_requested": 1e-19,
        "eps_cg_effective": 2.5e-13 if jnp.dtype(dtype) == jnp.dtype(jnp.complex64) else 1e-19,
        "n_traj": n_traj,
        "mean_dH": round(float(dhs.mean()), 8),
        "err_dH": round(float(dhs.std() / np.sqrt(len(dhs))), 8),
        "mean_exp_mdH": round(float(np.exp(-dhs).mean()), 6),
        "acceptance": round(n_acc / n_traj, 3),
        "reversibility_maxU": rev_u,
        "reversibility_maxH": rev_h,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    n_traj = 30
    if "--traj" in sys.argv:
        n_traj = int(sys.argv[sys.argv.index("--traj") + 1])
    for name, n in (("wilson4", n_traj), ("staggered8", max(6, n_traj // 3))):
        for dtype in (jnp.complex128, jnp.complex64):
            run(name, dtype, n)
