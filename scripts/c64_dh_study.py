"""Settle the 8^4 complex64 <dH> question with honest statistics.

Round-4 history (PERF.md "complex64 sampling-bias evidence"): a
"paired" c64-vs-c128 dH comparison reported +0.078 +- 0.026 (2.9
sigma) at 8^4 and attributed it to c64 integrator rounding. Round 5
found BOTH pillars of that conclusion unsound:

1. The pairing is vacuous: jax.random draws with the same key but
   different dtypes are UNRELATED streams (verified directly — f32 and
   f64 normals from one key differ O(1)), so the two chains have
   independent momenta/pseudofermions from trajectory 0 and the
   paired-difference error bar (which assumed common randomness)
   vastly understates the true uncertainty. With independent-series
   errors the r4 numbers read 0.078 +- 0.060 — 1.3 sigma, nothing.
2. The mechanism is refuted by direct experiment: an f64 real-pair
   integrator (md_precision='mixed') leaves the apparent offset
   unchanged (+0.085 vs +0.078), and re-evaluating the SAME c64
   trajectories' endpoints in f64 shifts dH by only +0.007 +- 0.022.

This script runs LONG independent chains per variant (c128, c64,
c64+mixedMD) with enough trajectories that <dH>, <exp(-dH)>
(exactness: must be 1 within error for ANY unbiased HMC), acceptance
and the physical plaquette carry real error bars.

Usage: python scripts/c64_dh_study.py [--cpu] [--traj N]
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax  # noqa: E402

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from latticeqcd_tpu.analysis import autocorrelation  # noqa: E402
from latticeqcd_tpu.ops import fields, gauge_action as ga  # noqa: E402
from latticeqcd_tpu.ops.dirac.staggered import StaggeredDirac  # noqa: E402
from latticeqcd_tpu.ops.fermion_action import StaggeredFermiAction  # noqa: E402
from latticeqcd_tpu.updates import HMC  # noqa: E402

LAT = (8, 8, 8, 8)


def _hmc(dtype):
    fa = StaggeredFermiAction(
        StaggeredDirac(mass=0.5, lattice=LAT), nf=4, eps_cg=1e-19, max_cg=3000
    )
    return HMC(action=ga.wilson_gauge_action(3, 5.7), dtau=0.02, md_steps=10,
               fermi_action=fa, staged=False)


def main():
    n_traj = 200
    if "--traj" in sys.argv:
        n_traj = int(sys.argv[sys.argv.index("--traj") + 1])

    # shared f64-thermalized start (same protocol as c64_bias.py)
    u = fields.hot_start(LAT, 3, seed=2, dtype=jnp.complex128)
    hmc = _hmc(jnp.complex128)
    key = jax.random.PRNGKey(111)
    for _ in range(8):
        u, key, _ = hmc.step(u, key)
    u0 = np.asarray(u)

    for tag, dtype, mixed in (("complex128", jnp.complex128, False),
                              ("complex64", jnp.complex64, False),
                              ("complex64+mixedMD", jnp.complex64, True)):
        hmc = _hmc(dtype)
        if mixed:
            hmc = dataclasses.replace(hmc, md_precision="mixed")
        u = jnp.asarray(u0).astype(dtype)
        key = jax.random.PRNGKey(333)  # same key: streams are still
        # independent across dtypes (that is the point of this study)
        t0 = time.time()
        dhs, plaqs, n_acc = [], [], 0
        for _ in range(n_traj):
            u, key, st = hmc.step(u, key)
            dhs.append(float(st["dH"]))
            plaqs.append(float(st["plaq"]))
            n_acc += int(st["accepted"])
        dhs = np.asarray(dhs)
        m_dh, e_dh, tau_dh, _ = autocorrelation(dhs)
        m_pl, e_pl, tau_pl, _ = autocorrelation(np.asarray(plaqs))
        ex = np.exp(-dhs)
        m_ex, e_ex, _, _ = autocorrelation(ex)
        acc = n_acc / n_traj
        out = {
            "variant": tag, "n_traj": n_traj,
            "mean_dH": round(float(m_dh), 5), "err_dH": round(float(e_dh), 5),
            "tau_int_dH": round(float(tau_dh), 2),
            "exp_mdH": round(float(m_ex), 5), "err_exp_mdH": round(float(e_ex), 5),
            "acceptance": round(acc, 4),
            "err_acceptance": round(float(np.sqrt(acc * (1 - acc) / n_traj)), 4),
            "plaq": round(float(m_pl), 6), "err_plaq": round(float(e_pl), 6),
            "tau_int_plaq": round(float(tau_pl), 2),
            "wall_s": round(time.time() - t0, 1),
            "device": str(jax.devices()[0]),
        }
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
