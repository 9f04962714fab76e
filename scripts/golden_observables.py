"""Generate per-config observable goldens for the 11 reference ensembles.

VERDICT.md item 3: pin Polyakov loop, topological charge
(plaq/clover/improved), energy density, stochastic pbp (fixed
seed/noise policy) and the pion correlator C(t) for the first config
of every checked-in reference ensemble, the way tests/test_io.py pins
plaquettes. Values are computed through the SAME driver-level
Measurement classes the TOML path uses (measurements/scheduler.py),
on CPU float64, and pasted into tests/test_golden_observables.py.

Run:  python scripts/golden_observables.py
"""

import os
import pprint
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from latticeqcd_tpu.io import load_bridge_text
from latticeqcd_tpu.measurements.scheduler import (
    ChiralCondensateMeasurement,
    PionCorrelatorMeasurement,
)
from latticeqcd_tpu.measurements import observables

REF = "/root/reference/test"

# ensemble -> (lattice, NC, fermion_parameters for pbp/pion)
ENSEMBLES = {
    "confs_HMC_L04040404_beta5.7_quenched_su2": ((4, 4, 4, 4), 2, {"Dirac_operator": "Staggered", "mass": 0.5}),
    "confs_HMC_L04040404_beta5.7_quenched_su3": ((4, 4, 4, 4), 3, {"Dirac_operator": "Wilson", "hop": 0.141139}),
    "confs_HMC_L04040404_beta5.7_quenched_su4": ((4, 4, 4, 4), 4, {"Dirac_operator": "Staggered", "mass": 0.5}),
    "confs_Heatbath_L04040404_beta5.7_quenched_su2": ((4, 4, 4, 4), 2, {"Dirac_operator": "Staggered", "mass": 0.5}),
    "confs_Heatbath_L04040404_beta5.7_quenched_su3": ((4, 4, 4, 4), 3, {"Dirac_operator": "Staggered", "mass": 0.5}),
    "confs_Heatbath_L04040404_beta5.7_quenched_su4": ((4, 4, 4, 4), 4, {"Dirac_operator": "Staggered", "mass": 0.5}),
    "confs_HMC_L04040404_beta5.7_Wilson_kappa0.141139": ((4, 4, 4, 4), 3, {"Dirac_operator": "Wilson", "hop": 0.141139}),
    "confs_HMC_L04040404_beta5.7_Staggered_mass0.5": ((4, 4, 4, 4), 3, {"Dirac_operator": "Staggered", "mass": 0.5, "Nf": 4}),
    "confs_HMC_L04040404_beta5.7_Staggered_mass0.5_Nf2": ((4, 4, 4, 4), 3, {"Dirac_operator": "Staggered", "mass": 0.5, "Nf": 2}),
    "confs_HMC_L04040404_beta5.7_Staggered_mass0.5_Nf3": ((4, 4, 4, 4), 3, {"Dirac_operator": "Staggered", "mass": 0.5, "Nf": 3}),
    "confs_HMC_L04040404_beta5.7_Domainwall": ((4, 4, 2, 2), 3, {"Dirac_operator": "Wilson", "hop": 0.141139}),
}

NR = 2  # noise vectors for pbp (fixed policy: seed 4513 + itrj, itrj=100)
ITRJ = 100


def main():
    out = {}
    for name, (lattice, nc, fparams) in ENSEMBLES.items():
        conf = os.path.join(REF, name, f"conf_{ITRJ:08d}.ildg.txt")
        u = load_bridge_text(conf, lattice, nc)
        poly = complex(observables.polyakov_loop(u))
        rec = {
            "polyakov": (round(poly.real, 10), round(poly.imag, 10)),
            "q_plaq": round(float(observables.topological_charge(u, "plaquette")), 10),
            "q_clover": round(float(observables.topological_charge(u, "clover")), 10),
            "q_improved": round(float(observables.topological_charge(u, "improved")), 10),
            "energy_density": round(float(observables.energy_density(u)), 10),
        }
        pbp_m = ChiralCondensateMeasurement(
            name="Chiral_condensate", interval=1,
            params={"fermion_parameters": fparams, "Nr": NR},
        )
        pbp, _ = pbp_m.measure(u, ITRJ)
        rec["pbp"] = round(pbp, 10)
        pion_m = PionCorrelatorMeasurement(
            name="Pion_correlator", interval=1,
            params={"fermion_parameters": fparams},
        )
        cpi, _ = pion_m.measure(u, ITRJ)
        rec["pion"] = tuple(round(float(c), 8) for c in np.asarray(cpi))
        out[name] = rec
        print(f"# {name}: done", file=sys.stderr)
    pprint.pprint(out, width=100)


if __name__ == "__main__":
    main()
