"""Per-config observable goldens on the 11 reference ensembles.

VERDICT.md item 3: regression-pins Polyakov loop, topological charge
(plaquette/clover/improved), energy density, stochastic chiral
condensate (fixed Z4 noise policy: seed 4513 + itrj, itrj=100, Nr=2)
and the pion correlator C(t) for the first checked-in config of each
reference ensemble — the same way tests/test_io.py pins plaquettes.
All values go through the driver-level Measurement classes
(measurements/scheduler.py), so a regression anywhere in the
measurement stack (loaders, Dirac operators, solvers, observables)
trips these.

Regenerate with scripts/golden_observables.py after an intentional
change. Reference validation anchors: /root/reference/README.md:209-219.
"""

import os

import numpy as np
import pytest

from latticeqcd_tpu.io import load_bridge_text
from latticeqcd_tpu.measurements import observables
from latticeqcd_tpu.measurements.scheduler import (
    ChiralCondensateMeasurement,
    PionCorrelatorMeasurement,
)

ITRJ = 100
NR = 2

# ensemble -> (lattice, NC, fermion params, goldens)
GOLDEN = {
    "confs_HMC_L04040404_beta5.7_quenched_su2": (
        (4, 4, 4, 4), 2, {"Dirac_operator": "Staggered", "mass": 0.5},
        {"polyakov": (-0.0984657905, 0.0), "q_plaq": -0.0091384806,
         "q_clover": -0.0592645867, "q_improved": -0.1193431364,
         "energy_density": 0.1113571088, "pbp": 0.9362572212,
         "pion": (1.44083951, 0.25503467, 0.16527842, 0.27794092)},
    ),
    "confs_HMC_L04040404_beta5.7_quenched_su3": (
        (4, 4, 4, 4), 3, {"Dirac_operator": "Wilson", "hop": 0.141139},
        {"polyakov": (0.2995025056, -0.02984233), "q_plaq": -0.2593890404,
         "q_clover": -0.0242700152, "q_improved": -0.047896898,
         "energy_density": 0.2424936175, "pbp": 11.3281454911,
         "pion": (14.96786854, 1.28618657, 0.4132621, 1.27088179)},
    ),
    "confs_HMC_L04040404_beta5.7_quenched_su4": (
        (4, 4, 4, 4), 4, {"Dirac_operator": "Staggered", "mass": 0.5},
        {"polyakov": (0.0166418413, 0.0131190786), "q_plaq": 0.0210161663,
         "q_clover": -0.0531372849, "q_improved": -0.0914268217,
         "energy_density": 0.064520685, "pbp": 1.9747931552,
         "pion": (2.80753184, 0.59436532, 0.2164292, 0.56974122)},
    ),
    "confs_Heatbath_L04040404_beta5.7_quenched_su2": (
        (4, 4, 4, 4), 2, {"Dirac_operator": "Staggered", "mass": 0.5},
        {"polyakov": (0.0748679005, 0.0), "q_plaq": 0.6246724734,
         "q_clover": 0.089911626, "q_improved": 0.1722410346,
         "energy_density": 0.1107138028, "pbp": 0.8520744649,
         "pion": (1.17007406, 0.21268355, 0.09290892, 0.22970342)},
    ),
    "confs_Heatbath_L04040404_beta5.7_quenched_su3": (
        (4, 4, 4, 4), 3, {"Dirac_operator": "Staggered", "mass": 0.5},
        {"polyakov": (0.153105003, -0.0365993463), "q_plaq": 0.6372167458,
         "q_clover": 0.0669163193, "q_improved": 0.110235032,
         "energy_density": 0.2452565701, "pbp": 1.1722558351,
         "pion": (1.57164814, 0.26329251, 0.09036645, 0.26700166)},
    ),
    "confs_Heatbath_L04040404_beta5.7_quenched_su4": (
        (4, 4, 4, 4), 4, {"Dirac_operator": "Staggered", "mass": 0.5},
        {"polyakov": (-0.0602493817, -0.0020585349), "q_plaq": 0.53147171,
         "q_clover": 0.0986192299, "q_improved": 0.1648173597,
         "energy_density": 0.0651689695, "pbp": 1.8843611303,
         "pion": (2.7012498, 0.55799726, 0.22188513, 0.57285889)},
    ),
    "confs_HMC_L04040404_beta5.7_Wilson_kappa0.141139": (
        (4, 4, 4, 4), 3, {"Dirac_operator": "Wilson", "hop": 0.141139},
        {"polyakov": (0.1929186541, -0.0122881955), "q_plaq": 0.1771408102,
         "q_clover": -0.0496141947, "q_improved": -0.0991140204,
         "energy_density": 0.2444581004, "pbp": 11.3797150721,
         "pion": (14.98752755, 1.14953647, 0.31545935, 1.14397705)},
    ),
    "confs_HMC_L04040404_beta5.7_Staggered_mass0.5": (
        (4, 4, 4, 4), 3, {"Dirac_operator": "Staggered", "mass": 0.5, "Nf": 4},
        {"polyakov": (0.1633243788, 0.0230161551), "q_plaq": -0.3075038851,
         "q_clover": -0.0938549902, "q_improved": -0.1473854698,
         "energy_density": 0.253075111, "pbp": 1.1639154063,
         "pion": (1.61750783, 0.31369893, 0.06533222, 0.33732135)},
    ),
    "confs_HMC_L04040404_beta5.7_Staggered_mass0.5_Nf2": (
        (4, 4, 4, 4), 3, {"Dirac_operator": "Staggered", "mass": 0.5, "Nf": 2},
        {"polyakov": (0.1045383226, 0.067130379), "q_plaq": -0.2519610624,
         "q_clover": 0.0522771152, "q_improved": 0.085251262,
         "energy_density": 0.2408470433, "pbp": 0.5732956188,
         "pion": (1.50830702, 0.28720815, 0.08350727, 0.2720244)},
    ),
    "confs_HMC_L04040404_beta5.7_Staggered_mass0.5_Nf3": (
        (4, 4, 4, 4), 3, {"Dirac_operator": "Staggered", "mass": 0.5, "Nf": 3},
        {"polyakov": (0.2691007478, -0.0037424368), "q_plaq": 0.4947722593,
         "q_clover": -0.0921197801, "q_improved": -0.1621943072,
         "energy_density": 0.2490118802, "pbp": 0.8754432111,
         "pion": (1.53525894, 0.31678173, 0.08243789, 0.29794255)},
    ),
    "confs_HMC_L04040404_beta5.7_Domainwall": (
        (4, 4, 2, 2), 3, {"Dirac_operator": "Wilson", "hop": 0.141139},
        {"polyakov": (0.5333245006, -0.0020559821), "q_plaq": -0.179613816,
         "q_clover": 0.0120829246, "q_improved": 0.0173892701,
         "energy_density": 0.2823835549, "pbp": 11.2643013151,
         "pion": (13.70780738, 2.43451513)},
    ),
}


def _load(reference_dir, name):
    lattice, nc, fparams, gold = GOLDEN[name]
    conf = os.path.join(reference_dir, "test", name, f"conf_{ITRJ:08d}.ildg.txt")
    return load_bridge_text(conf, lattice, nc), fparams, gold


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_gauge_observable_goldens(reference_dir, name):
    u, _, gold = _load(reference_dir, name)
    poly = complex(observables.polyakov_loop(u))
    assert abs(poly.real - gold["polyakov"][0]) < 1e-8
    assert abs(poly.imag - gold["polyakov"][1]) < 1e-8
    assert abs(float(observables.topological_charge(u, "plaquette")) - gold["q_plaq"]) < 1e-8
    assert abs(float(observables.topological_charge(u, "clover")) - gold["q_clover"]) < 1e-8
    assert abs(float(observables.topological_charge(u, "improved")) - gold["q_improved"]) < 1e-8
    assert abs(float(observables.energy_density(u)) - gold["energy_density"]) < 1e-8


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_fermionic_observable_goldens(reference_dir, name):
    u, fparams, gold = _load(reference_dir, name)
    pbp_m = ChiralCondensateMeasurement(
        name="Chiral_condensate", interval=1,
        params={"fermion_parameters": fparams, "Nr": NR},
    )
    pbp, _ = pbp_m.measure(u, ITRJ)
    assert abs(pbp - gold["pbp"]) < 1e-6 * max(1.0, abs(gold["pbp"]))
    pion_m = PionCorrelatorMeasurement(
        name="Pion_correlator", interval=1, params={"fermion_parameters": fparams}
    )
    cpi, _ = pion_m.measure(u, ITRJ)
    np.testing.assert_allclose(np.asarray(cpi), np.asarray(gold["pion"]), rtol=1e-6)
