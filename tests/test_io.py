import glob
import os

import jax.numpy as jnp
import numpy as np
import pytest

from latticeqcd_tpu.io import (
    load_bridge_text,
    load_ildg,
    load_u,
    save_bridge_text,
    save_ildg,
    save_u,
)
from latticeqcd_tpu.ops import fields, gauge_action, sun

# Equilibrium plaquette of the FIRST checked-in config of each reference
# ensemble, as measured by this framework (regression-pinned; the values
# sit inside each scenario's golden band, BASELINE.md).
REFERENCE_CONF_PLAQ = {
    "confs_HMC_L04040404_beta5.7_quenched_su2": ((4, 4, 4, 4), 2, 0.47613811),
    "confs_HMC_L04040404_beta5.7_quenched_su3": ((4, 4, 4, 4), 3, 0.56821575),
    "confs_HMC_L04040404_beta5.7_quenched_su4": ((4, 4, 4, 4), 4, 0.34024104),
    "confs_Heatbath_L04040404_beta5.7_quenched_su2": ((4, 4, 4, 4), 2, 0.47764126),
    "confs_Heatbath_L04040404_beta5.7_quenched_su3": ((4, 4, 4, 4), 3, 0.57147817),
    "confs_Heatbath_L04040404_beta5.7_quenched_su4": ((4, 4, 4, 4), 4, 0.34407257),
    "confs_HMC_L04040404_beta5.7_Wilson_kappa0.141139": ((4, 4, 4, 4), 3, 0.56580023),
    "confs_HMC_L04040404_beta5.7_Staggered_mass0.5": ((4, 4, 4, 4), 3, 0.57558404),
    "confs_HMC_L04040404_beta5.7_Staggered_mass0.5_Nf2": ((4, 4, 4, 4), 3, 0.56650173),
    "confs_HMC_L04040404_beta5.7_Staggered_mass0.5_Nf3": ((4, 4, 4, 4), 3, 0.57083709),
    "confs_HMC_L04040404_beta5.7_Domainwall": ((4, 4, 2, 2), 3, 0.58329608),
}


@pytest.mark.parametrize("confdir", sorted(REFERENCE_CONF_PLAQ))
def test_bridge_text_reference_configs(reference_dir, confdir):
    lattice, nc, plaq_expected = REFERENCE_CONF_PLAQ[confdir]
    files = sorted(glob.glob(os.path.join(reference_dir, "test", confdir, "*.txt")))
    assert files, confdir
    u = load_bridge_text(files[0], lattice, nc)
    assert float(sun.unitarity_defect(u)) < 1e-10
    plaq = float(gauge_action.mean_plaquette(u))
    assert abs(plaq - plaq_expected) < 1e-7


def test_bridge_text_roundtrip(tmp_path):
    u = fields.hot_start((4, 4, 2, 2), 3, seed=1)
    fn = tmp_path / "conf.txt"
    save_bridge_text(fn, u)
    v = load_bridge_text(fn, (4, 4, 2, 2), 3)
    assert float(jnp.max(jnp.abs(u - v))) < 1e-15


def test_ildg_roundtrip(tmp_path):
    u = fields.hot_start((2, 4, 2, 4), 2, seed=2)
    fn = tmp_path / "conf.ildg"
    save_ildg(fn, u)
    v = load_ildg(fn, (2, 4, 2, 4), 2)
    assert float(jnp.max(jnp.abs(u - v))) == 0.0


def test_native_roundtrip(tmp_path):
    u = fields.hot_start((4, 4, 4, 4), 3, seed=3)
    fn = tmp_path / "conf.npz"
    save_u(fn, u)
    v = load_u(fn)
    assert float(jnp.max(jnp.abs(u - v))) == 0.0


def test_bridge_vs_ildg_same_field(tmp_path):
    """Both writers use the same lexicographic ordering."""
    u = fields.hot_start((4, 4, 4, 4), 3, seed=4)
    f1 = tmp_path / "c.txt"
    f2 = tmp_path / "c.ildg"
    save_bridge_text(f1, u)
    save_ildg(f2, u)
    a = load_bridge_text(f1, (4, 4, 4, 4), 3)
    b = load_ildg(f2, (4, 4, 4, 4), 3)
    assert float(jnp.max(jnp.abs(a - b))) < 1e-15
