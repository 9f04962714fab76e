import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latticeqcd_tpu.io import load_bridge_text
from latticeqcd_tpu.ops import fields, gauge_action as ga, sun
from latticeqcd_tpu.updates.heatbath import (
    Heatbath,
    _quat_of_block,
    _su2_from_quat,
)

LAT = (4, 4, 4, 4)


def test_quaternion_pairing_identity():
    """Re tr(V S) == 2 (v0 x0 + v.x) for the block decomposition."""
    rng = np.random.default_rng(0)
    s = rng.standard_normal((50, 2, 2)) + 1j * rng.standard_normal((50, 2, 2))
    v_quat = rng.standard_normal((50, 4))
    v_quat /= np.linalg.norm(v_quat, axis=1, keepdims=True)
    v = np.asarray(
        _su2_from_quat(*(jnp.asarray(v_quat[:, k]) for k in range(4)), jnp.complex128)
    )
    lhs = np.real(np.trace(v @ s, axis1=-2, axis2=-1))
    x0, x1, x2, x3 = _quat_of_block(s[..., 0, 0], s[..., 0, 1], s[..., 1, 0], s[..., 1, 1])
    rhs = 2 * (
        v_quat[:, 0] * np.asarray(x0)
        + v_quat[:, 1] * np.asarray(x1)
        + v_quat[:, 2] * np.asarray(x2)
        + v_quat[:, 3] * np.asarray(x3)
    )
    assert np.max(np.abs(lhs - rhs)) < 1e-12


@pytest.mark.parametrize("nc", [2, 3])
def test_heatbath_preserves_group(nc):
    u = fields.hot_start(LAT, nc, seed=1)
    hb = Heatbath(action=ga.wilson_gauge_action(nc, 5.7))
    key = jax.random.PRNGKey(0)
    u, key = hb.sweep(u, key)
    assert float(sun.unitarity_defect(u)) < 1e-12


@pytest.mark.parametrize("nc", [2, 3, 4])
def test_overrelaxation_preserves_action(nc):
    """Every masked OR reflection preserves its local exponent and no
    same-color sites share staples, so the TOTAL action is conserved
    to machine precision — validates both the coloring and the
    reflection algebra."""
    u = fields.hot_start(LAT, nc, seed=2)
    act = ga.wilson_gauge_action(nc, 5.7)
    hb = Heatbath(action=act)
    key = jax.random.PRNGKey(1)
    s0 = float(ga.action_value(act, u))
    u1, key = hb.overrelax(u, key)
    s1 = float(ga.action_value(act, u1))
    assert abs(s1 - s0) < 1e-8 * max(1.0, abs(s0))
    # and it must actually move the links
    assert float(jnp.max(jnp.abs(u1 - u))) > 1e-3


@pytest.mark.parametrize(
    "nc,beta,confdir,golden",
    [
        # beta per scenario from test0*-hb.toml (su2: 1.9, su3: 5.7, su4: 9.0)
        (2, 1.9, "confs_Heatbath_L04040404_beta5.7_quenched_su2", 0.4890732959844511),
        (3, 5.7, "confs_Heatbath_L04040404_beta5.7_quenched_su3", 0.5401991482662416),
        (4, 9.0, "confs_Heatbath_L04040404_beta5.7_quenched_su4", 0.34082265106271026),
    ],
)
@pytest.mark.slow
def test_heatbath_reproduces_golden(reference_dir, nc, beta, confdir, golden):
    """test0*-hb scenarios: 10 sweeps from the checked-in config, final
    plaquette within the reference 10% band (BASELINE.md #4-6)."""
    conf = os.path.join(reference_dir, "test", confdir, "conf_00000100.ildg.txt")
    u = load_bridge_text(conf, LAT, nc)
    hb = Heatbath(action=ga.wilson_gauge_action(nc, beta))
    key = jax.random.PRNGKey(111)
    for _ in range(10):
        u, key, _ = hb.update(u, key)
    plaq = float(ga.mean_plaquette(u))
    assert abs(plaq - golden) / golden < 0.1


@pytest.mark.slow
def test_heatbath_hmc_cross_validation(reference_dir):
    """Two independent samplers of the same action must agree on
    <plaquette> within statistical error (SU(3), beta=5.7, 4^4).

    Longer-run anchor (scripts/three_sampler_xval.py, 200-400 samples
    from the equilibrated reference config): HB 0.5623(16),
    HB+OR 0.5614(16), HMC 0.5588(23), Metropolis 0.5642(16) — all
    consistent; 4^4 beta=5.7 equilibrium ~ 0.561. Short chains here
    start equilibrated to dodge thermalization bias.
    """
    from latticeqcd_tpu.updates import HMC

    conf = os.path.join(
        reference_dir,
        "test/confs_HMC_L04040404_beta5.7_quenched_su3/conf_00000100.ildg.txt",
    )
    u0 = load_bridge_text(conf, LAT, 3)
    act = ga.wilson_gauge_action(3, 5.7)

    hb = Heatbath(action=act, use_or=True, num_or=2)
    u, key = u0, jax.random.PRNGKey(7)
    for _ in range(10):
        u, key, _ = hb.update(u, key)
    ps_hb = []
    for _ in range(30):
        u, key, _ = hb.update(u, key)
        ps_hb.append(float(ga.mean_plaquette(u)))

    hmc = HMC(action=act, dtau=1.0 / 15, md_steps=15)
    u2, key2 = u0, jax.random.PRNGKey(8)
    for _ in range(10):
        u2, key2, _ = hmc.step(u2, key2)
    ps_hmc = []
    for _ in range(30):
        u2, key2, _ = hmc.step(u2, key2)
        ps_hmc.append(float(ga.mean_plaquette(u2)))

    m_hb, m_hmc = np.mean(ps_hb), np.mean(ps_hmc)
    # each mean has sigma ~ 0.004 incl. autocorrelation; 0.025 ~ 4 sigma
    assert abs(m_hb - m_hmc) < 0.025, (m_hb, m_hmc)
