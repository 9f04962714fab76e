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


def test_kp_skip_rate_measured():
    """The bounded KP rejection loop's skip rate is MEASURED, not
    asserted (VERDICT r4 weak #5). Round-4 KP-only rates at 8^4 (10
    sweeps, hot start): SU(3) beta=0.5 3.0e-3, beta=0.1 0.27,
    beta=0.01 0.95 — the lazy-Gibbs skip is unbiased but a 95% skip
    rate freezes mixing at strong coupling. The per-site KP/Creutz
    hybrid (updates/heatbath.py _KP_CREUTZ_SWITCH) keeps per-try
    acceptance O(1) at every alpha; this pins zero exhausted sites
    across the whole coupling range on a smaller, CI-affordable
    volume, via the instrumented sweep_diag."""
    for nc, betas in ((2, (1.0, 0.01)), (3, (5.7, 0.5, 0.01))):
        for beta in betas:
            hb = Heatbath(action=ga.wilson_gauge_action(nc, beta))
            u = fields.hot_start((4, 4, 4, 4), nc, seed=1)
            key = jax.random.PRNGKey(0)
            tot_e = tot_a = 0
            for _ in range(3):
                u, key, ne, na = hb.sweep_diag(u, key)
                tot_e += int(ne)
                tot_a += int(na)
            assert tot_a > 0
            assert tot_e == 0, (nc, beta, tot_e, tot_a)


def test_kp_creutz_hybrid_density_exact():
    """The per-site sampler must draw from sqrt(1-a0^2) exp(alpha a0)
    EXACTLY on both sides of the KP/Creutz switch: first two moments
    vs Gauss-Jacobi quadrature (the sqrt(1-x^2) weight is built into
    the rule — plain Gauss-Legendre misclassifies the endpoint
    singularity exactly where the large-alpha mass sits)."""
    from scipy.special import roots_jacobi

    from latticeqcd_tpu.updates.heatbath import _kp_sample_a0

    xg, wg = roots_jacobi(200, 0.5, 0.5)
    for alpha in (0.01, 0.5, 1.9, 2.1, 10.0):
        a = jnp.full((120000,), alpha)
        a0, done, _ = _kp_sample_a0(
            jax.random.PRNGKey(3), a, jnp.ones_like(a, dtype=bool), 10**5
        )
        import numpy as np

        a0 = np.asarray(a0)[np.asarray(done)]
        assert len(a0) == 120000  # no exhausted samples at any alpha
        w = wg * np.exp(alpha * xg)
        m1 = (xg * w).sum() / w.sum()
        err = a0.std() / len(a0) ** 0.5
        assert abs(a0.mean() - m1) < 4 * err, (alpha, a0.mean(), m1, err)


def test_heatbath_complex64_storage_under_x64():
    """complex64-storage sweeps must run under x64 (the r5 12^4
    finite-volume script hit a latent promotion: f64-default uniforms
    poisoning the f32 rejection-loop carry; uniforms now draw in
    alpha's dtype)."""
    hb = Heatbath(action=ga.wilson_gauge_action(3, 5.7))
    u = fields.cold_start((4, 4, 4, 4), 3, dtype=jnp.complex64)
    key = jax.random.PRNGKey(0)
    for _ in range(3):
        u, key = hb.sweep(u, key)
    assert u.dtype == jnp.complex64
    p = float(ga.mean_plaquette(u))
    assert 0.3 < p <= 1.0, p


def test_sweep_diag_matches_sweep():
    """The instrumented sweep consumes the identical RNG stream and
    produces bitwise-identical links — the counters must be pure
    observation (guards the with_diag carry plumbing)."""
    hb = Heatbath(action=ga.wilson_gauge_action(3, 2.0))
    u = fields.hot_start((4, 4, 4, 4), 3, seed=3)
    key = jax.random.PRNGKey(9)
    u1, k1 = hb.sweep(u, key)
    u2, k2, ne, na = hb.sweep_diag(u, key)
    assert float(jnp.max(jnp.abs(u1 - u2))) == 0.0
    assert jnp.array_equal(k1, k2)
    assert int(na) > 0 and int(ne) == 0
