import os

import jax
import jax.numpy as jnp
import pytest

from latticeqcd_tpu.io import load_bridge_text
from latticeqcd_tpu.ops import fields, gauge_action as ga, sun
from latticeqcd_tpu.ops.dirac.domainwall import DomainwallDirac
from latticeqcd_tpu.ops.dirac.wilson import apply_boundary_phases, inner
from latticeqcd_tpu.ops.fermion_action import DomainwallFermiAction
from latticeqcd_tpu.updates import HMC

LAT = (4, 4, 2, 2)
L5 = 4


def _u():
    return fields.hot_start(LAT, 3, seed=41)


def _rand5(key, dtype=jnp.complex128):
    k1, k2 = jax.random.split(key)
    shape = (L5, *LAT, 4, 3)
    return (
        jax.random.normal(k1, shape, dtype=jnp.float64)
        + 1j * jax.random.normal(k2, shape, dtype=jnp.float64)
    ).astype(dtype)


def test_dagger_is_adjoint():
    u = apply_boundary_phases(_u())
    d = DomainwallDirac(mass=1.0, m5=-1.0, l5=L5)
    psi = _rand5(jax.random.PRNGKey(0))
    phi = _rand5(jax.random.PRNGKey(1))
    lhs = inner(phi, d.apply(u, psi))
    rhs = inner(d.apply_dagger(u, phi), psi)
    assert abs(complex(lhs - rhs)) < 1e-10 * abs(complex(lhs))


def test_sampling_action_consistency():
    u = _u()
    fa = DomainwallFermiAction(DomainwallDirac(mass=1.0, m5=-1.0, l5=L5), eps_cg=1e-26)
    s_old, phi = fa.sample_pseudofermion(u, jax.random.PRNGKey(2))
    s_eval = fa.action(u, phi)
    assert abs(float(s_old) - float(s_eval)) < 1e-7 * float(s_old)


def test_force_finite_difference():
    u = _u()
    fa = DomainwallFermiAction(DomainwallDirac(mass=1.0, m5=-1.0, l5=L5), eps_cg=1e-26)
    s_old, phi = fa.sample_pseudofermion(u, jax.random.PRNGKey(3))
    h = sun.random_hermitian_momentum(jax.random.PRNGKey(4), u.shape[:-2], 3)

    def s_along(t):
        e = sun.expi_hermitian(h, t)
        ut = jnp.stack([sun.mul(e[mu], u[mu]) for mu in range(4)])
        return float(fa.action(ut, phi))

    dt = 1e-4
    ds_num = (s_along(dt) - s_along(-dt)) / (2 * dt)
    f = fa.force(u, phi)
    ds_force = -2.0 * float(jnp.sum(jnp.real(sun.trace(sun.mul(h, f)))))
    assert abs(ds_num - ds_force) < 2e-4 * max(1.0, abs(ds_num)), (ds_num, ds_force)


@pytest.mark.slow
def test_domainwall_hmc_golden(reference_dir):
    """test_domainwallhmc scenario: M=-1, m=1, L5=4, 4x4x2x2, 5
    trajectories, golden plaquette 0.5757839405690621 (BASELINE.md #11)."""
    conf = os.path.join(
        reference_dir, "test/confs_HMC_L04040404_beta5.7_Domainwall/conf_00000100.ildg.txt"
    )
    u = load_bridge_text(conf, LAT, 3)
    fa = DomainwallFermiAction(DomainwallDirac(mass=1.0, m5=-1.0, l5=L5), eps_cg=1e-19)
    hmc = HMC(action=ga.wilson_gauge_action(3, 5.7), dtau=0.05, md_steps=20, fermi_action=fa)
    key = jax.random.PRNGKey(111)
    n_acc = 0
    for _ in range(5):
        u, key, st = hmc.step(u, key)
        n_acc += int(st["accepted"])
    plaq = float(ga.mean_plaquette(u))
    golden = 0.5757839405690621
    assert abs(plaq - golden) / golden < 0.1, plaq
    assert n_acc >= 3
