import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latticeqcd_tpu.ops import fields, gauge_action as ga, sun, wilsonline
from latticeqcd_tpu.ops.dirac.wilson import WilsonDirac, apply_boundary_phases, gaussian_spinor, inner
from latticeqcd_tpu.ops.fermion_action import WilsonFermiAction
from latticeqcd_tpu.updates import HMC
from latticeqcd_tpu.updates.heatbath import Heatbath


def test_clover_term_gamma5_hermitian():
    """Clover-improved D keeps gamma5-hermiticity (csw = reference
    default 1.5612, system_parameters.jl:87)."""
    lat = (4, 4, 4, 4)
    u = apply_boundary_phases(fields.hot_start(lat, 3, seed=81))
    d = WilsonDirac(kappa=0.141139, csw=1.5612)
    psi = gaussian_spinor(jax.random.PRNGKey(0), lat, 3)
    phi = gaussian_spinor(jax.random.PRNGKey(1), lat, 3)
    lhs = inner(phi, d.apply(u, psi))
    rhs = inner(d.apply_dagger(u, phi), psi)
    assert abs(complex(lhs - rhs)) < 1e-10 * abs(complex(lhs))
    # clover term actually contributes
    d0 = WilsonDirac(kappa=0.141139, csw=0.0)
    diff = d.apply(u, psi) - d0.apply(u, psi)
    assert float(jnp.max(jnp.abs(diff))) > 1e-3


@pytest.mark.slow
def test_clover_hmc_force_finite_difference():
    """WilsonClover fermion force is exact via the autodiff of the
    clover-improved operator application."""
    lat = (4, 4, 4, 4)
    u = fields.hot_start(lat, 3, seed=82)
    fa = WilsonFermiAction(WilsonDirac(kappa=0.13, csw=1.5612), eps_cg=1e-24)
    s_old, phi = fa.sample_pseudofermion(u, jax.random.PRNGKey(2))
    h = sun.random_hermitian_momentum(jax.random.PRNGKey(3), u.shape[:-2], 3)

    def s_along(t):
        e = sun.expi_hermitian(h, t)
        ut = jnp.stack([sun.mul(e[mu], u[mu]) for mu in range(4)])
        return float(fa.action(ut, phi))

    dt = 1e-4
    ds_num = (s_along(dt) - s_along(-dt)) / (2 * dt)
    f = fa.force(u, phi)
    ds_force = -2.0 * float(jnp.sum(jnp.real(sun.trace(sun.mul(h, f)))))
    assert abs(ds_num - ds_force) < 2e-4 * max(1.0, abs(ds_num)), (ds_num, ds_force)


def _symanzik_action(nc, beta):
    """Tree-level-improved-style plaquette+rectangle action."""
    return ga.general_gauge_action(
        nc,
        [beta, -beta / 20.0],
        [
            wilsonline.make_loops_fromname("plaquette", 4),
            wilsonline.make_loops_fromname("rectangular", 4),
        ],
    )


@pytest.mark.slow
def test_general_action_heatbath_or_preserves_action():
    """Overrelaxation on a rectangle-improved action: the auto-coloring
    (per-axis modulus > loop extent) must give conflict-free masked
    updates — the total action is then conserved exactly."""
    lat = (6, 6, 6, 6)
    act = _symanzik_action(2, 1.9)
    u = fields.hot_start(lat, 2, seed=83)
    hb = Heatbath(action=act)
    s0 = float(ga.action_value(act, u))
    u1, _ = hb.overrelax(u, jax.random.PRNGKey(4))
    s1 = float(ga.action_value(act, u1))
    assert abs(s1 - s0) < 1e-8 * max(1.0, abs(s0))
    assert float(jnp.max(jnp.abs(u1 - u))) > 1e-3
    assert float(sun.unitarity_defect(u1)) < 1e-11


@pytest.mark.slow
def test_general_action_heatbath_matches_hmc():
    """<plaq> from general-action heatbath == general-action HMC."""
    lat = (4, 4, 4, 4)
    act = _symanzik_action(2, 1.9)
    # extent-2 loops on L=4: coloring modulus 4 per axis (fully safe)
    u = fields.hot_start(lat, 2, seed=84)
    hb = Heatbath(action=act)
    key = jax.random.PRNGKey(5)
    for _ in range(8):
        u, key = hb.sweep(u, key)
    ps_hb = []
    for _ in range(15):
        u, key = hb.sweep(u, key)
        ps_hb.append(float(ga.mean_plaquette(u)))

    # dtau=0.1 gives 0% acceptance for the rect-improved force; 0.05/20
    # accepts ~90%
    hmc = HMC(action=act, dtau=0.05, md_steps=20)
    u2, key2 = fields.hot_start(lat, 2, seed=85), jax.random.PRNGKey(6)
    n_acc = 0
    for _ in range(25):
        u2, key2, st = hmc.step(u2, key2)
        n_acc += int(st["accepted"])
    assert n_acc > 10
    ps_hmc = []
    for _ in range(40):
        u2, key2, _ = hmc.step(u2, key2)
        ps_hmc.append(float(ga.mean_plaquette(u2)))
    assert abs(np.mean(ps_hb) - np.mean(ps_hmc)) < 0.03, (np.mean(ps_hb), np.mean(ps_hmc))
