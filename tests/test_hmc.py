import os

import jax
import jax.numpy as jnp
import pytest

from latticeqcd_tpu.io import load_bridge_text
from latticeqcd_tpu.md import integrators
from latticeqcd_tpu.ops import fields, gauge_action as ga, sun
from latticeqcd_tpu.updates import HMC

LAT = (4, 4, 4, 4)


def _setup(nc=3, beta=5.7, seed=3):
    u = fields.hot_start(LAT, nc, seed=seed)
    act = ga.wilson_gauge_action(nc, beta)
    return u, act


def test_md_reversibility():
    """Leapfrog is time-reversible: integrate, flip H, integrate back."""
    u, act = _setup()
    key = jax.random.PRNGKey(0)
    h = sun.random_hermitian_momentum(key, u.shape[:-2], 3)
    force = lambda uu: ga.force(act, uu)
    u1, h1 = integrators.leapfrog_qpq(u, h, force, 0.05, 10)
    u2, h2 = integrators.leapfrog_qpq(u1, -h1, force, 0.05, 10)
    assert float(jnp.max(jnp.abs(u2 - u))) < 1e-10
    assert float(jnp.max(jnp.abs(h2 + h))) < 1e-10


def test_md_energy_scaling():
    """|dH| scales ~ dtau^2 at fixed trajectory length."""
    u, act = _setup()
    key = jax.random.PRNGKey(1)
    h = sun.random_hermitian_momentum(key, u.shape[:-2], 3)
    force = lambda uu: ga.force(act, uu)

    def dh(dtau, steps):
        s0 = sun.kinetic_energy(h) + ga.action_value(act, u)
        u1, h1 = integrators.leapfrog_qpq(u, h, force, dtau, steps)
        s1 = sun.kinetic_energy(h1) + ga.action_value(act, u1)
        return abs(float(s1 - s0))

    d1 = dh(0.02, 50)
    d2 = dh(0.01, 100)
    assert d2 < d1 / 2.5  # ideally factor 4


def test_pqp_matches_qpq_convergence():
    u, act = _setup()
    key = jax.random.PRNGKey(2)
    h = sun.random_hermitian_momentum(key, u.shape[:-2], 3)
    force = lambda uu: ga.force(act, uu)
    ua, _ = integrators.leapfrog_qpq(u, h, force, 0.002, 100)
    ub, _ = integrators.leapfrog_pqp(u, h, force, 0.002, 100)
    assert float(jnp.max(jnp.abs(ua - ub))) < 1e-5


def test_hmc_step_preserves_group():
    u, act = _setup()
    hmc = HMC(action=act, dtau=1.0 / 15, md_steps=15)
    key = jax.random.PRNGKey(3)
    u1, key, stats = hmc.step(u, key)
    assert float(sun.unitarity_defect(u1)) < 1e-9
    assert bool(jnp.isfinite(stats["dH"]))


@pytest.mark.slow
@pytest.mark.parametrize(
    "nc,beta,confdir,golden",
    [
        # beta per scenario from test02/test03.toml (su2: 1.9, su4: 9.0)
        (2, 1.9, "confs_HMC_L04040404_beta5.7_quenched_su2", 0.46105200452156847),
        (4, 9.0, "confs_HMC_L04040404_beta5.7_quenched_su4", 0.34489506725603436),
    ],
)
def test_hmc_quenched_su2_su4_golden(reference_dir, nc, beta, confdir, golden):
    """test02/test03 scenarios (BASELINE.md #1, #3)."""
    conf = os.path.join(reference_dir, "test", confdir, "conf_00000100.ildg.txt")
    u = load_bridge_text(conf, LAT, nc)
    hmc = HMC(action=ga.wilson_gauge_action(nc, beta), dtau=1.0 / 15, md_steps=15)
    key = jax.random.PRNGKey(111)
    n_acc = 0
    for _ in range(10):
        u, key, st = hmc.step(u, key)
        n_acc += int(st["accepted"])
    plaq = float(ga.mean_plaquette(u))
    assert abs(plaq - golden) / golden < 0.1, plaq
    assert n_acc >= 5


@pytest.mark.slow
def test_hmc_quenched_su3_reproduces_golden(reference_dir):
    """test01.toml scenario: 10 trajectories from the checked-in config,
    final plaquette within the reference's 10% golden band
    (BASELINE.md #2: 0.55783720583739)."""
    conf = os.path.join(
        reference_dir,
        "test/confs_HMC_L04040404_beta5.7_quenched_su3/conf_00000100.ildg.txt",
    )
    u = load_bridge_text(conf, LAT, 3)
    act = ga.wilson_gauge_action(3, 5.7)
    hmc = HMC(action=act, dtau=1.0 / 15, md_steps=15)
    key = jax.random.PRNGKey(111)
    n_acc = 0
    for _ in range(10):
        u, key, stats = hmc.step(u, key)
        n_acc += int(stats["accepted"])
    plaq = float(ga.mean_plaquette(u))
    golden = 0.55783720583739
    assert abs(plaq - golden) / golden < 0.1
    assert n_acc >= 5


@pytest.mark.slow
def test_omelyan_reversibility_and_accuracy():
    """Omelyan 2MN is time-reversible and, at the same dtau, its |dH|
    is far below leapfrog's (the minimum-norm error constant)."""
    u, act = _setup()
    key = jax.random.PRNGKey(8)
    h = sun.random_hermitian_momentum(key, u.shape[:-2], 3)
    force = lambda uu: ga.force(act, uu)
    u1, h1 = integrators.omelyan_pqp(u, h, force, 0.05, 10)
    u2, h2 = integrators.omelyan_pqp(u1, -h1, force, 0.05, 10)
    assert float(jnp.max(jnp.abs(u2 - u))) < 1e-10
    assert float(jnp.max(jnp.abs(h2 + h))) < 1e-10

    def dh(integ):
        s0 = sun.kinetic_energy(h) + ga.action_value(act, u)
        ua, ha = integ(u, h, force, 0.05, 20)
        s1 = sun.kinetic_energy(ha) + ga.action_value(act, ua)
        return abs(float(s1 - s0))

    d_leap = dh(integrators.leapfrog_qpq)
    d_omel = dh(integrators.omelyan_pqp)
    # measured ratio ~3.5x at the minimum-norm lambda on this system
    # (the optimum is coupling-dependent; see the lam parameter)
    assert d_omel < d_leap / 3.0, (d_omel, d_leap)


def test_omelyan_unrolled_matches_fori():
    """The unrolled (solver-bearing) and fori_loop code paths take the
    same per-step final-kick branch."""
    u, act = _setup()
    key = jax.random.PRNGKey(9)
    h = sun.random_hermitian_momentum(key, u.shape[:-2], 3)
    force = lambda uu: ga.force(act, uu)
    ua, ha = integrators.omelyan_pqp(u, h, force, 0.05, 4, unroll=False)
    ub, hb = integrators.omelyan_pqp(u, h, force, 0.05, 4, unroll=True)
    assert float(jnp.max(jnp.abs(ua - ub))) < 1e-12
    assert float(jnp.max(jnp.abs(ha - hb))) < 1e-12


def test_omelyan_hmc_step():
    u, act = _setup()
    hmc = HMC(action=act, dtau=0.02, md_steps=10, scheme="Omelyan")
    key = jax.random.PRNGKey(10)
    u1, key, stats = hmc.step(u, key)
    assert float(sun.unitarity_defect(u1)) < 1e-9
    assert bool(jnp.isfinite(stats["dH"]))
    assert abs(float(stats["dH"])) < 0.1


def test_mdscheme_toml_plumbs_to_updater():
    """The MDscheme/omelyan_lambda TOML extension keys reach the
    factory's integrator selection."""
    from latticeqcd_tpu.system.params import construct_params_from_toml
    from latticeqcd_tpu.updates.factory import _md_scheme

    p = construct_params_from_toml(
        {"HMC related": {"MDscheme": "Omelyan", "omelyan_lambda": 0.17}},
        make_dirs=False,
    )
    assert _md_scheme(p) == "Omelyan"
    assert p.omelyan_lambda == 0.17
    p2 = construct_params_from_toml({"HMC related": {"QPQ": False}}, make_dirs=False)
    assert _md_scheme(p2) == "PQP"
    p3 = construct_params_from_toml(
        {"HMC related": {"MDscheme": "bogus"}}, make_dirs=False
    )
    with pytest.raises(ValueError, match="MDscheme"):
        _md_scheme(p3)


@pytest.mark.slow
def test_step_batched_matches_per_chain():
    """step_batched = vmap of the fused trajectory: each chain evolves
    exactly as it would alone with the same key."""
    u1, act = _setup(seed=31)
    u2, _ = _setup(seed=32)
    us = jnp.stack([u1, u2])
    keys = jnp.stack([jax.random.PRNGKey(41), jax.random.PRNGKey(42)])
    hmc = HMC(action=act, dtau=0.05, md_steps=4, staged=False)
    us_out, keys_out, stats = hmc.step_batched(us, keys)
    assert stats["dH"].shape == (2,)
    for i, (ui, ki) in enumerate(((u1, keys[0]), (u2, keys[1]))):
        uo, ko, st = hmc.step(ui, ki)
        assert abs(float(st["dH"]) - float(stats["dH"][i])) < 1e-10
        assert bool(st["accepted"]) == bool(stats["accepted"][i])
        assert float(jnp.max(jnp.abs(uo - us_out[i]))) < 1e-12
    with pytest.raises(ValueError, match="nchain"):
        hmc.step_batched(u1, keys)


@pytest.mark.slow
def test_step_batched_dynamical():
    """Batched chains with a fermion action: the vmapped CG while_loop
    sits at program top level; dH finite and chain-independent."""
    from latticeqcd_tpu.ops.dirac.staggered import StaggeredDirac
    from latticeqcd_tpu.ops.fermion_action import StaggeredFermiAction

    u1, act = _setup(seed=33)
    u2, _ = _setup(seed=34)
    fa = StaggeredFermiAction(
        StaggeredDirac(mass=0.5, lattice=LAT), nf=4, eps_cg=1e-18, max_cg=500
    )
    hmc = HMC(action=act, dtau=0.05, md_steps=2, fermi_action=fa, staged=False)
    us_out, _, stats = hmc.step_batched(
        jnp.stack([u1, u2]),
        jnp.stack([jax.random.PRNGKey(51), jax.random.PRNGKey(52)]),
    )
    assert bool(jnp.all(jnp.isfinite(stats["dH"])))
    uo, _, st = hmc.step(u1, jax.random.PRNGKey(51))
    assert abs(float(st["dH"]) - float(stats["dH"][0])) < 1e-8
