"""Self-learning HMC / MC (updates/slhmc.py).

The reference advertises SLHMC (README.md:113) but its factory never
wires it (SURVEY.md 2.2); these tests pin the working implementation:
exactness of the accept step, coupling learning, the TOML/factory
path, and SLMC's reweighted heatbath including the dense-logdet
fermion action.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latticeqcd_tpu.ops import fields, gauge_action as ga, sun
from latticeqcd_tpu.ops.wilsonline import make_loops_fromname
from latticeqcd_tpu.updates import SLHMC, SLMC
from latticeqcd_tpu.updates.slhmc import dense_logdet_fermi_action

LAT = (4, 4, 4, 4)


def test_slhmc_learns_exact_quenched_coupling():
    """For a quenched plaquette target the true action lies exactly in
    the learned span, so the least-squares fit recovers beta exactly
    after enough samples — and acceptance then matches plain HMC."""
    beta = 5.7
    act = ga.wilson_gauge_action(3, beta)
    # deliberately wrong initial effective coupling
    up = SLHMC(act, dtau=0.01, md_steps=10, beta_eff=3.0, firstlearn=1)
    u = fields.hot_start(LAT, 3, seed=1)
    key = jax.random.PRNGKey(7)
    for _ in range(4):
        u, key, stats = up.step(u, key)
    assert abs(up.beta_eff[0] - beta) < 1e-6
    # with the learned (exact) coupling MD conserves the true H well
    u, key, stats = up.step(u, key)
    assert abs(float(stats["dH"])) < 0.1


def test_slhmc_wrong_action_still_exact_metropolis():
    """dH uses the TRUE action even when MD runs on a wrong effective
    action (SLHMC.jl:60-85 semantics)."""
    act = ga.wilson_gauge_action(2, 1.9)
    up = SLHMC(act, dtau=0.05, md_steps=8, beta_eff=1.0, learn=False)
    u = fields.hot_start(LAT, 2, seed=2)
    key = jax.random.PRNGKey(3)
    u1, key, stats = up.step(u, key)
    # the true-action energies are reported
    assert float(stats["sg_old"]) != pytest.approx(float(stats["sg_new"]))
    if not stats["accepted"]:
        assert float(jnp.max(jnp.abs(u1 - u))) == 0.0


def test_slhmc_dynamical_staggered_runs():
    """Dynamical SLHMC: MD is gluonic, pseudofermion action enters only
    at the endpoints; the chain must run and accept at 4^4."""
    from latticeqcd_tpu.ops.dirac.staggered import StaggeredDirac
    from latticeqcd_tpu.ops.fermion_action import StaggeredFermiAction

    fa = StaggeredFermiAction(dirac=StaggeredDirac(mass=1.0, lattice=LAT),
                              nf=4, eps_cg=1e-12, max_cg=500)
    act = ga.wilson_gauge_action(3, 5.7)
    up = SLHMC(act, dtau=0.02, md_steps=5, fermi_action=fa,
               beta_eff=5.7, firstlearn=2)
    u = fields.cold_start(LAT, 3)
    key = jax.random.PRNGKey(11)
    accepted = 0
    for _ in range(4):
        u, key, stats = up.step(u, key)
        accepted += int(stats["accepted"])
        assert np.isfinite(float(stats["dH"]))
    assert accepted >= 1
    # the learned effective coupling has been refit from chain data
    assert len(up.learner.targets) == 5  # start point + 4 proposals


def test_slhmc_via_toml_driver(tmp_path):
    """update_method = 'SLHMC' runs through the TOML driver (the
    reference errors on this; parameters_TOML.jl:253-259)."""
    toml = tmp_path / "slhmc.toml"
    toml.write_text(
        """
["Physical setting"]
L = [4, 4, 4, 4]
"β" = 5.7
NC = 3
Nsteps = 3
update_method = "SLHMC"
"βeff" = 4.0
firstlearn = 1
initial = "hot"

["Physical setting(fermions)"]
quench = true
"""
    )
    from latticeqcd_tpu.system.lqcd import run_lqcd_file

    plaq = run_lqcd_file(str(toml), make_dirs=False)
    assert 0.0 < plaq < 1.0


def test_slmc_quenched_exact_when_matched():
    """SLMC with eff action == true action: Delta(S_true - S_eff) = 0,
    every heatbath proposal accepted."""
    act = ga.wilson_gauge_action(2, 1.9)
    up = SLMC(act, beta_eff=1.9, learn=False)
    u = fields.hot_start(LAT, 2, seed=5)
    key = jax.random.PRNGKey(13)
    for _ in range(3):
        u, key, stats = up.step(u, key)
        assert stats["accepted"]
        assert abs(float(stats["dH"])) < 1e-8


def test_slmc_learns_and_accepts_mismatched():
    """True plaquette action, eff coupling starts wrong: the learner
    recovers beta (exact span) and acceptance recovers to 1."""
    act = ga.wilson_gauge_action(2, 1.9)
    up = SLMC(act, beta_eff=1.2, firstlearn=1)
    u = fields.hot_start(LAT, 2, seed=6)
    key = jax.random.PRNGKey(17)
    for _ in range(4):
        u, key, stats = up.step(u, key)
    assert abs(up.beta_eff[0] - 1.9) < 1e-6
    u, key, stats = up.step(u, key)
    assert stats["accepted"] and abs(float(stats["dH"])) < 1e-8


@pytest.mark.slow
def test_slmc_rect_basis_learns_two_couplings():
    """Two-coupling true action (plaquette + rectangular) against a
    two-element learned basis: lstsq recovers both couplings."""
    loops_p = make_loops_fromname("plaquette", 4)
    loops_r = make_loops_fromname("rectangular", 4)
    act = ga.general_gauge_action(2, [1.9, -0.3], [loops_p, loops_r])
    up = SLMC(act, beta_eff=[1.0, 0.0], firstlearn=1,
              couplinglist=("plaquette", "rectangular"))
    u = fields.hot_start(LAT, 2, seed=8)
    key = jax.random.PRNGKey(19)
    for _ in range(5):
        u, key, stats = up.step(u, key)
    assert abs(up.beta_eff[0] - 1.9) < 1e-5
    assert abs(up.beta_eff[1] + 0.3) < 1e-5


def test_dense_logdet_free_staggered():
    """Dense -log det(D^dag D) at U=1 matches the analytic free-field
    staggered determinant: eigenvalues m^2 + sum_mu sin^2 p_mu with
    antiperiodic-t momenta (BC [1,1,1,-1])."""
    from latticeqcd_tpu.ops.dirac.staggered import StaggeredDirac
    from latticeqcd_tpu.ops.dirac.wilson import apply_boundary_phases

    lat = (2, 2, 2, 2)
    mass = 0.5
    d = StaggeredDirac(mass=mass, lattice=lat)
    u = apply_boundary_phases(fields.cold_start(lat, 3), (1, 1, 1, -1))
    sf = dense_logdet_fermi_action(d, lat + (3,), weight=0.5)
    got = float(sf(u))

    # analytic: det(D^dag D) = prod_p (m^2 + sum sin^2 p)^{NC}
    total = 0.0
    for nx in range(lat[0]):
        for ny in range(lat[1]):
            for nz in range(lat[2]):
                for nt in range(lat[3]):
                    px = 2 * np.pi * nx / lat[0]
                    py = 2 * np.pi * ny / lat[1]
                    pz = 2 * np.pi * nz / lat[2]
                    pt = 2 * np.pi * (nt + 0.5) / lat[3]
                    lam = mass**2 + sum(np.sin(p) ** 2 for p in (px, py, pz, pt))
                    total += 3 * np.log(lam)
    want = -0.5 * total
    assert got == pytest.approx(want, rel=1e-10)


def test_integrated_hmc_exact_fermion_via_toml(tmp_path):
    """IntegratedHMC (legacy mainrun.jl:475-500): gauge-only MD with the
    dense -log det fermion action in the Metropolis test, through the
    TOML driver on a 4^4 staggered system."""
    toml = tmp_path / "ihmc.toml"
    toml.write_text(
        """
["Physical setting"]
L = [4, 4, 4, 4]
"β" = 5.7
NC = 3
Nsteps = 2
update_method = "IntegratedHMC"
initial = "cold"

["Physical setting(fermions)"]
quench = false
Dirac_operator = "Staggered"
mass = 1.0
Nf = 4

["HMC related"]
MDsteps = 5
"Δτ" = 0.02
"""
    )
    from latticeqcd_tpu.system.lqcd import run_lqcd_file

    plaq = run_lqcd_file(str(toml), make_dirs=False)
    assert 0.0 < plaq <= 1.0


def test_integrated_hb_matches_heatbath_when_quenched():
    """Quenched IntegratedHB with beta_eff == beta is exact heatbath:
    every reweighted proposal accepted."""
    from latticeqcd_tpu.updates.slhmc import integrated_hb

    act = ga.wilson_gauge_action(2, 1.9)
    up = integrated_hb(act)
    u = fields.hot_start(LAT, 2, seed=12)
    key = jax.random.PRNGKey(23)
    for _ in range(2):
        u, key, stats = up.step(u, key)
        assert stats["accepted"] and abs(float(stats["dH"])) < 1e-8


def test_integrated_hmc_consistency_small():
    """The dense logdet changes dH exactly by the fermion-action
    difference: IntegratedHMC dH == quenched dH + (Sf_new - Sf_old)
    for the same key (the fermion force never enters the MD)."""
    from latticeqcd_tpu.ops.dirac.staggered import StaggeredDirac
    from latticeqcd_tpu.ops.dirac.wilson import apply_boundary_phases
    from latticeqcd_tpu.updates.slhmc import (
        dense_logdet_fermi_action,
        integrated_hmc,
    )

    lat = (2, 2, 2, 2)
    act = ga.wilson_gauge_action(3, 5.7)
    d = StaggeredDirac(mass=0.7, lattice=lat)
    sf0 = dense_logdet_fermi_action(d, lat + (3,), weight=0.5)
    sf = lambda u: sf0(apply_boundary_phases(u, (1, 1, 1, -1)))

    u = fields.hot_start(lat, 3, seed=13)
    key = jax.random.PRNGKey(29)

    up_q = integrated_hmc(act, dtau=0.05, md_steps=4)
    up_f = integrated_hmc(act, dtau=0.05, md_steps=4, fermi_logdet=sf)
    _, _, st_q = up_q.step(u, key)
    u_new, _, st_f = up_f.step(u, key)
    dsf = float(st_f["sf_new"] - st_f["sf_old"])
    assert float(st_f["dH"]) == pytest.approx(float(st_q["dH"]) + dsf, abs=1e-9)
