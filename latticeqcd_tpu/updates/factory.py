"""Updater factory: update_method -> HMC | Heatbath | Fileloading.

Counterpart of Updatemethod (SURVEY.md 2.2;
/root/reference/src/updates/AbstractUpdate.jl:33-105).
"""

from __future__ import annotations

from latticeqcd_tpu.updates.fileloading import GivenConfigurations
from latticeqcd_tpu.updates.heatbath import Heatbath
from latticeqcd_tpu.updates.hmc import HMC
from latticeqcd_tpu.updates.slhmc import (
    SLHMC,
    SLMC,
    dense_logdet_fermi_action,
    integrated_hb,
    integrated_hmc,
)


def _md_scheme(p) -> str:
    """Integrator selection: the reference's QPQ bool
    (parameters_TOML.jl:230-277), or the explicit MDscheme extension
    ("QPQ" | "PQP" | "Omelyan", system/params.py)."""
    if getattr(p, "MDscheme", ""):
        scheme = str(p.MDscheme)
        if scheme not in ("QPQ", "PQP", "Omelyan"):
            raise ValueError(
                f"MDscheme must be 'QPQ', 'PQP' or 'Omelyan', got {scheme!r}"
            )
        return scheme
    return "QPQ" if p.QPQ else "PQP"


def updatemethod(p, univ):
    method = p.update_method
    if method == "HMC":
        return HMC(
            action=univ.gauge_action,
            dtau=p.dtau,
            md_steps=p.MDsteps,
            scheme=_md_scheme(p),
            sexton_weingarten=p.SextonWeingargten,
            nsw=p.N_SextonWeingargten,
            omelyan_lambda=p.omelyan_lambda,
            fermi_action=None if univ.quench else univ.fermi_action,
            smearing=univ.cov_neural_net,
            md_precision=p.MDprecision,
        )
    if method == "Heatbath":
        if not univ.quench:
            raise ValueError("Heatbath update is only for quench case!")
        return Heatbath(
            action=univ.gauge_action,
            iteration_max=p.ITERATION_MAX,
            use_or=p.useOR,
            num_or=p.numOR,
        )
    if method == "Fileloading":
        return GivenConfigurations.from_params(p, univ.L, univ.NC)
    if method == "SLHMC":
        # working implementation of the reference's advertised-but-dead
        # self-learning HMC (README.md:113, updates/SLHMC.jl)
        return SLHMC(
            action=univ.gauge_action,
            dtau=p.dtau,
            md_steps=p.MDsteps,
            fermi_action=None if univ.quench else univ.fermi_action,
            smearing=univ.cov_neural_net,
            beta_eff=p.beta_eff,
            firstlearn=p.firstlearn,
            couplinglist=tuple(p.couplinglist) if p.couplinglist else ("plaquette",),
            lattice=p.L,
            scheme=_md_scheme(p),
            omelyan_lambda=p.omelyan_lambda,
        )
    if method == "SLMC":
        # Dynamical SLMC (the reference's legacy SLMC-with-KS path,
        # test06_slmc_ks.toml / mainrun.jl:541-548) uses the EXACT
        # integrated fermion action in the reweighting Metropolis —
        # dense log det, so small lattices only (_exact_logdet guards).
        return SLMC(
            action=univ.gauge_action,
            beta_eff=p.beta_eff,
            firstlearn=p.firstlearn,
            couplinglist=tuple(p.couplinglist) if p.couplinglist else ("plaquette",),
            lattice=p.L,
            fermi_logdet=None if univ.quench else _exact_logdet(p, univ),
            iteration_max=p.ITERATION_MAX,
        )
    if method == "IntegratedHMC":
        # legacy integrated-fermion HMC (mainrun.jl:475-500): gauge-only
        # MD, exact -log det fermion action in the Metropolis test
        return integrated_hmc(
            univ.gauge_action,
            dtau=p.dtau,
            md_steps=p.MDsteps,
            fermi_logdet=_exact_logdet(p, univ),
            scheme=_md_scheme(p),
            omelyan_lambda=p.omelyan_lambda,
        )
    if method == "IntegratedHB":
        # legacy integrated-fermion heatbath (mainrun.jl:550-577)
        return integrated_hb(
            univ.gauge_action,
            fermi_logdet=_exact_logdet(p, univ),
            beta_eff=p.beta_eff,
            iteration_max=p.ITERATION_MAX,
        )
    raise ValueError(f"update_method {method!r} is not supported")


_INTEGRATED_MAX_DIM = 4608  # 4^4 Wilson = 3072; dense logdet is O(dim^3)


def _exact_logdet(p, univ):
    """U -> S_f(U) = -w log det(D^dag D), dense, for the Integrated*
    updaters (small lattices only)."""
    fa = univ.fermi_action
    if fa is None:
        return None
    from latticeqcd_tpu.ops.dirac.wilson import apply_boundary_phases
    from latticeqcd_tpu.ops.fermion_action import (
        StaggeredFermiAction,
        WilsonFermiAction,
    )

    lat = tuple(p.L)
    if isinstance(fa, StaggeredFermiAction):
        psi_shape = lat + (p.NC,)
        weight = fa.nf / 8.0  # det(D)^(Nf/4) = det(DdagD)^(Nf/8)
    elif isinstance(fa, WilsonFermiAction):
        psi_shape = lat + (4, p.NC)
        weight = 1.0  # two flavors: det(D)^2 = det(DdagD)
    else:
        raise ValueError(
            "IntegratedHMC/IntegratedHB support Wilson/Staggered fermions only"
        )
    dim = 1
    for n in psi_shape:
        dim *= n
    if dim > _INTEGRATED_MAX_DIM:
        raise ValueError(
            f"Integrated updaters build the dense Dirac matrix (dim={dim} > "
            f"{_INTEGRATED_MAX_DIM}); use HMC/SLHMC for lattices this large"
        )
    bc = tuple(p.BoundaryCondition)
    sf = dense_logdet_fermi_action(fa.dirac, psi_shape, weight)
    return lambda u: sf(apply_boundary_phases(u, bc))
