"""Updater factory: update_method -> HMC | Heatbath | Fileloading.

Counterpart of Updatemethod (SURVEY.md 2.2;
/root/reference/src/updates/AbstractUpdate.jl:33-105).
"""

from __future__ import annotations

from latticeqcd_tpu.updates.fileloading import GivenConfigurations
from latticeqcd_tpu.updates.heatbath import Heatbath
from latticeqcd_tpu.updates.hmc import HMC
from latticeqcd_tpu.updates.slhmc import SLHMC, SLMC


def updatemethod(p, univ):
    method = p.update_method
    if method == "HMC":
        return HMC(
            action=univ.gauge_action,
            dtau=p.dtau,
            md_steps=p.MDsteps,
            scheme="QPQ" if p.QPQ else "PQP",
            sexton_weingarten=p.SextonWeingargten,
            nsw=p.N_SextonWeingargten,
            fermi_action=None if univ.quench else univ.fermi_action,
            smearing=univ.cov_neural_net,
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
            scheme="QPQ" if p.QPQ else "PQP",
        )
    if method == "SLMC":
        if not univ.quench:
            raise ValueError(
                "SLMC with dynamical fermions needs an exact fermion action; "
                "construct updates.slhmc.SLMC with fermi_logdet="
                "dense_logdet_fermi_action(...) directly (small lattices only), "
                "or use update_method='SLHMC'"
            )
        return SLMC(
            action=univ.gauge_action,
            beta_eff=p.beta_eff,
            firstlearn=p.firstlearn,
            couplinglist=tuple(p.couplinglist) if p.couplinglist else ("plaquette",),
            lattice=p.L,
            iteration_max=p.ITERATION_MAX,
        )
    raise ValueError(f"update_method {method!r} is not supported")
