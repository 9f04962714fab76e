"""Updater factory: update_method -> HMC | Heatbath | Fileloading.

Counterpart of Updatemethod (SURVEY.md 2.2;
/root/reference/src/updates/AbstractUpdate.jl:33-105).
"""

from __future__ import annotations

from latticeqcd_tpu.updates.fileloading import GivenConfigurations
from latticeqcd_tpu.updates.heatbath import Heatbath
from latticeqcd_tpu.updates.hmc import HMC


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
    raise ValueError(f"update_method {method!r} is not supported")
