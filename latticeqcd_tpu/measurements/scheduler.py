"""Measurement scheduling + text output layer.

Mirror of the wrapper's measurement adapter (SURVEY.md 2.2 row
"Measurement adapter"; /root/reference/src/measurements/
measurement_parameters_set.jl): `MeasurementSet` is built from the
TOML `measurement_methods` dicts, opens one output file
`<measuredir>/<methodname>.txt` per method (:81), and
`calc_measurement_values` runs every method whose itrj is a multiple
of its `measure_every` (:28-42). Output line formats replicate the
reference kernels (cited per class).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from latticeqcd_tpu.measurements import fermionic, observables
from latticeqcd_tpu.ops.dirac.staggered import StaggeredDirac
from latticeqcd_tpu.ops.dirac.wilson import WilsonDirac
from latticeqcd_tpu.ops.dirac.domainwall import DomainwallDirac


def build_dirac_from_params(params: Dict[str, Any], lattice, default_bc=(1, 1, 1, -1)):
    """fermion_parameters dict -> Dirac operator (universe.jl:100-137
    key conventions; defaults from parameter_structs.jl:122-142)."""
    kind = params.get("Dirac_operator", "Wilson")
    bc = tuple(params.get("boundarycondition", default_bc))
    if kind in ("Wilson", "WilsonClover"):
        kappa = float(params.get("hop", params.get("kappa", 0.141139)))
        r = float(params.get("r", 1.0))
        csw = float(params.get("Clover_coefficient", 0.0)) if kind == "WilsonClover" else 0.0
        return WilsonDirac(kappa=kappa, r=r, bc=bc, csw=csw)
    if kind in ("Staggered", "staggered"):
        mass = float(params.get("mass", 0.5))
        return StaggeredDirac(mass=mass, lattice=tuple(lattice), bc=bc)
    if kind in ("Domainwall", "domainwall"):
        return DomainwallDirac(
            mass=float(params.get("Domainwall_m", params.get("mass", 1.0))),
            m5=float(params.get("Domainwall_M", params.get("M", -1.0))),
            l5=int(params.get("Domainwall_L5", params.get("L5", 4))),
            bc=bc,
        )
    raise ValueError(f"unknown Dirac_operator {kind!r}")


@dataclass
class Measurement:
    name: str
    interval: int
    params: Dict[str, Any]
    fp: Optional[Any] = None

    def measure(self, u, itrj, additional_string=""):
        raise NotImplementedError

    def emit(self, line: str):
        if self.fp is not None:
            self.fp.write(line + "\n")
            self.fp.flush()
        return line


class PlaquetteMeasurement(Measurement):
    """format: "$itrj $additional $plaq # plaq" (measure_plaquette.jl:85)."""

    def measure(self, u, itrj, additional_string=""):
        plaq = float(observables.mean_plaquette(u))
        s = self.emit(f"{itrj} {additional_string}{plaq} # plaq")
        return plaq, s


class PolyakovMeasurement(Measurement):
    """format: "$itrj $additional $re $im # poly" (measure_polyakov.jl:63)."""

    def measure(self, u, itrj, additional_string=""):
        p = complex(observables.polyakov_loop(u))
        s = self.emit(f"{itrj} {additional_string}{p.real} {p.imag} # poly")
        return p, s


class TopologicalChargeMeasurement(Measurement):
    """kinds_of_topological_charge: plaquette and/or clover (clover also
    emits the O(a^2)-improved value) — measure_topological_charge.jl:85-126."""

    def measure(self, u, itrj, additional_string=""):
        kinds = self.params.get("kinds_of_topological_charge", ["plaquette", "clover"])
        values: List[float] = []
        header: List[str] = []
        for kind in kinds:
            if kind == "plaquette":
                values.append(float(observables.topological_charge(u, "plaquette")))
                header.append("Qplaq")
            elif kind == "clover":
                qc = float(observables.topological_charge(u, "clover"))
                qi = float(observables.topological_charge(u, "improved"))
                values.extend([qc, qi])
                header.extend(["Qclover", "Qimproved"])
            else:
                raise ValueError(f"topological charge kind {kind!r}")
        s = self.emit(
            f"{itrj} {additional_string}"
            + " ".join(str(v) for v in values)
            + " # itrj "
            + " ".join(header)
        )
        return values, s


class EnergyDensityMeasurement(Measurement):
    """format: "$itrj $additional $value # energydensity"
    (measure_energy_density.jl:80)."""

    def measure(self, u, itrj, additional_string=""):
        e = float(observables.energy_density(u))
        s = self.emit(f"{itrj} {additional_string}{e} # energydensity")
        return e, s


class WilsonLoopMeasurement(Measurement):
    """RxT Wilson loops, R,T = 1..{R,T}max (measure_Wilsonloop.jl:106-135)."""

    def measure(self, u, itrj, additional_string=""):
        lattice = u.shape[1:5]
        # Reference defaults are FIXED Rmax=Tmax=4 (parameter_structs.jl:387-388),
        # not L/2 (that is only the wizard's prompt suggestion, :562-569);
        # match them so a TOML without explicit Rmax/Tmax gets identical
        # Wilson_loop.txt columns (loops wrap via jnp.roll at R >= L,
        # exactly as the reference's periodic shifts do).
        rmax = int(self.params.get("Rmax", 4))
        tmax = int(self.params.get("Tmax", 4))
        lines = []
        vals = np.zeros((rmax, tmax))
        for r in range(1, rmax + 1):
            for t in range(1, tmax + 1):
                w = float(observables.wilson_loop_rt(u, r, t))
                vals[r - 1, t - 1] = w
                lines.append(self.emit(f"{itrj} {additional_string}{r} {t} {w} # RxT wilson loop"))
        return vals, "\n".join(lines)


class ChiralCondensateMeasurement(Measurement):
    """Stochastic pbp (measure_chiral_condensate.jl:164-204); staggered
    factor Nf/4."""

    def __post_init__(self):
        pass

    def measure(self, u, itrj, additional_string=""):
        fparams = self.params.get("fermion_parameters", {"Dirac_operator": "Staggered"})
        dirac = build_dirac_from_params(fparams, u.shape[1:5])
        nr = int(self.params.get("Nr", 10))
        factor = 1.0
        if isinstance(dirac, StaggeredDirac):
            factor = float(fparams.get("Nf", 4)) / 4.0
        key = jax.random.PRNGKey(int(self.params.get("noise_seed", 4513)) + itrj)
        eps = float(self.params.get("eps", 1e-19))
        maxiter = int(self.params.get("MaxCGstep", 3000))
        pbp, vals = fermionic.chiral_condensate(
            u, dirac, key, nr=nr, nf_factor=factor, eps=eps, maxiter=maxiter
        )
        lines = []
        for ir, v in enumerate(vals, start=1):
            lines.append(
                self.emit(f"# {itrj} {ir} {additional_string}{v} # itrj irand chiralcond")
            )
        lines.append(self.emit(f"{itrj} {pbp} # pbp Nr={nr}"))
        return pbp, "\n".join(lines)


class PionCorrelatorMeasurement(Measurement):
    """Point-source pion correlator (measure_Pion_correlator.jl:188-330)."""

    def measure(self, u, itrj, additional_string=""):
        fparams = self.params.get("fermion_parameters", {"Dirac_operator": "Wilson"})
        dirac = build_dirac_from_params(fparams, u.shape[1:5])
        eps = float(self.params.get("eps", 1e-19))
        maxiter = int(self.params.get("MaxCGstep", 3000))
        cpi = fermionic.pion_correlator(u, dirac, eps=eps, maxiter=maxiter)
        line = f"{itrj} " + " ".join(str(float(c)) for c in cpi) + " "
        s = self.emit(line)
        self.emit("#pioncorrelator")
        return cpi, s


class DiracSpectrumMeasurement(Measurement):
    """k lowest eigenvalues of the measurement operator (staggered
    packed W or D^dag D) via the jitted Lanczos sweep — a
    beyond-reference method (the reference has no eigensolver; see
    fermionic.dirac_low_spectrum for conventions and caveats).
    format: "$itrj $additional $lam1 ... $lamk # dirac low spectrum"."""

    def measure(self, u, itrj, additional_string=""):
        fparams = self.params.get("fermion_parameters", {"Dirac_operator": "Staggered"})
        dirac = build_dirac_from_params(fparams, u.shape[1:5])
        k = int(self.params.get("Neig", 8))
        m = self.params.get("Nlanczos")
        vals = fermionic.dirac_low_spectrum(
            u, dirac, k=k, m=int(m) if m is not None else None)
        s = self.emit(f"{itrj} {additional_string}"
                      + " ".join(f"{v:.10g}" for v in vals)
                      + " # dirac low spectrum")
        return vals, s


_REGISTRY = {
    "Plaquette": PlaquetteMeasurement,
    "Polyakov_loop": PolyakovMeasurement,
    "Topological_charge": TopologicalChargeMeasurement,
    "Energy_density": EnergyDensityMeasurement,
    "Wilson_loop": WilsonLoopMeasurement,
    "Chiral_condensate": ChiralCondensateMeasurement,
    "Pion_correlator": PionCorrelatorMeasurement,
    "Dirac_spectrum": DiracSpectrumMeasurement,
}


@dataclass
class MeasurementSet:
    """Measurement_methods equivalent (measurement_parameters_set.jl:21-99)."""

    measurements: List[Measurement] = field(default_factory=list)

    @classmethod
    def from_methods(cls, method_dicts, measuredir: Optional[str] = None, suffix: str = ""):
        """`suffix` distinguishes flowed-measurement files from regular
        ones of the same methodname (the reference opens the same
        <methodname>.txt twice, which clobbers; we write
        <methodname><suffix>.txt instead)."""
        ms = []
        for method in method_dicts or []:
            name = method.get("methodname")
            if name not in _REGISTRY:
                raise ValueError(f"measurement method {name!r} is not supported")
            interval = int(method.get("measure_every", 1))
            fp = None
            # multi-host: measurement values are replicated scalars, so
            # only process 0 writes the text series (the reference's
            # rank-0-gated measurement files)
            if measuredir is not None and jax.process_index() == 0:
                os.makedirs(measuredir, exist_ok=True)
                fp = open(os.path.join(measuredir, f"{name}{suffix}.txt"), "w")
            ms.append(_REGISTRY[name](name=name, interval=interval, params=dict(method), fp=fp))
        return cls(measurements=ms)

    def calc_measurement_values(self, itrj, u, additional_string=""):
        """Run all methods due at itrj; returns the emitted strings
        (calc_measurement_values, measurement_parameters_set.jl:28-42)."""
        out = []
        for m in self.measurements:
            if m.interval > 0 and itrj % m.interval == 0:
                _, s = m.measure(u, itrj, additional_string=additional_string)
                out.append(s)
        return out

    def close(self):
        for m in self.measurements:
            if m.fp is not None:
                m.fp.close()
                m.fp = None
