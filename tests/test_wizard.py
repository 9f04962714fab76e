import os

from latticeqcd_tpu.system.params import construct_params_from_toml
from latticeqcd_tpu.system.wizard import generate_parameters, run_wizard, write_toml


def test_wizard_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    fn = run_wizard(
        filename=str(tmp_path / "gen.toml"),
        interactive=False,
        L=(4, 4, 4, 8),
        beta=5.9,
        fermion="Staggered",
        mass=0.3,
        nf=2,
        stout=True,
        measurements=("Plaquette", "Topological_charge", "Pion_correlator"),
        gradientflow_measurements=("Topological_charge",),
        saveU_format="ILDG",
    )
    p = construct_params_from_toml(fn, make_dirs=False)
    assert p.L == (4, 4, 4, 8)
    assert p.beta == 5.9
    assert p.Dirac_operator == "Staggered"
    assert p.mass == 0.3 and p.Nf == 2
    assert not p.quench
    assert p.smearing_for_fermion == "stout"
    assert p.stout_rho == [0.1]
    assert p.hasgradientflow
    assert {m["methodname"] for m in p.measurement_methods} == {
        "Plaquette",
        "Topological_charge",
        "Pion_correlator",
    }
    assert p.measurements_for_flow[0]["methodname"] == "Topological_charge"
    assert p.saveU_format == "ILDG"


def test_wizard_quenched_heatbath(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    fn = write_toml(
        generate_parameters(update_method="Heatbath", use_or=True, num_or=4),
        str(tmp_path / "hb.toml"),
    )
    p = construct_params_from_toml(fn, make_dirs=False)
    assert p.update_method == "Heatbath"
    assert p.useOR and p.numOR == 4
    assert p.quench
