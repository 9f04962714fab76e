import os
import shutil

import pytest

from latticeqcd_tpu.system.legacy_input import legacy_jl_to_toml_dict, parse_legacy_jl, transform_to_toml
from latticeqcd_tpu.system.params import construct_params_from_toml


def test_parse_reference_legacy_jl(reference_dir):
    d = parse_legacy_jl(os.path.join(reference_dir, "test", "test01.jl"))
    assert d["system"]["L"] == (4, 4, 4, 4)
    assert d["system"]["β"] == 5.7
    assert d["system"]["Dirac_operator"] is None
    assert d["md"]["MDsteps"] == 15
    methods = d["measurement"]["measurement_methods"]
    assert len(methods) == 5
    names = {m["methodname"] for m in methods}
    assert "Chiral_condensate" in names and "Pion_correlator" in names


def test_legacy_roundtrip_to_params(reference_dir, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    shutil.copy(os.path.join(reference_dir, "test", "test01.jl"), tmp_path / "t.jl")
    toml_path = transform_to_toml(str(tmp_path / "t.jl"))
    p = construct_params_from_toml(toml_path, make_dirs=False)
    assert p.L == (4, 4, 4, 4)
    assert p.beta == 5.7
    assert p.MDsteps == 15
    assert abs(p.dtau - 0.06666666666666667) < 1e-15
    assert p.Dirac_operator is None and p.quench
    names = {m["methodname"] for m in p.measurement_methods}
    assert names == {
        "Chiral_condensate",
        "Polyakov_loop",
        "Topological_charge",
        "Pion_correlator",
        "Plaquette",
    }
    # fermionic measurement params moved under fermion_parameters
    pion = next(m for m in p.measurement_methods if m["methodname"] == "Pion_correlator")
    assert pion["fermion_parameters"]["Dirac_operator"] == "Wilson"
    assert pion["fermion_parameters"]["hop"] == 0.141139
    cc = next(m for m in p.measurement_methods if m["methodname"] == "Chiral_condensate")
    assert cc["fermion_parameters"]["Dirac_operator"] == "Staggered"
    assert cc["fermion_parameters"]["mass"] == 0.5


@pytest.mark.parametrize("jlname", ["test02.jl", "test_wilson.jl", "test_staggered.jl", "test_Nf2.jl"])
def test_other_reference_legacy_files_parse(reference_dir, jlname, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    shutil.copy(os.path.join(reference_dir, "test", jlname), tmp_path / jlname)
    toml_path = transform_to_toml(str(tmp_path / jlname))
    p = construct_params_from_toml(toml_path, make_dirs=False)
    assert p.L == (4, 4, 4, 4)


def test_legacy_eval_is_restricted(tmp_path):
    """parse_legacy_jl must not execute arbitrary expressions: the old
    bare-eval approach was escapable via literal attribute chains
    (ADVICE r3); the AST walker rejects attribute access and unknown
    names instead of evaluating them."""
    import pytest as _pytest

    from latticeqcd_tpu.system.legacy_input import parse_legacy_jl

    bad = tmp_path / "evil.jl"
    bad.write_text(
        'system["L"] = ().__class__.__mro__[1].__subclasses__()\n'
    )
    with _pytest.raises(ValueError):
        parse_legacy_jl(str(bad))

    bad2 = tmp_path / "evil2.jl"
    bad2.write_text('system["L"] = __import__("os").getcwd()\n')
    with _pytest.raises(ValueError):
        parse_legacy_jl(str(bad2))

    # the arithmetic the real files use still works
    ok = tmp_path / "ok.jl"
    ok.write_text(
        'md["MDsteps"] = 20\n'
        'md["dtau"] = 1/md["MDsteps"]\n'
        'system["L"] = [4, 4, 4, 2*2]\n'
    )
    d = parse_legacy_jl(str(ok))
    assert d["md"]["dtau"] == 0.05
    assert d["system"]["L"] == [4, 4, 4, 4]
