"""Legacy pre-1.0 `.jl` parameter-file support.

Counterpart of transform_oldinputfile.jl (SURVEY.md 2.2;
/root/reference/src/system/transform_oldinputfile.jl:120-258): the
old format is Julia assignments into four dicts (system, actions, md,
measurement — see e.g. /root/reference/test/test01.jl). The
reference `include`s the file (executes it); here the Julia literals
are transliterated to Python expressions and evaluated with an empty
builtins namespace, then mapped onto the Params TOML-section layout.
"""

from __future__ import annotations

import re
from typing import Any, Dict


def _dictcall(*args):
    return dict(zip(args[0::2], args[1::2]))


_REPLACEMENTS = [
    (re.compile(r"Dict\{[^}]*\}\("), "_D("),
    (re.compile(r"\bDict\["), "["),
    (re.compile(r"\bAny\["), "["),
    (re.compile(r"=>"), ","),
    (re.compile(r"\bnothing\b"), "None"),
    (re.compile(r"\btrue\b"), "True"),
    (re.compile(r"\bfalse\b"), "False"),
]


def _julia_literal(expr: str):
    for pat, rep in _REPLACEMENTS:
        expr = pat.sub(rep, expr)
    return eval(  # noqa: S307 - mirrors the reference's include() of the file
        compile(expr, "<legacy-jl>", "eval"), {"__builtins__": {}}, {"_D": _dictcall}
    )


_ASSIGN = re.compile(r'^(system|actions|md|measurement)\["([^"]+)"\]\s*=\s*(.*)$')


def parse_legacy_jl(path: str) -> Dict[str, Dict[str, Any]]:
    """Parse the four legacy dicts from a .jl parameter file."""
    dicts: Dict[str, Dict[str, Any]] = {
        "system": {},
        "actions": {},
        "md": {},
        "measurement": {},
    }
    with open(path) as fp:
        text = fp.read()
    # join continued lines: an assignment runs until brackets balance
    lines = text.split("\n")
    buf = ""
    target = None
    key = None
    for line in lines:
        line = line.split("#")[0].rstrip() if not buf else line.rstrip()
        if not buf:
            m = _ASSIGN.match(line.strip())
            if not m:
                continue
            target, key, rhs = m.group(1), m.group(2), m.group(3)
            buf = rhs
        else:
            buf += " " + line.strip()
        if buf.count("(") == buf.count(")") and buf.count("[") == buf.count("]"):
            dicts[target][key] = _julia_literal(buf)
            buf = ""
    return dicts


def _convert_measurement(method: Dict[str, Any]) -> Dict[str, Any]:
    """Old method dict -> new measurement_methods entry: fermiontype and
    fermion params move under fermion_parameters."""
    out = dict(method)
    ferm = out.pop("fermiontype", None)
    if ferm not in (None, "nothing"):
        fp = {"Dirac_operator": ferm}
        for k in ("mass", "Nf", "hop", "r", "BoundaryCondition", "M", "m", "L5"):
            if k in out:
                fp[k] = out.pop(k)
        out["fermion_parameters"] = fp
    return out


def legacy_jl_to_toml_dict(path: str) -> Dict[str, Any]:
    """Full conversion to the five-section TOML layout
    (transform_to_toml semantics)."""
    d = parse_legacy_jl(path)
    system = d["system"]
    md = d["md"]
    meas = d["measurement"]

    physical: Dict[str, Any] = {}
    fermions: Dict[str, Any] = {}
    control: Dict[str, Any] = {}
    hmc: Dict[str, Any] = {}

    phys_keys = {
        "L", "β", "NC", "Nthermalization", "Nsteps", "initial", "initialtrj",
        "update_method", "useOR", "numOR", "Nwing",
    }
    ferm_keys = {
        "quench", "Dirac_operator", "Clover_coefficient", "r", "hop", "Nf",
        "mass", "Domainwall_M", "Domainwall_m", "Domainwall_L5",
        "BoundaryCondition", "smearing_for_fermion", "stout_numlayers",
        "stout_ρ", "stout_loops",
    }
    for k, v in system.items():
        if k in phys_keys:
            physical[k] = list(v) if isinstance(v, tuple) else v
        elif k in ferm_keys:
            fermions[k] = v
        else:
            control[k] = v
    for k, v in md.items():
        hmc[k] = v
    # old files say quench via system["quench"]; Dirac_operator None => quenched
    if fermions.get("Dirac_operator") is None:
        fermions["Dirac_operator"] = "nothing"
        fermions["quench"] = True

    methods = {}
    for m in meas.get("measurement_methods", []):
        mm = _convert_measurement(m)
        methods[mm["methodname"]] = mm
    out = {
        "Physical setting": physical,
        "Physical setting(fermions)": fermions,
        "System Control": control,
        "HMC related": hmc,
        "Measurement set": {
            "measurement_methods": methods,
            "measurement_dir": meas.get("measurement_dir", ""),
            "measurement_basedir": meas.get("measurement_basedir", ""),
        },
    }
    return out


def transform_to_toml(jl_path: str, toml_path: str = None) -> str:
    """Write the converted TOML next to the .jl file (lqcd.jl:51 flow)."""
    from latticeqcd_tpu.system.wizard import write_toml

    data = legacy_jl_to_toml_dict(jl_path)
    if toml_path is None:
        toml_path = jl_path.rsplit(".", 1)[0] + ".toml"
    write_toml(data, toml_path)
    return toml_path
