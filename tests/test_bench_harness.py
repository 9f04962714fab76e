"""bench.py harness logic (no TPU needed): headline best/this-run
reporting and the output-validity gates (VERDICT r3 weak #1/#2).

The gates' cross-backend body is exercised by stubbing
jax.default_backend to a non-"cpu" value so the "device" side and the
CPU reference both land on the CPU backend — the comparison machinery
(plane packing, device_put routing, elementwise diff) runs for real.
"""

import importlib.util
import json
import os

import jax
import pytest


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_headline_reports_best_and_this_run(bench, tmp_path):
    bench.PARTIAL = str(tmp_path / "partial.json")
    partial = {"tier1": {"dslash_us": 97.1, "dslash_gflops": 1781.2, "runs": 3}}
    state = {"fresh": {}}
    bench._record(partial, state, "tier1",
                  {"dslash_us": 121.2, "dslash_gflops": 1427.5,
                   "measured_at": "2026-08-21T13:00:00"})
    h = bench._headline(partial, "", state["fresh"])
    assert h["value"] == 1781.2  # best kept
    assert h["value_this_run"] == 1427.5  # fresh visible
    assert "below the best-ever" in h["note"]  # >15% regression warned
    json.dumps(h)  # headline must stay JSON-serializable

    # a fresh result that beats best replaces it, no warning
    state2 = {"fresh": {}}
    bench._record(partial, state2, "tier1",
                  {"dslash_us": 90.0, "dslash_gflops": 1900.0, "measured_at": "t"})
    h2 = bench._headline(partial, "", state2["fresh"])
    assert h2["value"] == h2["value_this_run"] == 1900.0
    assert "below" not in h2.get("note", "")

    # stale best with no fresh re-measurement is flagged
    h3 = bench._headline(partial, "", {})
    assert h3["value_this_run"] is None
    assert "PREVIOUS run" in h3["note"]


def test_headline_tier2_lower_is_better(bench, tmp_path):
    bench.PARTIAL = str(tmp_path / "partial.json")
    partial = {"tier2": {"wall_s": 10.0, "final_plaquette": 0.57,
                         "accepted": 18, "measured_at": "t"}}
    h = bench._headline(partial, "", {"tier2": {"wall_s": 13.0, "measured_at": "u"}})
    assert h["value"] == 10.0 and h["value_this_run"] == 13.0
    assert "below the best-ever" in h["note"]


def test_validity_gates_pass_on_faithful_device(bench, monkeypatch):
    """With default_backend stubbed non-cpu, jax.devices() still
    resolves to the CPU devices of the test suite, so 'device' output
    == CPU reference and both gates must pass; this runs their full
    body (plane packing, routing, diff)."""
    monkeypatch.setattr(jax, "default_backend", lambda: "faketpu")
    bench._validate_c64_dslash(jax)
    bench._validate_f32_window(jax, lat=(4, 4, 4, 4), interpret=True)


def test_validity_gate_fails_on_garbage(bench, monkeypatch):
    """If the 'device' computes garbage the gate must raise. Simulate
    by corrupting what the device side sees: patch device_put to zero
    complex arrays (as the flap-window TPU effectively did when it
    pinned plaquettes at 1.0)."""
    import numpy as np

    monkeypatch.setattr(jax, "default_backend", lambda: "faketpu")
    real_put = jax.device_put

    def corrupting_put(x, device=None):
        arr = np.asarray(x)
        if device is not None and device in jax.devices() and np.iscomplexobj(arr):
            return real_put(np.zeros_like(arr), device)
        return real_put(x, device)

    monkeypatch.setattr(jax, "device_put", corrupting_put)
    with pytest.raises(RuntimeError, match="validity check FAILED"):
        bench._validate_c64_dslash(jax)
