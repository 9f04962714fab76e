"""Bitwise checkpoint/resume (an improvement over the reference, whose
resume is statistical only — SURVEY.md section 5)."""

import os

import numpy as np
import pytest

from latticeqcd_tpu.system.lqcd import run_lqcd_params
from latticeqcd_tpu.system.params import Params


def _params(tmp_path, nsteps, save_dir):
    return Params(
        L=(4, 4, 4, 4),
        NC=2,
        beta=1.9,
        update_method="HMC",
        MDsteps=5,
        dtau=0.2,
        Nsteps=nsteps,
        initial="hot",
        saveU_format="NPZ",
        saveU_dir=str(save_dir),
        saveU_every=1,
        measurement_methods=[{"methodname": "Plaquette", "measure_every": 1}],
        measurement_basedir="",
        logfile="",
    )


@pytest.mark.slow
def test_bitwise_resume(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    d1 = tmp_path / "a"
    d2 = tmp_path / "b"
    d1.mkdir()
    d2.mkdir()

    # straight 6-trajectory run
    plaq_full = run_lqcd_params(_params(tmp_path, 6, d1), make_dirs=True)

    # 3 trajectories, then resume from the checkpoint for 3 more
    run_lqcd_params(_params(tmp_path, 3, d2), make_dirs=True)
    p2 = _params(tmp_path, 6, d2)
    plaq_resumed = run_lqcd_params(
        p2, make_dirs=True, resume_checkpoint=str(d2 / "checkpoint.npz")
    )

    assert plaq_full == pytest.approx(plaq_resumed, abs=1e-14)
    # the per-trajectory configs must agree bitwise as well
    a = np.load(d1 / "conf_00000006.npz")["u"]
    b = np.load(d2 / "conf_00000006.npz")["u"]
    assert np.array_equal(a, b)
