"""Benchmark: the reference's published headline workload on TPU.

Reference numbers (BASELINE.md / docs/src/index.md:112-160): 20 HMC
trajectories of 2-flavor Wilson at 4^4, beta=6.0, kappa=0.141139,
r=1, MDsteps=10, dtau=0.1 — 180.41 s user on a 3.2 GHz 6-core i7
(LatticeQCD.jl), 227.40 s for the Fortran LTK code.

Prints ONE JSON line: wall-clock for the same 20-trajectory workload
here (steady-state, post-compile), vs_baseline = 180.41 / ours
(>1 means faster than the reference).

Precision: tries float64 (matching the reference's CG eps=1e-19); on
TPU generations without usable f64 falls back to float32 with a
relaxed eps (noted in the JSON "precision" field).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

BASELINE_SECONDS = 180.41
CACHE_DIR = "/root/repo/.jax_cache"


def _warmup_subprocess(retries: int = 4, timeout_s: int = 900) -> bool:
    """Populate the persistent compile cache in expendable subprocesses.

    The remote TPU compiler intermittently stalls/fails and poisons
    its process; the persistent cache survives, so retrying a one-
    trajectory warmup in fresh processes converges to a fully cached
    program set, after which the timed run never compiles."""
    for attempt in range(retries):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--warmup"],
                timeout=timeout_s,
                capture_output=True,
            )
            if r.returncode == 0:
                return True
            sys.stderr.write(
                f"# warmup attempt {attempt+1} rc={r.returncode}: "
                f"{r.stderr.decode()[-200:]}\n"
            )
        except subprocess.TimeoutExpired:
            sys.stderr.write(f"# warmup attempt {attempt+1} timed out\n")
    return False


def _run(dtype_name: str, eps_cg: float, n_traj: int = 20):
    import jax
    import jax.numpy as jnp

    from latticeqcd_tpu.io import load_bridge_text
    from latticeqcd_tpu.ops import gauge_action as ga
    from latticeqcd_tpu.ops.dirac.wilson import WilsonDirac
    from latticeqcd_tpu.ops.fermion_action import WilsonFermiAction
    from latticeqcd_tpu.updates import HMC

    dtype = jnp.dtype(dtype_name)
    u = load_bridge_text(
        "/root/reference/test/confs_HMC_L04040404_beta5.7_Wilson_kappa0.141139/"
        "conf_00000100.ildg.txt",
        (4, 4, 4, 4),
        3,
        dtype=dtype,
    )
    fa = WilsonFermiAction(WilsonDirac(kappa=0.141139, r=1.0), eps_cg=eps_cg, max_cg=3000)
    hmc = HMC(action=ga.wilson_gauge_action(3, 6.0), dtau=0.1, md_steps=10, fermi_action=fa)

    key = jax.random.PRNGKey(111)
    # warmup: compile the trajectory
    u_w, key_w, st = hmc.step(u, key)
    jax.block_until_ready(u_w)

    t0 = time.time()
    n_acc = 0
    for _ in range(n_traj):
        u, key, st = hmc.step(u, key)
        n_acc += int(st["accepted"])
    jax.block_until_ready(u)
    wall = time.time() - t0
    plaq = float(st["plaq"])  # final-trajectory plaquette from the step program
    return wall, plaq, n_acc


def _c128_supported() -> bool:
    """Cheap probe: this TPU's compiler rejects complex128 matmuls
    (observed: remote_compile HTTP 500), so test a tiny op first."""
    import jax
    import jax.numpy as jnp

    try:
        c = jnp.full((4, 3, 3), 1 + 1j, jnp.complex128)
        jax.block_until_ready(jnp.matmul(c, c))
        return True
    except Exception:  # noqa: BLE001
        return False


def _setup_jax():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001 - older jax without these flags
        pass
    return jax


def _pick_precision():
    jax = _setup_jax()
    jax.config.update("jax_enable_x64", True)
    if jax.default_backend() != "cpu" or not _c128_supported():
        # this TPU's compiler rejects complex128; run f32
        jax.config.update("jax_enable_x64", False)
        return "float32", 1e-12, "complex64"
    return "float64", 1e-19, "complex128"


def _result_json(precision, eps, wall, plaq, n_acc, device, attempt):
    return {
        "metric": "wilson_hmc_20traj_4^4_beta6.0_kappa0.141139_wallclock",
        "value": round(wall, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / wall, 2),
        "precision": precision,
        "eps_cg": eps,
        "final_plaquette": round(plaq, 8),
        "accepted": n_acc,
        "device": device,
        "attempt": attempt,
    }


def main():
    precision, eps, cdtype = _pick_precision()
    if "--warmup" in sys.argv:
        _run(cdtype, eps, n_traj=1)
        print("warmup ok")
        return
    import jax

    if "--timed" in sys.argv or jax.default_backend() == "cpu":
        wall, plaq, n_acc = _run(cdtype, eps)
        print(json.dumps(_result_json(precision, eps, wall, plaq, n_acc,
                                      str(jax.devices()[0]), 0)))
        return

    # The remote TPU backend flaps: for minutes at a stretch ANY
    # complex-typed program fails with UNIMPLEMENTED, then it recovers;
    # a failure also poisons the process. So: health-probe in a cheap
    # subprocess, run warmup AND the timed section in fresh
    # subprocesses, and keep cycling until a healthy window yields a
    # clean timed run (the persistent compile cache carries progress).
    warmed = False
    last_err = "unknown"
    deadline = time.time() + 45 * 60
    attempt = 0
    while time.time() < deadline:
        if not _tpu_healthy():
            sys.stderr.write("# TPU unhealthy, cooling down 90s\n")
            time.sleep(90)
            continue
        if not warmed:
            warmed = _warmup_subprocess(retries=2)
            if not warmed:
                continue
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--timed"],
                timeout=1800,
                capture_output=True,
            )
            if r.returncode == 0:
                for line in r.stdout.decode().splitlines():
                    if line.startswith("{"):
                        out = json.loads(line)
                        out["attempt"] = attempt
                        print(json.dumps(out))
                        return
            last_err = r.stderr.decode()[-200:]
            sys.stderr.write(f"# timed attempt {attempt} rc={r.returncode}: {last_err}\n")
        except subprocess.TimeoutExpired:
            last_err = "timeout"
            sys.stderr.write(f"# timed attempt {attempt} timed out\n")
        time.sleep(60)
    print(json.dumps({
        "metric": "wilson_hmc_20traj_4^4_beta6.0_kappa0.141139_wallclock",
        "value": None,
        "unit": "s",
        "vs_baseline": None,
        "error": f"TPU backend failed all timed attempts in 45 min: {last_err}",
    }))


def _tpu_healthy() -> bool:
    """Cheap subprocess probe: a complex64 vdot-like reduction — the
    op class the flaky backend windows break first."""
    probe = (
        "import jax, jax.numpy as jnp;"
        "x = jnp.full((4,4,4,8,3), 1+1j, dtype=jnp.complex64);"
        "v = jnp.real(jnp.vdot(x, x));"
        "jax.block_until_ready(v); print('healthy')"
    )
    try:
        r = subprocess.run([sys.executable, "-c", probe], timeout=240,
                           capture_output=True)
        return r.returncode == 0 and b"healthy" in r.stdout
    except subprocess.TimeoutExpired:
        return False


if __name__ == "__main__":
    main()
