"""North-star metrics on the real chip: Dirac mat-vec GFLOP/s and HMC
trajectories/hour at 16^3x32 (BASELINE.md). Run standalone on TPU.

Measurement rule for the tunneled axon backend: jax.block_until_ready
returns BEFORE execution finishes there (measured 2026-08-20: 5 quenched
16^3x32 trajectories "completed" in 0.5 ms), so every timed region here
ends in a host-side scalar fetch (float(...)), which can only return
after the dependency chain actually executed. Loop timings use a
two-point (n0, n1) subtraction to cancel the fetch/transfer overhead.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402

from latticeqcd_tpu.ops import fields, gauge_action as ga  # noqa: E402
from latticeqcd_tpu.ops.dirac.staggered import StaggeredDirac  # noqa: E402
from latticeqcd_tpu.ops.dirac.wilson import (  # noqa: E402
    WilsonDirac,
    apply_boundary_phases,
    gaussian_spinor,
)
from latticeqcd_tpu.ops.fermion_action import StaggeredFermiAction  # noqa: E402
from latticeqcd_tpu.updates import HMC  # noqa: E402

LAT = (16, 16, 16, 32)
V = 16**3 * 32


def _chain_time(f, red, x0, n):
    """Wall time of n chained applications ending in a scalar fetch."""
    t0 = time.time()
    o = x0
    for _ in range(n):
        o = f(o)
    _ = float(red(o))
    return time.time() - t0


def _per_iter(f, red, x0, n0=5, n1=55):
    _chain_time(f, red, x0, 2)  # warm
    dt = (_chain_time(f, red, x0, n1) - _chain_time(f, red, x0, n0)) / (n1 - n0)
    if dt <= 0:
        # flap-window garbage (observed: negative chain deltas while
        # axon half-down) — exit nonzero so capture harnesses retry
        # instead of recording nonsense
        print(f"# INSANE chain timing dt={dt}; aborting", flush=True)
        sys.exit(1)
    return dt


def bench_matvec():
    u = apply_boundary_phases(fields.hot_start(LAT, 3, seed=0, dtype=jnp.complex64))
    psi = gaussian_spinor(jax.random.PRNGKey(1), LAT, 3, nspin=4, dtype=jnp.complex64)
    d = WilsonDirac(kappa=0.141139)
    f = jax.jit(lambda pp: d.apply(u, pp))
    red = jax.jit(lambda pp: jnp.real(jnp.vdot(pp, pp)))
    dt = _per_iter(f, red, psi)
    print(f"wilson_dslash_us {dt*1e6:.1f}", flush=True)
    print(f"wilson_dslash_gflops {1320*V/dt/1e9:.0f}", flush=True)


def bench_staggered_matvec():
    u = apply_boundary_phases(fields.hot_start(LAT, 3, seed=0, dtype=jnp.complex64))
    d = StaggeredDirac(mass=0.5, lattice=LAT)
    psi = gaussian_spinor(jax.random.PRNGKey(1), LAT, 3, nspin=1, dtype=jnp.complex64)
    f = jax.jit(lambda pp: d.apply(u, pp))
    red = jax.jit(lambda pp: jnp.real(jnp.vdot(pp, pp)))
    dt = _per_iter(f, red, psi)
    print(f"staggered_dslash_us {dt*1e6:.1f}", flush=True)
    # 570 flop/site: 4 dirs x (fwd+bwd) x (mat-vec 66 + add 6) + mass axpy
    print(f"staggered_dslash_gflops {570*V/dt/1e9:.0f}", flush=True)
    # packed even-odd W apply (the solver hot path)
    ueo = d.packed_links(u)
    ve = d.pack(jnp.where(d.even_mask[..., None], psi, 0.0), 0)
    fw = jax.jit(lambda pp: d.apply_w_packed(ueo, pp))
    dt = _per_iter(fw, red, ve)
    print(f"staggered_w_packed_us {dt*1e6:.1f}", flush=True)


def bench_batched_solve_ops(nrhs=12):
    """Multi-RHS Schur operators (the solvers.cg_multi hot mat-vecs
    behind the batched pion-correlator / pbp measurement solves).

    The HBM-bound single-RHS applies are dominated by the link stream
    (PERF.md roofline); vmapping nrhs RHS through one program reads the
    links once per batch, so the per-RHS time should fall well below
    the single-RHS numbers above (26 us packed-W, 95 us D-slash)."""
    u = apply_boundary_phases(fields.hot_start(LAT, 3, seed=0, dtype=jnp.complex64))
    red = jax.jit(lambda pp: jnp.real(jnp.vdot(pp, pp)))

    # staggered packed W, nrhs right-hand sides
    d = StaggeredDirac(mass=0.5, lattice=LAT)
    ueo = d.packed_links(u)
    ve = d.pack(
        gaussian_spinor(jax.random.PRNGKey(1), LAT, 3, nspin=1, dtype=jnp.complex64), 0
    )
    coefs = (1.0 + jnp.arange(nrhs, dtype=jnp.float32) / nrhs).reshape(
        (-1,) + (1,) * ve.ndim
    )
    vs = coefs * ve[None]
    f = jax.jit(jax.vmap(lambda v: d.apply_w_packed(ueo, v)))
    dt = _per_iter(f, red, vs, n0=5, n1=35)
    print(f"staggered_w_batched{nrhs}_us {dt*1e6:.1f}", flush=True)
    print(f"staggered_w_batched{nrhs}_us_per_rhs {dt*1e6/nrhs:.1f}", flush=True)

    # Wilson eo-Schur normal operator Dhat^dag Dhat, nrhs RHS
    from latticeqcd_tpu.ops.dirac import eo_pack

    dw = WilsonDirac(kappa=0.141139)
    ueow = dw.packed_links(u)
    we = eo_pack.pack(
        gaussian_spinor(jax.random.PRNGKey(2), LAT, 3, nspin=4, dtype=jnp.complex64),
        LAT, 0,
    )
    coefs = (1.0 + jnp.arange(nrhs, dtype=jnp.float32) / nrhs).reshape(
        (-1,) + (1,) * we.ndim
    )
    ws = coefs * we[None]
    fw = jax.jit(
        jax.vmap(lambda v: dw.apply_dhat_dagger(ueow, dw.apply_dhat(ueow, v)))
    )
    dt = _per_iter(fw, red, ws, n0=5, n1=35)
    print(f"wilson_dhat_ddag_batched{nrhs}_us {dt*1e6:.1f}", flush=True)
    print(f"wilson_dhat_ddag_batched{nrhs}_us_per_rhs {dt*1e6/nrhs:.1f}", flush=True)


def _traj_time(hmc, u, n):
    """n trajectories; the per-trajectory bool()/float() fetches in the
    staged stats dict (or the scalar fetch below on the fused path)
    enforce real execution."""
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    plaq = 0.0
    for _ in range(n):
        u, key, st = hmc.step(u, key)
        plaq = float(st["plaq"])  # scalar fetch: sync every trajectory
    return time.time() - t0, plaq


def bench_quenched_traj():
    u = fields.hot_start(LAT, 3, seed=0, dtype=jnp.complex64)
    hmc = HMC(action=ga.wilson_gauge_action(3, 6.0), dtau=0.05, md_steps=20)
    key = jax.random.PRNGKey(0)
    u, key, st = hmc.step(u, key)
    _ = float(st["plaq"])  # compile + sync
    dt, _ = _traj_time(hmc, u, 5)
    dt /= 5
    print(f"quenched_hmc_traj_s {dt:.3f}", flush=True)
    print(f"quenched_hmc_traj_per_hour {3600/dt:.0f}", flush=True)


def bench_staggered_traj():
    u = fields.hot_start(LAT, 3, seed=0, dtype=jnp.complex64)
    fa = StaggeredFermiAction(
        StaggeredDirac(mass=0.5, lattice=LAT), nf=4, eps_cg=1e-10, max_cg=1000
    )
    hmc = HMC(action=ga.wilson_gauge_action(3, 5.7), dtau=0.05, md_steps=20, fermi_action=fa)
    key = jax.random.PRNGKey(0)
    u, key, st = hmc.step(u, key)
    _ = float(st["plaq"])
    dt, _ = _traj_time(hmc, u, 3)
    dt /= 3
    print(f"staggered_nf4_hmc_traj_s {dt:.3f}", flush=True)
    print(f"staggered_nf4_hmc_traj_per_hour {3600/dt:.0f}", flush=True)


def bench_multichain(nchain=4, lat=None):
    """Ensemble throughput: nchain independent quenched chains vmapped
    through HMC.step_batched (one program). Reported per chain — at
    volumes that underfill the chip (or pay remote dispatch latency,
    e.g. the reference's 4^4 headline benchmark) this multiplies
    configs/hour at nearly constant wall-clock per step."""
    import jax.numpy as jnp

    lat = lat or LAT
    hmc = HMC(action=ga.wilson_gauge_action(3, 6.0), dtau=0.05, md_steps=20,
              staged=False)
    us = jnp.stack(
        [fields.hot_start(lat, 3, seed=s, dtype=jnp.complex64) for s in range(nchain)]
    )
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(nchain))
    t_single = None
    u1 = us[0]
    k1 = jax.random.PRNGKey(0)
    u1, k1, st = hmc.step(u1, k1)
    _ = float(st["plaq"])  # compile + sync single
    t0 = time.time()
    for _ in range(3):
        u1, k1, st = hmc.step(u1, k1)
        _ = float(st["plaq"])
    t_single = (time.time() - t0) / 3
    us, keys, stats = hmc.step_batched(us, keys)
    _ = float(stats["plaq"][0])  # compile + sync batched
    t0 = time.time()
    for _ in range(3):
        us, keys, stats = hmc.step_batched(us, keys)
        _ = float(stats["plaq"][0])
    t_batch = (time.time() - t0) / 3
    name = "x".join(str(x) for x in lat)
    print(f"multichain{nchain}_{name}_traj_s_per_chain {t_batch/nchain:.4f}", flush=True)
    print(f"multichain{nchain}_{name}_speedup_vs_serial {t_single*nchain/t_batch:.2f}",
          flush=True)

    # Dynamical staged-batched variant (round 4, VERDICT r3 next #9):
    # 2f Wilson on the reference's 4^4 headline shape; step_batched
    # auto-selects the staged multi-program path off-CPU, so this is
    # the TPU evidence for the vmapped staged programs.
    from latticeqcd_tpu.ops.dirac.wilson import WilsonDirac
    from latticeqcd_tpu.ops.fermion_action import WilsonFermiAction

    fa = WilsonFermiAction(WilsonDirac(kappa=0.141139), eps_cg=1e-12, max_cg=3000)
    hmc_d = HMC(action=ga.wilson_gauge_action(3, 6.0), dtau=0.1, md_steps=10,
                fermi_action=fa)
    lat_d = (4, 4, 4, 4)
    us_d = jnp.stack(
        [fields.hot_start(lat_d, 3, seed=s, dtype=jnp.complex64)
         for s in range(nchain)]
    )
    keys_d = jax.vmap(jax.random.PRNGKey)(jnp.arange(nchain) + 100)
    us_d, keys_d, st_d = hmc_d.step_batched(us_d, keys_d)  # compile
    _ = float(st_d["plaq"][0])
    t0 = time.time()
    for _ in range(3):
        us_d, keys_d, st_d = hmc_d.step_batched(us_d, keys_d)
        _ = float(st_d["plaq"][0])
    t_dyn = (time.time() - t0) / 3
    path = "staged" if hmc_d._use_staged() else "fused"
    print(f"multichain{nchain}_dyn4x4x4x4_{path}_traj_s_per_chain "
          f"{t_dyn/nchain:.4f}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "matvec"):
        bench_matvec()
    if which in ("all", "staggered_matvec", "matvec2"):
        bench_staggered_matvec()
    if which in ("all", "batched"):
        bench_batched_solve_ops()
    if which in ("all", "quenched"):
        bench_quenched_traj()
    if which in ("all", "staggered"):
        bench_staggered_traj()
    if which in ("all", "multichain"):
        bench_multichain(nchain=4)
    if which == "multichain4x4":
        bench_multichain(nchain=32, lat=(4, 4, 4, 4))
