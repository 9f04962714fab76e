"""North-star metrics on the real chip: Dirac mat-vec GFLOP/s and HMC
trajectories/hour at 16^3x32 (BASELINE.md). Run standalone on TPU.
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


def bench_matvec():
    u = apply_boundary_phases(fields.hot_start(LAT, 3, seed=0, dtype=jnp.complex64))
    psi = gaussian_spinor(jax.random.PRNGKey(1), LAT, 3, nspin=4, dtype=jnp.complex64)
    d = WilsonDirac(kappa=0.141139)
    f = jax.jit(lambda uu, pp: d.apply(uu, pp))
    out = f(u, psi)
    jax.block_until_ready(out)
    n = 50
    t0 = time.time()
    for _ in range(n):
        out = f(u, out)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"wilson_dslash_us {dt*1e6:.0f}")
    print(f"wilson_dslash_gflops {1320*V/dt/1e9:.0f}")


def bench_quenched_traj():
    u = fields.hot_start(LAT, 3, seed=0, dtype=jnp.complex64)
    hmc = HMC(action=ga.wilson_gauge_action(3, 6.0), dtau=0.05, md_steps=20)
    key = jax.random.PRNGKey(0)
    u, key, st = hmc.step(u, key)
    jax.block_until_ready(u)
    t0 = time.time()
    n = 5
    for _ in range(n):
        u, key, st = hmc.step(u, key)
    jax.block_until_ready(u)
    dt = (time.time() - t0) / n
    print(f"quenched_hmc_traj_s {dt:.2f}")
    print(f"quenched_hmc_traj_per_hour {3600/dt:.0f}")


def bench_staggered_traj():
    u = fields.hot_start(LAT, 3, seed=0, dtype=jnp.complex64)
    fa = StaggeredFermiAction(
        StaggeredDirac(mass=0.5, lattice=LAT), nf=4, eps_cg=1e-10, max_cg=1000
    )
    hmc = HMC(action=ga.wilson_gauge_action(3, 5.7), dtau=0.05, md_steps=20, fermi_action=fa)
    key = jax.random.PRNGKey(0)
    u, key, st = hmc.step(u, key)
    jax.block_until_ready(u)
    t0 = time.time()
    n = 3
    for _ in range(n):
        u, key, st = hmc.step(u, key)
    jax.block_until_ready(u)
    dt = (time.time() - t0) / n
    print(f"staggered_nf4_hmc_traj_s {dt:.2f}")
    print(f"staggered_nf4_hmc_traj_per_hour {3600/dt:.0f}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "matvec"):
        bench_matvec()
    if which in ("all", "quenched"):
        bench_quenched_traj()
    if which in ("all", "staggered"):
        bench_staggered_traj()
