"""A/B: Pallas fused Wilson D-slash vs the XLA roll/einsum formulation.

Runs on the real chip (no CPU override). Prints one JSON line with
steady-state per-apply times for:
  xla_us          WilsonDirac.apply (framework layout, jitted)
  pallas_us       dslash_planes (kernel layout kept across applies —
                  the CG-loop steady state)
  pallas_conv_us  dslash_pallas (layout conversions included)

Timing methodology: the chain of n applies ends in a scalar fetch
(block_until_ready returns early on the tunneled axon backend, see
CLAUDE.md); the per-apply time is the (n1 - n0)-apply difference.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
try:
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # noqa: BLE001
    pass

from latticeqcd_tpu.ops import fields
from latticeqcd_tpu.ops.dirac.wilson import (
    WilsonDirac,
    apply_boundary_phases,
    gaussian_spinor,
)
from latticeqcd_tpu.ops.dirac import wilson_pallas as wp

LAT = (16, 16, 16, 32)
KAPPA = 0.141139
V = 16 ** 3 * 32
FLOP = 1320 * V


def timed_chain(f, red, x, n):
    t0 = time.time()
    o = x
    for _ in range(n):
        o = f(o)
    _ = float(red(o))
    return time.time() - t0


def per_apply(f, red, x, n0=5, n1=45):
    timed_chain(f, red, x, 2)  # warm
    return (timed_chain(f, red, x, n1) - timed_chain(f, red, x, n0)) / (n1 - n0)


def main():
    dtype = jnp.complex64
    u = apply_boundary_phases(fields.hot_start(LAT, 3, seed=0, dtype=dtype))
    psi = gaussian_spinor(jax.random.PRNGKey(1), LAT, 3, nspin=4, dtype=dtype)
    d = WilsonDirac(kappa=KAPPA)
    out = {"device": str(jax.devices()[0]), "lattice": LAT}

    # --- XLA baseline
    f_xla = jax.jit(lambda p: d.apply(u, p))
    red_c = jax.jit(lambda p: jnp.real(jnp.vdot(p, p)))
    _ = float(red_c(f_xla(psi)))
    dt = per_apply(f_xla, red_c, psi)
    out["xla_us"] = round(dt * 1e6, 1)
    out["xla_gflops"] = round(FLOP / dt / 1e9, 1)

    # --- Pallas, kernel layout steady state
    psi_k = wp.psi_to_planes(psi).astype(jnp.float32)
    u_k, ut_k = wp.links_to_planes(u)
    u_k, ut_k = u_k.astype(jnp.float32), ut_k.astype(jnp.float32)
    red_f = jax.jit(lambda p: jnp.vdot(p, p))
    try:
        f_pal = jax.jit(lambda p: wp.dslash_planes(p, u_k, ut_k, LAT, KAPPA))
        _ = float(red_f(f_pal(psi_k)))
        dt = per_apply(f_pal, red_f, psi_k)
        out["pallas_us"] = round(dt * 1e6, 1)
        out["pallas_gflops"] = round(FLOP / dt / 1e9, 1)
        got = wp.planes_to_psi_shaped(f_pal(psi_k), LAT, dtype=dtype)
        ref = f_xla(psi)
        out["rel_err"] = float(jnp.linalg.norm(ref - got) / jnp.linalg.norm(ref))
    except Exception as e:  # noqa: BLE001 - Mosaic may reject; record it
        out["pallas_error"] = f"{type(e).__name__}: {str(e)[:300]}"

    # --- Pallas sliding-window (minimum-traffic) variant
    try:
        f_win = jax.jit(lambda p: wp.dslash_planes_window(p, u_k, LAT, KAPPA))
        _ = float(red_f(f_win(psi_k)))
        dt = per_apply(f_win, red_f, psi_k)
        out["pallas_window_us"] = round(dt * 1e6, 1)
        out["pallas_window_gflops"] = round(FLOP / dt / 1e9, 1)
        ref_w = f_xla(psi)
        got_w = wp.planes_to_psi_shaped(f_win(psi_k), LAT, dtype=dtype)
        out["window_rel_err"] = float(
            jnp.linalg.norm(ref_w - got_w) / jnp.linalg.norm(ref_w)
        )
    except Exception as e:  # noqa: BLE001 - Mosaic may reject; record it
        out["pallas_window_error"] = f"{type(e).__name__}: {str(e)[:300]}"

    # --- Staggered packed W: XLA vs fused Pallas window kernel
    from latticeqcd_tpu.ops.dirac import staggered_pallas as sp
    from latticeqcd_tpu.ops.dirac.staggered import StaggeredDirac

    ds = StaggeredDirac(mass=0.5, lattice=LAT)
    psi1 = gaussian_spinor(jax.random.PRNGKey(2), LAT, 3, nspin=1, dtype=dtype)
    phi_e = ds.pack(jnp.where(ds.even_mask[..., None], psi1, 0.0), 0)
    u_eo = ds.packed_links(u)
    f_wx = jax.jit(lambda p: ds.apply_w_packed(u_eo, p))
    _ = float(red_c(f_wx(phi_e)))
    dt = per_apply(f_wx, red_c, phi_e)
    out["stag_w_xla_us"] = round(dt * 1e6, 1)
    try:
        phi_k = sp.phi_to_planes(phi_e).astype(jnp.float32)
        uk2 = sp.links_to_planes(u_eo).astype(jnp.float32)
        f_wp = jax.jit(lambda p: sp.w_planes_window(p, uk2, LAT, 0.5))
        _ = float(red_f(f_wp(phi_k)))
        dt = per_apply(f_wp, red_f, phi_k)
        out["stag_w_pallas_us"] = round(dt * 1e6, 1)
        ref_s = f_wx(phi_e)
        got_s = sp.planes_to_phi(f_wp(phi_k), phi_e.shape, dtype=dtype)
        out["stag_w_rel_err"] = float(
            jnp.linalg.norm(ref_s - got_s) / jnp.linalg.norm(ref_s)
        )
    except Exception as e:  # noqa: BLE001
        out["stag_w_pallas_error"] = f"{type(e).__name__}: {str(e)[:300]}"

    # --- Pallas with layout conversions each apply
    if "pallas_us" in out:
        f_conv = jax.jit(lambda p: wp.dslash_pallas(u, p, KAPPA))
        _ = float(red_c(f_conv(psi)))
        dt = per_apply(f_conv, red_c, psi)
        out["pallas_conv_us"] = round(dt * 1e6, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
