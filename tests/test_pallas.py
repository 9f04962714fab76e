"""Pallas fused Wilson D-slash: interpret-mode equality vs the XLA path.

The compiled-TPU A/B lives in scripts/ab_dslash_pallas.py (numbers in
PERF.md); here the kernel's math is pinned exactly against
WilsonDirac.apply on the CPU interpreter.
"""

import jax
import jax.numpy as jnp
import pytest

from latticeqcd_tpu.ops import fields
from latticeqcd_tpu.ops.dirac.wilson import (
    WilsonDirac,
    apply_boundary_phases,
    gaussian_spinor,
)
from latticeqcd_tpu.ops.dirac.wilson_pallas import dslash_pallas

LAT = (4, 4, 4, 4)


@pytest.fixture(scope="module")
def fields_pair():
    u = apply_boundary_phases(fields.hot_start(LAT, 3, seed=40))
    psi = gaussian_spinor(jax.random.PRNGKey(41), LAT, 3)
    return u, psi


@pytest.mark.slow
def test_pallas_dslash_matches_xla_f64(fields_pair):
    u, psi = fields_pair
    ref = WilsonDirac(kappa=0.141139).apply(u, psi)
    out = dslash_pallas(u, psi, 0.141139, interpret=True)
    assert float(jnp.max(jnp.abs(ref - out))) < 1e-12


def test_pallas_dslash_matches_xla_f32(fields_pair):
    u, psi = fields_pair
    ref = WilsonDirac(kappa=0.141139).apply(u, psi)
    out = dslash_pallas(
        u.astype(jnp.complex64), psi.astype(jnp.complex64), 0.141139, interpret=True
    )
    assert float(jnp.max(jnp.abs(ref - out))) < 1e-5


@pytest.mark.slow
def test_pallas_dslash_asymmetric_lattice():
    lat = (4, 8, 2, 4)
    u = apply_boundary_phases(fields.hot_start(lat, 3, seed=42))
    psi = gaussian_spinor(jax.random.PRNGKey(43), lat, 3)
    ref = WilsonDirac(kappa=0.1).apply(u, psi)
    out = dslash_pallas(u, psi, 0.1, interpret=True)
    assert float(jnp.max(jnp.abs(ref - out))) < 1e-12


def test_pallas_window_dslash_matches_xla(fields_pair):
    """Sliding-window (manual DMA) variant, incl. the T-wrap pipeline."""
    from latticeqcd_tpu.ops.dirac import wilson_pallas as wp

    u, psi = fields_pair
    ref = WilsonDirac(kappa=0.141139).apply(u, psi)
    psi_k = wp.psi_to_planes(psi)
    u_k, _ = wp.links_to_planes(u)
    out_k = wp.dslash_planes_window(psi_k, u_k, LAT, 0.141139, interpret=True)
    got = wp.planes_to_psi_shaped(out_k, LAT, dtype=psi.dtype)
    assert float(jnp.max(jnp.abs(ref - got))) < 1e-12


@pytest.mark.slow
def test_pallas_window_dslash_t2_wrap():
    """T=2: the t-1 and t+1 window entries alias the same slice."""
    from latticeqcd_tpu.ops.dirac import wilson_pallas as wp

    lat = (4, 8, 2, 2)
    u = apply_boundary_phases(fields.hot_start(lat, 3, seed=44))
    psi = gaussian_spinor(jax.random.PRNGKey(45), lat, 3)
    ref = WilsonDirac(kappa=0.1).apply(u, psi)
    psi_k = wp.psi_to_planes(psi)
    u_k, _ = wp.links_to_planes(u)
    out_k = wp.dslash_planes_window(psi_k, u_k, lat, 0.1, interpret=True)
    got = wp.planes_to_psi_shaped(out_k, lat, dtype=psi.dtype)
    assert float(jnp.max(jnp.abs(ref - got))) < 1e-12


def test_pallas_staggered_w_matches_packed():
    """Fused W = m^2 - D_eo D_oe (double-hop window) vs apply_w_packed."""
    from latticeqcd_tpu.ops.dirac import staggered_pallas as sp
    from latticeqcd_tpu.ops.dirac.staggered import StaggeredDirac

    lat = (4, 4, 4, 4)
    d = StaggeredDirac(mass=0.5, lattice=lat)
    u = fields.hot_start(lat, 3, seed=50)
    psi = gaussian_spinor(jax.random.PRNGKey(51), lat, 3, nspin=1)
    phi_e = d.pack(jnp.where(d.even_mask[..., None], psi, 0.0), 0)
    up = apply_boundary_phases(u, d.bc)
    ref = d.apply_w_packed(d.packed_links(up), phi_e)
    got = sp.apply_w_pallas(d, u, phi_e, interpret=True)
    assert float(jnp.max(jnp.abs(ref - got))) < 1e-12


@pytest.mark.slow
def test_pallas_staggered_w_edge_lattices():
    from latticeqcd_tpu.ops.dirac import staggered_pallas as sp
    from latticeqcd_tpu.ops.dirac.staggered import StaggeredDirac

    for lat in [(4, 8, 2, 2), (2, 4, 2, 6)]:
        d = StaggeredDirac(mass=0.3, lattice=lat)
        u = fields.hot_start(lat, 3, seed=52)
        psi = gaussian_spinor(jax.random.PRNGKey(53), lat, 3, nspin=1)
        phi_e = d.pack(jnp.where(d.even_mask[..., None], psi, 0.0), 0)
        up = apply_boundary_phases(u, d.bc)
        ref = d.apply_w_packed(d.packed_links(up), phi_e)
        got = sp.apply_w_pallas(d, u, phi_e, interpret=True)
        assert float(jnp.max(jnp.abs(ref - got))) < 1e-12, lat
