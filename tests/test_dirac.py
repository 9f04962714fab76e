import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latticeqcd_tpu.ops import fields, solvers
from latticeqcd_tpu.ops.dirac.staggered import StaggeredDirac
from latticeqcd_tpu.ops.dirac.wilson import (
    WilsonDirac,
    apply_boundary_phases,
    gaussian_spinor,
    inner,
    z4_spinor,
)

LAT = (4, 4, 4, 4)


@pytest.fixture(scope="module")
def u():
    raw = fields.hot_start(LAT, 3, seed=11)
    return apply_boundary_phases(raw)


def test_wilson_gamma5_hermiticity(u):
    d = WilsonDirac(kappa=0.141139)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    psi = gaussian_spinor(k1, LAT, 3)
    phi = gaussian_spinor(k2, LAT, 3)
    lhs = inner(phi, d.apply(u, psi))
    rhs = inner(d.apply_dagger(u, phi), psi)
    assert abs(complex(lhs - rhs)) < 1e-10 * abs(complex(lhs))


def test_wilson_free_field_diagonal():
    """U=1, zero momentum: D psi = (1 - 8 kappa r) psi for constant psi."""
    ucold = apply_boundary_phases(fields.cold_start(LAT, 3), bc=(1, 1, 1, 1))
    d = WilsonDirac(kappa=0.1, r=1.0, bc=(1, 1, 1, 1))
    psi = jnp.ones(LAT + (4, 3), dtype=jnp.complex128)
    out = d.apply(ucold, psi)
    expected = (1 - 8 * 0.1) * psi
    assert float(jnp.max(jnp.abs(out - expected))) < 1e-12


def test_staggered_antihermitian_dslash(u):
    d = StaggeredDirac(mass=0.5, lattice=LAT)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    psi = gaussian_spinor(k1, LAT, 3, nspin=1)
    phi = gaussian_spinor(k2, LAT, 3, nspin=1)
    lhs = inner(phi, d.dslash(u, psi))
    rhs = -inner(d.dslash(u, phi), psi)
    assert abs(complex(lhs - rhs)) < 1e-10 * max(1.0, abs(complex(lhs)))


def test_staggered_w_even_spd(u):
    d = StaggeredDirac(mass=0.5, lattice=LAT)
    psi = gaussian_spinor(jax.random.PRNGKey(2), LAT, 3, nspin=1)
    even = d.even_mask[..., None]
    phi = jnp.where(even, psi, 0.0)
    w = d.apply_w_even(u, phi)
    q = jnp.real(inner(phi, w))
    norm = jnp.real(inner(phi, phi))
    assert float(q) >= 0.25 * float(norm)  # >= m^2 |phi|^2
    # hermiticity
    phi2 = jnp.where(even, gaussian_spinor(jax.random.PRNGKey(3), LAT, 3, nspin=1), 0.0)
    lhs = inner(phi2, d.apply_w_even(u, phi))
    rhs = inner(d.apply_w_even(u, phi2), phi)
    assert abs(complex(lhs - rhs)) < 1e-10 * abs(complex(lhs))


def test_cg_solves_staggered_w(u):
    d = StaggeredDirac(mass=0.5, lattice=LAT)
    even = d.even_mask[..., None]
    b = jnp.where(even, gaussian_spinor(jax.random.PRNGKey(4), LAT, 3, nspin=1), 0.0)
    x, it, rsq = solvers.cg(lambda v: d.apply_w_even(u, v), b, eps=1e-22)
    res = d.apply_w_even(u, x) - b
    assert float(jnp.real(inner(res, res))) < 1e-18
    assert int(it) < 200


def test_bicgstab_solves_wilson(u):
    d = WilsonDirac(kappa=0.12)
    b = gaussian_spinor(jax.random.PRNGKey(5), LAT, 3)
    x, it, rsq = solvers.bicgstab(lambda v: d.apply(u, v), b, eps=1e-22)
    res = d.apply(u, x) - b
    assert float(jnp.real(inner(res, res))) < 1e-16
    assert int(it) < 500


def test_multishift_cg_matches_single_shifts(u):
    d = StaggeredDirac(mass=0.3, lattice=LAT)
    even = d.even_mask[..., None]
    b = jnp.where(even, gaussian_spinor(jax.random.PRNGKey(6), LAT, 3, nspin=1), 0.0)
    apply_a = lambda v: d.apply_w_even(u, v)
    shifts = [0.0, 0.05, 0.7, 3.0]
    xs, it, rsq = solvers.multishift_cg(apply_a, b, shifts, eps=1e-24)
    for k, s in enumerate(shifts):
        xk, _, _ = solvers.cg(lambda v: apply_a(v) + s * v, b, eps=1e-24)
        diff = xs[k] - xk
        assert float(jnp.max(jnp.abs(diff))) < 1e-8, (k, s)


def test_z4_noise():
    z = z4_spinor(jax.random.PRNGKey(7), LAT, 3, nspin=1)
    assert float(jnp.max(jnp.abs(jnp.abs(z) - 1.0))) < 1e-14
    assert abs(float(jnp.mean(jnp.real(z)))) < 0.05


def test_staggered_packed_w_matches_masked(u):
    """apply_w_packed on the packed even-odd layout == apply_w_even on
    the masked full-volume layout (the CG hot-loop fast path)."""
    d = StaggeredDirac(mass=0.5, lattice=LAT)
    up = apply_boundary_phases(u, (1, 1, 1, -1))
    key = jax.random.PRNGKey(42)
    phi = jax.random.normal(key, LAT + (3, 2)).astype(jnp.complex128)
    phi = phi[..., 0] + 1j * phi[..., 1]
    phi = jnp.where(d.even_mask[..., None], phi, 0.0)

    want = d.apply_w_even(up, phi)
    got = d.unpack(d.apply_w_packed(d.packed_links(up), d.pack(phi, 0)), 0)
    assert float(jnp.max(jnp.abs(got - want))) < 1e-12


def test_staggered_pack_roundtrip(u):
    d = StaggeredDirac(mass=0.5, lattice=LAT)
    for parity in (0, 1):
        mask = d.even_mask if parity == 0 else ~d.even_mask
        f = jnp.where(mask[..., None], u[0, ..., 0], 0.0)
        assert float(jnp.max(jnp.abs(d.unpack(d.pack(f, parity), parity) - f))) == 0.0


def test_staggered_packed_w_asymmetric_lattice():
    """Packed path on an asymmetric all-even lattice (checkerboarding
    needs every extent even — with an odd extent the periodic wrap
    connects equal parities and even-odd preconditioning itself breaks,
    masked or packed) to exercise every row-parity branch."""
    lat = (8, 2, 4, 6)
    raw = fields.hot_start(lat, 2, seed=3)
    d = StaggeredDirac(mass=0.3, lattice=lat)
    up = apply_boundary_phases(raw, (1, 1, 1, -1))
    key = jax.random.PRNGKey(5)
    phi = jax.random.normal(key, lat + (2, 2)).astype(jnp.complex128)
    phi = phi[..., 0] + 1j * phi[..., 1]
    phi = jnp.where(d.even_mask[..., None], phi, 0.0)
    want = d.apply_w_even(up, phi)
    got = d.unpack(d.apply_w_packed(d.packed_links(up), d.pack(phi, 0)), 0)
    assert float(jnp.max(jnp.abs(got - want))) < 1e-12


def test_staggered_schur_solve_dinv(u):
    """The packed even-odd Schur solve in measurements._solve_dinv
    returns x with D x = b on the full lattice."""
    from latticeqcd_tpu.measurements.fermionic import _solve_dinv

    d = StaggeredDirac(mass=0.5, lattice=LAT)
    key = jax.random.PRNGKey(9)
    b = jax.random.normal(key, LAT + (3, 2))
    b = (b[..., 0] + 1j * b[..., 1]).astype(jnp.complex128)
    x = _solve_dinv(d, u, b, 1e-22, 1000)
    resid = d.apply(u, x) - b
    rel = float(jnp.linalg.norm(resid) / jnp.linalg.norm(b))
    assert rel < 1e-9


def test_wilson_dhat_matches_schur_of_full(u):
    """Dhat x = x - k^2 H_eo H_oe x agrees with the Schur complement of
    the full operator applied to an even-supported field."""
    d = WilsonDirac(kappa=0.141139)
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, LAT + (4, 3, 2))
    x = (x[..., 0] + 1j * x[..., 1]).astype(jnp.complex128)
    from latticeqcd_tpu.ops.dirac import eo_pack

    even = StaggeredDirac(mass=1.0, lattice=LAT).even_mask[..., None, None]
    x_e = jnp.where(even, x, 0.0)
    # H x = (x - D x)/kappa for even-supported x; H^2 x is even-supported
    hx = (x_e - d.apply(u, x_e)) / d.kappa   # = H x_e (odd-supported)
    h2x = (hx - d.apply(u, hx)) / d.kappa    # = H H x_e (even-supported)
    want = x_e - d.kappa**2 * jnp.where(even, h2x, 0.0)

    ueo = d.packed_links(u)
    got = eo_pack.unpack(d.apply_dhat(ueo, eo_pack.pack(x_e, LAT, 0)), LAT, 0)
    assert float(jnp.max(jnp.abs(got - want))) < 1e-12


def test_wilson_dhat_gamma5_hermiticity(u):
    d = WilsonDirac(kappa=0.141139)
    ueo = d.packed_links(u)
    half = (LAT[0] // 2,) + LAT[1:]
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    a = jax.random.normal(k1, half + (4, 3, 2))
    a = (a[..., 0] + 1j * a[..., 1]).astype(jnp.complex128)
    b = jax.random.normal(k2, half + (4, 3, 2))
    b = (b[..., 0] + 1j * b[..., 1]).astype(jnp.complex128)
    lhs = jnp.vdot(a, d.apply_dhat(ueo, b))
    rhs = jnp.vdot(d.apply_dhat_dagger(ueo, a), b)
    assert abs(complex(lhs - rhs)) < 1e-10


def test_wilson_det_equals_dhat_det():
    """det D = det Dhat (Schur): the even-odd pseudofermion weight is
    the full 2-flavor weight. Dense check on 2^4."""
    from latticeqcd_tpu.ops.dirac import eo_pack
    from latticeqcd_tpu.updates.slhmc import dense_logdet_fermi_action

    lat = (2, 2, 2, 2)
    raw = fields.hot_start(lat, 2, seed=7)
    up = apply_boundary_phases(raw, (1, 1, 1, -1))
    d = WilsonDirac(kappa=0.13)

    sf_full = dense_logdet_fermi_action(d, lat + (4, 2), weight=1.0)

    class _Dhat:
        def apply(self, u, x):
            return d.apply_dhat(d.packed_links(u), x)

    half = (lat[0] // 2,) + lat[1:]
    sf_eo = dense_logdet_fermi_action(_Dhat(), half + (4, 2), weight=1.0)
    assert float(sf_full(up)) == pytest.approx(float(sf_eo(up)), rel=1e-10)


def test_wilson_schur_solve_dinv(u):
    """measurements._solve_dinv Wilson Schur path: D x = b on the full
    lattice to the CGNE tolerance."""
    from latticeqcd_tpu.measurements.fermionic import _solve_dinv

    d = WilsonDirac(kappa=0.141139)
    key = jax.random.PRNGKey(21)
    b = jax.random.normal(key, LAT + (4, 3, 2))
    b = (b[..., 0] + 1j * b[..., 1]).astype(jnp.complex128)
    x = _solve_dinv(d, u, b, 1e-24, 2000)
    rel = float(jnp.linalg.norm(d.apply(u, x) - b) / jnp.linalg.norm(b))
    assert rel < 1e-9


def test_bicgstab_breakdown_guard():
    """A = I converges at the alpha half-step (s = 0 exactly): the
    omega = <t,s>/<t,t> 0/0 must not poison x with NaN."""
    b = jnp.asarray(np.random.default_rng(1).normal(size=(64,))
                    + 1j * np.random.default_rng(2).normal(size=(64,)))
    x, it, rsq = solvers.bicgstab(lambda v: v, b, eps=1e-22)
    assert bool(jnp.all(jnp.isfinite(jnp.abs(x))))
    assert float(jnp.max(jnp.abs(x - b))) < 1e-12


def test_cg_eps_clamped_for_complex64():
    """An f64-tuned eps (1e-19) must not make complex64 solves spin to
    maxiter on stagnated iterations (VERDICT-r2 review finding)."""
    rng = np.random.default_rng(3)
    m = rng.normal(size=(32, 32))
    a = jnp.asarray(m @ m.T + 32 * np.eye(32), dtype=jnp.float32)
    b = jnp.asarray(rng.normal(size=(32,)), dtype=jnp.float32)
    x, it, rsq = solvers.cg(lambda v: a @ v, b, eps=1e-19, maxiter=3000)
    assert int(it) < 200, int(it)
    assert float(jnp.max(jnp.abs(a @ x - b))) < 1e-3


def test_cg_multi_matches_sequential_cg():
    """Batched multi-RHS CG = n independent CG solves: each RHS gets
    its own alpha/beta, and early-converging systems freeze without
    disturbing the still-active ones (widely spread conditioning)."""
    rng = np.random.default_rng(7)
    m = rng.normal(size=(48, 48))
    a = jnp.asarray(m @ m.T + 48 * np.eye(48))
    # scale RHS over 6 orders of magnitude so convergence iterations differ
    b = jnp.asarray(rng.normal(size=(4, 48)) * np.array([1.0, 1e-3, 1e3, 1e-6])[:, None])
    xs, it, rsq = solvers.cg_multi(jax.vmap(lambda v: a @ v), b, eps=1e-24, maxiter=500)
    for i in range(4):
        xi, _, _ = solvers.cg(lambda v: a @ v, b[i], eps=1e-24, maxiter=500)
        np.testing.assert_allclose(np.asarray(xs[i]), np.asarray(xi), rtol=1e-8, atol=1e-12)
        # stopping rule is |r|^2 < eps * max(|b|^2, 1)
        resid = float(jnp.linalg.norm(a @ xs[i] - b[i]))
        bound = float(jnp.sqrt(1e-24 * jnp.maximum(jnp.vdot(b[i], b[i]).real, 1.0)))
        assert resid < 10 * bound


def test_solve_dinv_multi_matches_single(u):
    """The batched measurement solve (pion-correlator hot path) agrees
    with per-RHS solves for both the staggered and Wilson Schur paths."""
    from latticeqcd_tpu.measurements.fermionic import _solve_dinv, _solve_dinv_multi

    key = jax.random.PRNGKey(21)
    for d, shape in (
        (StaggeredDirac(mass=0.5, lattice=LAT), LAT + (3,)),
        (WilsonDirac(kappa=0.141139), LAT + (4, 3)),
    ):
        key, sub = jax.random.split(key)
        b = jax.random.normal(sub, (3,) + shape + (2,))
        b = (b[..., 0] + 1j * b[..., 1]).astype(jnp.complex128)
        xs = _solve_dinv_multi(d, u, b, 1e-22, 1000)
        for i in range(3):
            xi = _solve_dinv(d, u, b[i], 1e-22, 1000)
            np.testing.assert_allclose(np.asarray(xs[i]), np.asarray(xi), rtol=1e-7, atol=1e-10)


def test_clover_dhat_gamma5_hermiticity(u):
    """The clover Schur complement inherits gamma5-hermiticity:
    <phi, Dhat psi> = <g5 Dhat g5 phi, psi>."""
    from latticeqcd_tpu.ops.dirac import eo_pack

    d = WilsonDirac(kappa=0.141139, csw=1.5612)
    u_eo = d.packed_links(u)
    a_e, ainv_o = d.clover_packed_blocks(u)
    k1, k2 = jax.random.split(jax.random.PRNGKey(13))
    pe = eo_pack.pack(gaussian_spinor(k1, LAT, 3), LAT, 0)
    qe = eo_pack.pack(gaussian_spinor(k2, LAT, 3), LAT, 0)
    lhs = inner(qe, d.apply_dhat_clover(u_eo, a_e, ainv_o, pe))
    rhs = inner(d.apply_dhat_clover_dagger(u_eo, a_e, ainv_o, qe), pe)
    assert abs(complex(lhs - rhs)) < 1e-10 * abs(complex(lhs))


def test_clover_schur_solve_dinv(u):
    """The clover even-odd Schur measurement solve returns x with
    D x = b on the full lattice (D including the clover term)."""
    from latticeqcd_tpu.measurements.fermionic import _solve_dinv

    d = WilsonDirac(kappa=0.141139, csw=1.5612)
    key = jax.random.PRNGKey(17)
    b = jax.random.normal(key, LAT + (4, 3, 2))
    b = (b[..., 0] + 1j * b[..., 1]).astype(jnp.complex128)
    x = _solve_dinv(d, u, b, 1e-22, 2000)
    resid = d.apply(u, x) - b
    rel = float(jnp.linalg.norm(resid) / jnp.linalg.norm(b))
    assert rel < 1e-9, rel


def test_cg_verified_exit_beats_c64_recursion_floor():
    """complex64 CG re-verifies the exit residual against the true
    b - A x and restarts if it misses the target (solvers._N_RESTARTS):
    on an ill-conditioned staggered normal operator (mass 0.1) the
    plain recursion floors at ~3e-10 relative TRUE |r|^2 (measured
    2026-08-21, 4^3x8 and 8^4); the verified-exit restarts reach
    ~1e-11."""
    from latticeqcd_tpu.ops import fields
    from latticeqcd_tpu.ops.dirac.staggered import StaggeredDirac
    from latticeqcd_tpu.ops.dirac.wilson import apply_boundary_phases, gaussian_spinor

    lat = (4, 4, 4, 8)
    uu = apply_boundary_phases(
        fields.hot_start(lat, 3, seed=5, dtype=jnp.complex64)
    )
    d = StaggeredDirac(mass=0.1, lattice=lat)
    b = gaussian_spinor(jax.random.PRNGKey(2), lat, 3, nspin=1, dtype=jnp.complex64)
    apply_a = lambda v: d.apply_ddag_d(uu, v)
    x, it, rsq = solvers.cg(apply_a, b, eps=1e-19, maxiter=2000)
    rtrue = b - apply_a(x)
    rel = float(jnp.real(jnp.sum(jnp.conj(rtrue) * rtrue))) / float(
        jnp.real(jnp.sum(jnp.conj(b) * b))
    )
    assert rel < 1e-10, rel
    # and the f64 path is untouched (plain recursion, converges to eps)
    uu64 = uu.astype(jnp.complex128)
    b64 = b.astype(jnp.complex128)
    x64, _, rsq64 = solvers.cg(
        lambda v: d.apply_ddag_d(uu64, v), b64, eps=1e-22, maxiter=4000
    )
    assert float(rsq64) < 1e-22 * float(jnp.real(jnp.sum(jnp.conj(b64) * b64)))
