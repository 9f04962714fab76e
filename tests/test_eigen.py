"""Lanczos extreme-eigenvalue estimator (ops/eigen.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from latticeqcd_tpu.ops import eigen


def _random_hermitian(n, seed, spectrum=None):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)))
    if spectrum is None:
        spectrum = rng.uniform(0.1, 10.0, size=n)
    return (q * spectrum) @ q.conj().T, np.sort(np.asarray(spectrum))


def test_full_lanczos_exact_on_dense_hermitian():
    """m = n steps reproduce the exact extreme eigenvalues."""
    n = 48
    a, ev = _random_hermitian(n, 3)
    amat = jnp.asarray(a)
    v0 = jnp.asarray(np.random.default_rng(7).normal(size=n) + 0j)
    lmin, lmax = eigen.extreme_eigs(lambda v: amat @ v, v0, m=n)
    assert abs(lmin - ev[0]) < 1e-8 * ev[-1], (lmin, ev[0])
    assert abs(lmax - ev[-1]) < 1e-8 * ev[-1], (lmax, ev[-1])


def test_truncated_lanczos_converges_both_ends():
    """m << n: both extreme Ritz values land within a fraction of a
    percent on a spread spectrum (the regime ensure_spectral_bounds
    uses: m ~ 30 applications)."""
    n = 300
    rng = np.random.default_rng(11)
    spectrum = np.concatenate([[0.05, 0.07], rng.uniform(0.5, 9.0, n - 4), [10.5, 11.0]])
    a, ev = _random_hermitian(n, 5, spectrum)
    amat = jnp.asarray(a)
    v0 = jnp.asarray(rng.normal(size=n) + 1j * rng.normal(size=n))
    lmin, lmax = eigen.extreme_eigs(lambda v: amat @ v, v0, m=40)
    assert abs(lmax - ev[-1]) < 5e-3 * ev[-1], (lmax, ev[-1])
    assert abs(lmin - ev[0]) < 5e-2 * ev[0] + 5e-3, (lmin, ev[0])
    # Ritz values sit inside the spectrum (the documented caveat)
    assert lmax <= ev[-1] * (1 + 1e-9)
    assert lmin >= ev[0] * (1 - 1e-9) - 1e-12


def test_breakdown_truncation_on_eigenvector_start():
    """Starting from an exact eigenvector the recurrence breaks down at
    step 1; both extremes must equal that eigenvalue (no spurious zeros
    from the untouched tail of the tridiagonal)."""
    n = 24
    a, ev = _random_hermitian(n, 9)
    w, vecs = np.linalg.eigh(a)
    amat = jnp.asarray(a)
    v0 = jnp.asarray(vecs[:, 5])
    lmin, lmax = eigen.extreme_eigs(lambda v: amat @ v, v0, m=12)
    assert abs(lmin - w[5]) < 1e-8
    assert abs(lmax - w[5]) < 1e-8


def test_staggered_w_extremes_vs_dense():
    """Lanczos range of the packed staggered W = m^2 - Dslash^2|_ee on a
    hot 4^4 config vs dense eigvalsh (dim 384) — the production use in
    ensure_spectral_bounds."""
    from latticeqcd_tpu.ops import fields
    from latticeqcd_tpu.ops.dirac.staggered import StaggeredDirac
    from latticeqcd_tpu.ops.dirac.wilson import apply_boundary_phases
    from latticeqcd_tpu.ops.fermion_action import StaggeredFermiAction

    lat = (4, 4, 4, 4)
    u = fields.hot_start(lat, 3, seed=2, dtype=jnp.complex128)
    fa = StaggeredFermiAction(StaggeredDirac(mass=0.5, lattice=lat), nf=4)
    up = apply_boundary_phases(u, fa.dirac.bc)
    ueo = fa.dirac.packed_links(up)
    half = (lat[0] // 2,) + lat[1:] + (3,)
    dim = int(np.prod(half))
    eye = jnp.eye(dim, dtype=u.dtype).reshape((dim,) + half)
    cols = jax.vmap(lambda v: fa.dirac.apply_w_packed(ueo, v))(eye)
    wmat = np.asarray(cols.reshape(dim, dim)).T
    ev = np.linalg.eigvalsh(0.5 * (wmat + wmat.conj().T))

    lmin, lmax = fa.spectral_range_w(u, m=40)
    assert abs(lmax - ev[-1]) < 0.01 * ev[-1], (lmax, ev[-1])
    assert abs(lmin - ev[0]) < 0.05 * ev[0] + 1e-3, (lmin, ev[0])
    # the analytic window bounds the true spectrum
    lo, hi = fa._bounds()
    assert lo <= ev[0] and ev[-1] <= hi


# ---------------------------------------------------------------------------
# Ritz pairs + low-mode deflation
# ---------------------------------------------------------------------------


def test_ritz_pairs_low_match_dense_eigenpairs():
    """k lowest Ritz pairs from a full-dimension sweep are the exact
    lowest eigenpairs (eigenvalues to 1e-8, vectors by residual)."""
    n, k = 40, 5
    a, ev = _random_hermitian(n, 21)
    amat = jnp.asarray(a)
    v0 = jnp.asarray(np.random.default_rng(4).normal(size=n) + 0j)
    vals, vecs = eigen.ritz_pairs_low(lambda v: amat @ v, v0, n, k)
    vals = np.asarray(vals)
    assert np.allclose(vals, ev[:k], atol=1e-8 * ev[-1])
    for j in range(k):
        r = np.asarray(amat @ vecs[j] - vals[j] * vecs[j])
        assert np.linalg.norm(r) < 1e-7 * ev[-1], (j, np.linalg.norm(r))


def test_deflation_guess_preserves_solution_on_staggered_w():
    """Light-mass staggered packed W: the k-lowest-Ritz Galerkin seed
    must leave the converged solution unchanged (deflation only seeds
    CG). Iteration count is deliberately NOT asserted: measured
    2026-08-22 (PERF.md "Low-mode deflation"), on a disordered config
    the low spectrum is a dense band (lowest 10 eigenvalues inside
    [0.0025, 0.006] at mass 0.05 — the lattice analog of Banks-Casher)
    so deflating k <= 16 modes cannot shrink the effective condition
    number, and on smooth configs the small-volume gap makes CG
    converge in a handful of iterations anyway."""
    from latticeqcd_tpu.ops import fields, solvers
    from latticeqcd_tpu.ops.dirac.staggered import StaggeredDirac
    from latticeqcd_tpu.ops.dirac.wilson import apply_boundary_phases, gaussian_spinor

    lat = (4, 4, 4, 4)
    mass = 0.05
    u = fields.hot_start(lat, 3, seed=3, dtype=jnp.complex128)
    d = StaggeredDirac(mass=mass, lattice=lat)
    up = apply_boundary_phases(u, d.bc)
    ueo = d.packed_links(up)
    w_one = lambda v: d.apply_w_packed(ueo, v)  # noqa: E731

    rng_fields = [
        gaussian_spinor(jax.random.PRNGKey(100 + i), lat, 3, nspin=1,
                        dtype=jnp.complex128)
        for i in range(3)
    ]
    b = jnp.stack([d.pack(jnp.where(d.even_mask[..., None], f, 0.0), 0)
                   for f in rng_fields])

    x_plain, it_plain, _ = solvers.cg_multi_auto(
        w_one, b, eps=1e-18, maxiter=4000, force_mode="batched")
    k = 8
    vals, vecs = eigen.ritz_pairs_low(w_one, b[0], max(3 * k, k + 16), k)
    x0 = eigen.deflation_guess(vals, vecs, b)
    x_defl, it_defl, _ = solvers.cg_multi_auto(
        w_one, b, eps=1e-18, maxiter=4000, force_mode="batched", x0=x0)

    ref = float(jnp.max(jnp.abs(x_plain)))
    assert float(jnp.max(jnp.abs(x_plain - x_defl))) < 1e-7 * ref
    # the guess is not garbage either: within ~2 restarts of plain
    assert int(it_defl) <= int(it_plain) + 8, (int(it_defl), int(it_plain))


def test_chiral_condensate_deflated_matches_plain():
    """End-to-end: pbp with deflate_k on the staggered eo path equals
    the undeflated measurement to solver tolerance (same noise keys)."""
    from latticeqcd_tpu.measurements import fermionic
    from latticeqcd_tpu.ops import fields
    from latticeqcd_tpu.ops.dirac.staggered import StaggeredDirac

    lat = (4, 4, 4, 4)
    u = fields.hot_start(lat, 3, seed=5, dtype=jnp.complex128)
    d = StaggeredDirac(mass=0.1, lattice=lat)
    key = jax.random.PRNGKey(8)
    pbp0, per0 = fermionic.chiral_condensate(u, d, key, nr=2, eps=1e-16)
    pbp1, per1 = fermionic.chiral_condensate(u, d, key, nr=2, eps=1e-16,
                                             deflate_k=6)
    assert abs(pbp0 - pbp1) < 1e-8 * max(abs(pbp0), 1e-3), (pbp0, pbp1)
    assert np.allclose(per0, per1, atol=1e-7)
