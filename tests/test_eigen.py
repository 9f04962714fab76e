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
