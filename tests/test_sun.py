import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latticeqcd_tpu.ops import sun


@pytest.mark.parametrize("nc", [2, 3, 4])
def test_random_momentum_is_traceless_hermitian(nc):
    key = jax.random.PRNGKey(0)
    h = sun.random_hermitian_momentum(key, (100,), nc)
    assert jnp.max(jnp.abs(h - sun.dagger(h))) < 1e-14
    assert jnp.max(jnp.abs(sun.trace(h))) < 1e-13


@pytest.mark.parametrize("nc", [2, 3, 4])
def test_momentum_normalization(nc):
    # E[tr H^2] = (NC^2 - 1)/2 per matrix (one 1/2 per generator dof)
    key = jax.random.PRNGKey(1)
    n = 40000
    h = sun.random_hermitian_momentum(key, (n,), nc)
    ke = float(sun.kinetic_energy(h)) / n
    expected = (nc * nc - 1) / 2.0
    assert abs(ke - expected) < 0.05 * expected


@pytest.mark.parametrize("nc", [2, 3, 4, 5])
def test_expi_hermitian_unitary_and_matches_eigh(nc):
    key = jax.random.PRNGKey(2)
    h = sun.random_hermitian_momentum(key, (50,), nc)
    for eps in [0.01, 0.5, 2.0]:
        u = sun.expi_hermitian(h, eps)
        assert float(sun.unitarity_defect(u)) < 1e-12
        det = jnp.linalg.det(u)
        assert jnp.max(jnp.abs(det - 1)) < 1e-12
        # compare against eigendecomposition reference
        w, v = np.linalg.eigh(np.asarray(h))
        ref = np.einsum(
            "...ab,...b,...cb->...ac", v, np.exp(1j * eps * w), np.conj(v)
        )
        assert np.max(np.abs(np.asarray(u) - ref)) < 1e-11


def test_expm_su2_matches_generic():
    key = jax.random.PRNGKey(3)
    h = sun.random_hermitian_momentum(key, (64,), 2)
    x = 1j * 0.37 * h
    a = sun._expm_su2(x)
    b = sun._expm_taylor_ss(x)
    assert jnp.max(jnp.abs(a - b)) < 1e-12


def test_projection_th():
    key = jax.random.PRNGKey(4)
    m = jax.random.normal(key, (10, 3, 3)) + 1j * jax.random.normal(jax.random.PRNGKey(5), (10, 3, 3))
    h = sun.traceless_hermitian(m)
    assert jnp.max(jnp.abs(h - sun.dagger(h))) < 1e-14
    assert jnp.max(jnp.abs(sun.trace(h))) < 1e-14
    # projection is idempotent
    assert jnp.max(jnp.abs(sun.traceless_hermitian(h) - h)) < 1e-14


def test_reunitarize():
    rng = np.random.default_rng(0)
    u = sun.random_sun_host(rng, (20,), 3)
    noisy = jnp.asarray(u) + 1e-8 * (rng.standard_normal((20, 3, 3)) + 1j * rng.standard_normal((20, 3, 3)))
    w = sun.reunitarize(noisy)
    assert float(sun.unitarity_defect(w)) < 1e-14
    assert jnp.max(jnp.abs(jnp.linalg.det(w) - 1)) < 1e-13
    assert jnp.max(jnp.abs(w - jnp.asarray(u))) < 1e-7
