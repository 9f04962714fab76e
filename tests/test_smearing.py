import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latticeqcd_tpu.ops import fields, gauge_action as ga, sun
from latticeqcd_tpu.smearing import GradientFlow, gradientflow, stout_stack

LAT = (4, 4, 4, 4)


def test_stout_increases_plaquette_preserves_group():
    u = fields.hot_start(LAT, 3, seed=31)
    net = stout_stack([0.1])
    us = net.smear(u)
    assert float(ga.mean_plaquette(us)) > float(ga.mean_plaquette(u))
    assert float(sun.unitarity_defect(us)) < 1e-12


def test_stout_multi_layer_and_rect_loops():
    u = fields.hot_start(LAT, 3, seed=32)
    net = stout_stack([0.05, 0.05], loop_names=("plaquette", "rectangular"))
    us = net.smear(u)
    assert float(ga.mean_plaquette(us)) > float(ga.mean_plaquette(u))
    assert float(sun.unitarity_defect(us)) < 1e-11


@pytest.mark.slow
def test_stout_differentiable():
    u = fields.hot_start((2, 2, 2, 2), 2, seed=33)
    net = stout_stack([0.12])

    def f(uu):
        return ga.mean_plaquette(net.smear(uu))

    g = jax.grad(f)(u)
    assert bool(jnp.all(jnp.isfinite(jnp.abs(g))))
    # finite-difference check along a random algebra direction
    h = sun.random_hermitian_momentum(jax.random.PRNGKey(0), u.shape[:-2], 2)
    dt = 1e-5
    e = sun.expi_hermitian(h, dt)
    up = jnp.matmul(e, u)
    em = sun.expi_hermitian(h, -dt)
    um = jnp.matmul(em, u)
    ds_num = (float(f(up)) - float(f(um))) / (2 * dt)
    du = jnp.stack([1j * sun.mul(h[mu], u[mu]) for mu in range(4)])
    ds_ad = float(jnp.sum(jnp.real(g * du)))
    assert abs(ds_num - ds_ad) < 1e-5 * max(1.0, abs(ds_num))


def test_flow_decreases_action_toward_unit_plaquette():
    u = fields.hot_start(LAT, 3, seed=34)
    gf = gradientflow(3, nflow=20, eps=0.02)
    p0 = float(ga.mean_plaquette(u))
    u1 = gf.flow(u)
    p1 = float(ga.mean_plaquette(u1))
    u2 = gf.flow(u1)
    p2 = float(ga.mean_plaquette(u2))
    assert p0 < p1 < p2
    assert float(sun.unitarity_defect(u2)) < 1e-10
    # long flow on 4^4 approaches (near-)flat
    gf_long = gradientflow(3, nflow=200, eps=0.02)
    u3 = gf_long.flow(u2)
    assert float(ga.mean_plaquette(u3)) > 0.97


def test_flow_heat_kernel_normalization():
    """A weak single transverse Fourier mode decays as exp(-p_hat^2 t):
    pins the flow-time normalization to the standard convention."""
    lat = (8, 4, 4, 4)
    nc = 2
    amp = 1e-4
    kx = 2 * np.pi / lat[0]
    x = np.arange(lat[0])
    # A_y(x) = amp * cos(k x) * sigma3/2: transverse (depends on x only,
    # points in y) -> exact eigenmode of the lattice laplacian
    a = np.zeros((4, *lat, nc, nc), dtype=np.complex128)
    sigma3 = np.diag([1.0, -1.0])
    prof = amp * np.cos(kx * x)[:, None, None, None]
    a[1, ..., 0, 0] = prof * sigma3[0, 0] / 2
    a[1, ..., 1, 1] = prof * sigma3[1, 1] / 2
    h = jnp.asarray(a)
    u = sun.expi_hermitian(h, 1.0)
    t = 0.3
    eps = 0.01
    gf = gradientflow(nc, nflow=int(t / eps), eps=eps)
    uf = gf.flow(u)
    # extract the mode amplitude from the log of the link
    uy = np.asarray(uf[1])
    theta = np.imag(uy[..., 0, 0])  # = A^3/2 component
    coef = 2 * np.mean(theta * np.cos(kx * x)[:, None, None, None]) / (amp / 2)
    phat2 = 4 * np.sin(kx / 2) ** 2
    expected = np.exp(-phat2 * t)
    assert abs(coef - expected) < 0.02 * expected, (coef, expected)
