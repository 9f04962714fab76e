"""Gauge-link and lattice-field containers.

The link field is ONE jnp array `U[mu, x, y, z, t, a, b]` (complex),
not a vector of four mutable field objects as in the reference's
Gaugefields.jl (SURVEY.md 2.4.1). There are no ghost/halo cells in
the functional API: periodic shifts are jnp.roll, which under jit on
a sharded mesh lowers to XLA collective-permutes; the reference's
`Nwing` bookkeeping (universe.jl:34) is subsumed.

Axis order: (mu, X, Y, Z, T, color, color). Lattice axis of
direction mu is `1 + mu`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from latticeqcd_tpu.ops import sun

from latticeqcd_tpu.ops import rolls

DIRS = 4  # spacetime dimensionality (reference supports Dim=4 in all tests)


def lattice_axes(ndim_site: int = 4):
    return tuple(range(1, 1 + ndim_site))


def cold_start(lattice, nc: int, dtype=jnp.complex128) -> jnp.ndarray:
    """All links = identity (condition="cold", universe.jl:41)."""
    shape = (DIRS, *lattice, nc, nc)
    return jnp.broadcast_to(jnp.eye(nc, dtype=dtype), shape).copy()


def hot_start(lattice, nc: int, seed: int = 0, dtype=jnp.complex128) -> jnp.ndarray:
    """Random SU(N) links (condition="hot", universe.jl:41)."""
    rng = np.random.default_rng(seed)
    u = sun.random_sun_host(rng, (DIRS, *lattice), nc)
    return jnp.asarray(u, dtype=dtype)


def one_instanton_start(lattice, nc: int, dtype=jnp.complex128) -> jnp.ndarray:
    """One-instanton SU(2) start (condition="one instanton").

    Discretized BPST instanton centered mid-lattice, embedded in the
    upper-left SU(2) block for NC > 2 (README.md:106 capability).
    Singular gauge (decays ~1/x^3, so the periodic wrap is smooth and
    the configuration carries lattice topological charge ~ 1):
    A^a_mu = 2 etabar^a_{mu nu} (x-z)_nu rho^2 / ((x-z)^2 ((x-z)^2 + rho^2)).
    """
    nx, ny, nz, nt = lattice
    rho = min(lattice) / 4.0
    center = np.array([nx / 2 - 0.5, ny / 2 - 0.5, nz / 2 - 0.5, nt / 2 - 0.5])
    # anti-'t Hooft symbol etabar^a_{mu nu}, a=1..3, mu,nu=1..4 (3 = time)
    eta = np.zeros((3, 4, 4))
    for a in range(3):
        for mu in range(3):
            for nu in range(3):
                eta[a, mu, nu] = float(np.sign((a - mu) * (mu - nu) * (nu - a))) if len({a, mu, nu}) == 3 else 0.0
        eta[a, a, 3] = -1.0
        eta[a, 3, a] = 1.0
    coords = np.stack(
        np.meshgrid(*(np.arange(n) for n in lattice), indexing="ij"), axis=-1
    ).astype(np.float64)
    sigma = np.array(
        [[[0, 1], [1, 0]], [[0, -1j], [1j, 0]], [[1, 0], [0, -1]]], dtype=np.complex128
    )
    links = np.zeros((DIRS, *lattice, 2, 2), dtype=np.complex128)
    for mu in range(DIRS):
        mid = coords.copy()
        mid[..., mu] += 0.5
        d = mid - center
        x2 = np.sum(d * d, axis=-1)
        amu = (
            2.0
            * np.einsum("an,...n->a...", eta[:, mu, :], d)
            * rho**2
            / (x2 * (x2 + rho * rho))
        )
        x = 1j * np.einsum("a...,aij->...ij", amu, sigma)
        # exact 2x2 exponential of antihermitian traceless x
        av = np.imag(x[..., 0, 0])
        bv = np.real(x[..., 0, 1])
        cv = np.imag(x[..., 0, 1])
        th = np.sqrt(av * av + bv * bv + cv * cv)
        sinc = np.where(th < 1e-12, 1.0, np.sin(th) / np.where(th < 1e-12, 1.0, th))
        e00 = np.cos(th) + 1j * av * sinc
        e01 = (bv + 1j * cv) * sinc
        links[mu, ..., 0, 0] = e00
        links[mu, ..., 0, 1] = e01
        links[mu, ..., 1, 0] = -np.conj(e01)
        links[mu, ..., 1, 1] = np.conj(e00)
    if nc == 2:
        u = links
    else:
        u = np.zeros((DIRS, *lattice, nc, nc), dtype=np.complex128)
        u[..., :, :] = np.eye(nc)
        u[..., :2, :2] = links
    return jnp.asarray(u, dtype=dtype)


def initialize_gaugefields(nc, lattice, condition="cold", seed=0, dtype=jnp.complex128):
    """Counterpart of Initialize_Gaugefields (universe.jl:41-51)."""
    if condition == "cold":
        return cold_start(lattice, nc, dtype)
    if condition == "hot":
        return hot_start(lattice, nc, seed, dtype)
    if condition == "one instanton":
        return one_instanton_start(lattice, nc, dtype)
    raise ValueError(f"unknown initial condition {condition!r}")


@partial(jax.jit, static_argnums=(1, 2), inline=True)
def shift(field: jnp.ndarray, mu: int, steps: int) -> jnp.ndarray:
    """field(x + steps * e_mu) for a site field with layout (X,Y,Z,T,...).

    Periodic. Positive `steps` looks *forward*. A roll with negative
    shift brings x+1 to position x. Under a sharded jit this lowers to
    a local roll + XLA collective-permute on the mesh edge (rolls.roll
    keeps that true for the TRANSPOSED/grad programs too).
    """
    return rolls.roll(field, -steps, axis=mu)


def shift_link(u_mu: jnp.ndarray, mu: int, steps: int) -> jnp.ndarray:
    """Shift a single-direction link field U[mu] with layout (X,Y,Z,T,a,b)."""
    return rolls.roll(u_mu, -steps, axis=mu)
