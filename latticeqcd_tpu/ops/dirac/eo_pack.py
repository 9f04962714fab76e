"""Shared even-odd (checkerboard) packing for Dirac stencils.

Parity-p sites of row (y,z,t) are stored with the x axis halved:
x = 2x' + s, where the row offset s(y,z,t) is rho for even and 1-rho
for odd, rho = (y+z+t) mod 2.  pack/unpack are pure reshape+select (no
gather/scatter — cheap to compile AND to differentiate on XLA), hops
along mu != 0 are plain rolls (the packed x' index is unchanged:
matching x positions of opposite parities in adjacent rows coincide),
and x hops are a row-parity select between an array and its roll:

  source sites x = 2x' + s_t (target offset s_t, source offset 1-s_t):
    +x:  x+1 = 2(x'+s_t) + (1-s_t)   ->  x'' = x' + s_t
    -x:  x-1 = 2(x'+s_t-1) + (1-s_t) ->  x'' = x' - (1-s_t)

Requires every lattice extent even (with an odd extent the periodic
wrap connects equal parities and even-odd preconditioning itself is
invalid).  Used by the staggered W operator and the even-odd
preconditioned Wilson operator; the reference keeps the analogous
even-odd machinery inside LatticeDiracOperators.jl (SURVEY.md 2.4.2,
2.5 "even-odd decomposition").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from latticeqcd_tpu.ops import rolls

DIRS = 4


def rho_field(lattice) -> np.ndarray:
    """Row parity rho(y,z,t) in {0,1} (numpy: stays static under jit)."""
    ly, lz, lt = lattice[1:]
    gy, gz, gt = np.meshgrid(np.arange(ly), np.arange(lz), np.arange(lt),
                             indexing="ij")
    return (gy + gz + gt) % 2


def offset_field(lattice, parity: int) -> np.ndarray:
    """Packed-row offset s(y,z,t) for parity 0=even, 1=odd."""
    rho = rho_field(lattice)
    return rho if parity == 0 else 1 - rho


def _row_select(s: np.ndarray, f2: jnp.ndarray) -> jnp.ndarray:
    """Select phase s(y,z,t) from f2 (X/2, 2, Y, Z, T, ...)."""
    b = s.reshape((1,) + s.shape + (1,) * (f2.ndim - 5)).astype(bool)
    return jnp.where(b, f2[:, 1], f2[:, 0])


def pack(f: jnp.ndarray, lattice, parity: int) -> jnp.ndarray:
    """Full site field (X,Y,Z,T,...) -> packed (X/2,Y,Z,T,...)."""
    lx = lattice[0]
    f2 = f.reshape((lx // 2, 2) + f.shape[1:])
    return _row_select(offset_field(lattice, parity), f2)


def unpack(fp: jnp.ndarray, lattice, parity: int) -> jnp.ndarray:
    """Packed parity field -> full field, zero on the other parity."""
    s = offset_field(lattice, parity)
    b = s.reshape((1,) + s.shape + (1,) * (fp.ndim - 4)).astype(bool)
    ph0 = jnp.where(b, jnp.zeros_like(fp), fp)
    ph1 = jnp.where(b, fp, jnp.zeros_like(fp))
    f2 = jnp.stack([ph0, ph1], axis=1)
    return f2.reshape((lattice[0],) + fp.shape[1:])


def pack_links(u: jnp.ndarray, lattice):
    """(U_even, U_odd): links packed by base-site parity; each
    (4, X/2, Y, Z, T, NC, NC). Differentiable."""
    lx = lattice[0]
    u2 = u.reshape((DIRS, lx // 2, 2) + u.shape[2:])
    rho = rho_field(lattice)
    pick = lambda s: jax.vmap(lambda g2: _row_select(s, g2))(u2)
    return pick(rho), pick(1 - rho)


def _bcast(s: np.ndarray, f: jnp.ndarray) -> np.ndarray:
    """Broadcast a (Y,Z,T) row field onto packed f (X/2,Y,Z,T,...)."""
    return s.reshape((1,) + s.shape + (1,) * (f.ndim - 4))


def gather_plus(f: jnp.ndarray, mu: int, s_t: np.ndarray) -> jnp.ndarray:
    """f^src(x + mu) seen from target sites x = 2x' + s_t."""
    if mu == 0:
        return jnp.where(_bcast(s_t, f).astype(bool), rolls.roll(f, -1, axis=0), f)
    return rolls.roll(f, -1, axis=mu)


def gather_minus(f: jnp.ndarray, mu: int, s_t: np.ndarray) -> jnp.ndarray:
    """f^src(x - mu) seen from target sites x = 2x' + s_t."""
    if mu == 0:
        return jnp.where(_bcast(s_t, f).astype(bool), f, rolls.roll(f, 1, axis=0))
    return rolls.roll(f, 1, axis=mu)


def packable(lattice) -> bool:
    return all(l % 2 == 0 for l in lattice)
