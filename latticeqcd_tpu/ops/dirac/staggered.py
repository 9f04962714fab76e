"""Staggered (Kogut-Susskind) Dirac operator.

Counterpart of LatticeDiracOperators.jl's staggered operator
(SURVEY.md 2.4.2; params mass/Nf at
/root/reference/src/system/universe.jl:106-110):

    D psi(x) = m psi(x)
      + (1/2) sum_mu eta_mu(x) [ U_mu(x) psi(x+mu)
                               - U_mu(x-mu)^dag psi(x-mu) ]

with Kogut-Susskind phases eta_1 = 1, eta_mu = (-1)^(x_1+..+x_{mu-1})
and boundary phases absorbed into the links. Field layout:
psi[X, Y, Z, T, NC]. D = m + Dslash with Dslash antihermitian and
even-odd off-diagonal, so D^dag D = m^2 - Dslash^2 is block-diagonal
in parity — the even block W = (D^dag D)_ee with det W = det D (4
tastes) is the solver/HMC workhorse (see ops/fermion_action.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

DIRS = 4


def ks_phases(lattice):
    """eta_mu(x) as four {-1,+1} site fields, and the parity mask."""
    grids = np.meshgrid(*(np.arange(l) for l in lattice), indexing="ij")
    etas = []
    acc = np.zeros(lattice, dtype=np.int64)
    for mu in range(DIRS):
        etas.append(1.0 - 2.0 * (acc % 2))
        acc = acc + grids[mu]
    parity_even = (sum(grids) % 2) == 0
    return np.stack(etas), parity_even


def _shift(f, mu, steps):
    return jnp.roll(f, -steps, axis=mu)


@dataclass(frozen=True)
class StaggeredDirac:
    mass: float
    lattice: tuple
    bc: tuple = (1, 1, 1, -1)

    @property
    def eta(self):
        return jnp.asarray(ks_phases(self.lattice)[0])

    @property
    def even_mask(self):
        return jnp.asarray(ks_phases(self.lattice)[1])

    def dslash(self, u: jnp.ndarray, psi: jnp.ndarray) -> jnp.ndarray:
        """Antihermitian hopping part (1/2) sum eta_mu (T+ - T-)."""
        eta = self.eta.astype(psi.dtype)
        out = 0.0
        for mu in range(DIRS):
            umu = u[mu]
            fwd = jnp.einsum("...ab,...b->...a", umu, _shift(psi, mu, +1))
            bwd = jnp.einsum(
                "...ba,...b->...a", jnp.conj(_shift(umu, mu, -1)), _shift(psi, mu, -1)
            )
            out = out + 0.5 * eta[mu][..., None] * (fwd - bwd)
        return out

    def apply(self, u: jnp.ndarray, psi: jnp.ndarray) -> jnp.ndarray:
        """D psi = m psi + Dslash psi."""
        return self.mass * psi + self.dslash(u, psi)

    def apply_dagger(self, u: jnp.ndarray, psi: jnp.ndarray) -> jnp.ndarray:
        return self.mass * psi - self.dslash(u, psi)

    def apply_w_even(self, u: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
        """W phi = (m^2 - Dslash^2) phi for even-supported phi.

        The even-odd preconditioned normal operator: spectrum in
        [m^2, m^2 + 16]; det W (over even sites) = det D.
        """
        even = self.even_mask[..., None]
        phi_e = jnp.where(even, phi, 0.0)
        d1 = self.dslash(u, phi_e)  # odd-supported
        d2 = self.dslash(u, d1)  # even-supported
        return jnp.where(even, self.mass**2 * phi_e - d2, 0.0)

    def apply_ddag_d(self, u, psi):
        """(m^2 - Dslash^2) psi on the full lattice."""
        return self.mass**2 * psi - self.dslash(u, self.dslash(u, psi))

    # ------------------------------------------------------------------
    # Packed even-odd layout
    #
    # The solver/HMC hot loop works on even-supported fields only; the
    # masked apply_w_even above still streams full-volume arrays, i.e.
    # 2x the HBM traffic and MXU work actually needed. The packed
    # layout halves the x-axis: parity-p sites of row (y,z,t) sit at
    # x = 2x' + offset, where offset = rho for even and 1-rho for odd,
    # rho(y,z,t) = (y+z+t) mod 2. Hops along mu != 0 are plain rolls
    # (the packed x' index is unchanged, shown by the offset algebra
    # in _gather_plus/_gather_minus); hops along x are a row-parity
    # select between the array and its roll. Everything in the CG
    # iteration then runs on V/2-site arrays.
    # ------------------------------------------------------------------

    # NOTE: all packing metadata stays in pure numpy — inside a jit
    # trace jnp ops would return tracers, while numpy index arrays keep
    # the gathers static.
    @property
    def _rho(self):
        """Row parity rho(y,z,t) as an int {0,1} numpy array."""
        ly, lz, lt = self.lattice[1:]
        gy, gz, gt = np.meshgrid(np.arange(ly), np.arange(lz), np.arange(lt),
                                 indexing="ij")
        return (gy + gz + gt) % 2

    def _offset(self, parity: int):
        """Packed-row offset field s(y,z,t) for parity 0=even, 1=odd."""
        rho = self._rho
        return rho if parity == 0 else 1 - rho

    # pack/unpack are pure reshape+select (NO gather/scatter): x = 2x'+s
    # maps the split x-axis (X/2, 2) onto a row-parity select, which XLA
    # compiles and differentiates cheaply (an advanced-index gather here
    # made the RHMC force's backward pass a scatter-add that took XLA:CPU
    # minutes to compile).
    def _row_select(self, s, f2):
        """Select phase s(y,z,t) from f2 (X/2, 2, Y, Z, T, ...)."""
        b = s.reshape((1,) + s.shape + (1,) * (f2.ndim - 5)).astype(bool)
        return jnp.where(b, f2[:, 1], f2[:, 0])

    def pack(self, f: jnp.ndarray, parity: int) -> jnp.ndarray:
        """Full field (X,Y,Z,T,...) -> packed (X/2,Y,Z,T,...)."""
        lx = self.lattice[0]
        f2 = f.reshape((lx // 2, 2) + f.shape[1:])
        return self._row_select(self._offset(parity), f2)

    def unpack(self, fp: jnp.ndarray, parity: int) -> jnp.ndarray:
        """Packed parity field -> full field, zero on the other parity."""
        s = self._offset(parity)
        b = s.reshape((1,) + s.shape + (1,) * (fp.ndim - 4)).astype(bool)
        ph0 = jnp.where(b, jnp.zeros_like(fp), fp)
        ph1 = jnp.where(b, fp, jnp.zeros_like(fp))
        f2 = jnp.stack([ph0, ph1], axis=1)
        return f2.reshape((self.lattice[0],) + fp.shape[1:])

    def packed_links(self, u: jnp.ndarray):
        """(U_even, U_odd): links packed by the parity of their base
        site; each (4, X/2, Y, Z, T, NC, NC). Differentiable."""
        lx = self.lattice[0]
        u2 = u.reshape((DIRS, lx // 2, 2) + u.shape[2:])
        rho = self._rho
        pick = lambda s: jax.vmap(lambda g2: self._row_select(s, g2))(u2)
        return pick(rho), pick(1 - rho)

    def _packed_eta(self, parity: int):
        return self.pack(jnp.moveaxis(self.eta, 0, -1), parity)  # (...,4)

    @staticmethod
    def _bcast(s, f):
        """Broadcast a (Y,Z,T) row field onto packed f (X/2,Y,Z,T,...)."""
        return s.reshape((1,) + s.shape + (1,) * (f.ndim - 4))

    def _gather_plus(self, f, mu, s_t):
        """f^src(x + mu) seen from target sites x = 2x' + s_t."""
        if mu == 0:
            return jnp.where(self._bcast(s_t, f).astype(bool),
                             jnp.roll(f, -1, axis=0), f)
        return jnp.roll(f, -1, axis=mu)

    def _gather_minus(self, f, mu, s_t):
        """f^src(x - mu) seen from target sites x = 2x' + s_t."""
        if mu == 0:
            return jnp.where(self._bcast(s_t, f).astype(bool),
                             f, jnp.roll(f, 1, axis=0))
        return jnp.roll(f, 1, axis=mu)

    def _packed_dslash(self, u_t, u_s, psi_s, target_parity: int):
        """(Dslash psi)(x) on target-parity sites; psi lives on the
        source parity. u_t/u_s are the packed link arrays of the
        target/source parity."""
        s_t = self._offset(target_parity)
        eta_t = self._packed_eta(target_parity)  # (X/2,Y,Z,T,4)
        out = 0.0
        for mu in range(DIRS):
            fwd = jnp.einsum("...ab,...b->...a", u_t[mu],
                             self._gather_plus(psi_s, mu, s_t))
            u_m = self._gather_minus(u_s[mu], mu, s_t)
            bwd = jnp.einsum("...ba,...b->...a", jnp.conj(u_m),
                             self._gather_minus(psi_s, mu, s_t))
            out = out + 0.5 * eta_t[..., mu, None].astype(psi_s.dtype) * (fwd - bwd)
        return out

    def apply_w_packed(self, u_eo, phi_pe: jnp.ndarray) -> jnp.ndarray:
        """W phi = (m^2 - D_eo D_oe) phi on PACKED even fields
        (X/2,Y,Z,T,NC) — identical to apply_w_even up to the layout
        (pinned in tests/test_dirac.py)."""
        u_e, u_o = u_eo
        d1 = self._packed_dslash(u_o, u_e, phi_pe, target_parity=1)
        d2 = self._packed_dslash(u_e, u_o, d1, target_parity=0)
        return self.mass**2 * phi_pe - d2
