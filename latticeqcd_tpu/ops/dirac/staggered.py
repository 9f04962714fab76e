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
