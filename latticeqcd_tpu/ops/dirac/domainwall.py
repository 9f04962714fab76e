"""Standard (Shamir) domain-wall Dirac operator.

Counterpart of LatticeDiracOperators.jl's "Domainwall" operator
(SURVEY.md 2.4.2; params M, m, L5 at
/root/reference/src/system/universe.jl:118-128; reference test uses
M=-1, m=1, L5=4 on 4x4x2x2, test/test_domainwallhmc.toml). 5D field
psi[L5, X, Y, Z, T, 4, NC]; the L5 axis is purely local (never
sharded, SURVEY.md 7.4).

    (D_dw psi)_s = [D_w4(M) + 1] psi_s - P- psi_{s+1} - P+ psi_{s-1}

with P+- = (1 +- g5)/2 and chiral boundaries carrying the physical
mass m:  psi_{L5} -> -m psi_0 (P- branch), psi_{-1} -> -m psi_{L5-1}
(P+ branch). D_w4(M) is the 4D Wilson operator with bare mass M
(diagonal 4r + M). The adjoint is generated with
jax.linear_transpose (exact, no hand-written stencil transpose).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from latticeqcd_tpu.ops.dirac import gammas

DIRS = 4


def _shift4(f, mu, steps):
    """Shift on the 4D site axes of a 5D spinor (axes 1..4)."""
    return jnp.roll(f, -steps, axis=1 + mu)


@dataclass(frozen=True)
class DomainwallDirac:
    """D_dw(m) with height M and extent L5."""

    mass: float  # physical (boundary) mass m
    m5: float  # domain-wall height M (reference Domainwall_M)
    l5: int
    r: float = 1.0
    bc: tuple = (1, 1, 1, -1)

    def _wilson4(self, u, psi):
        """(4r + M) - (1/2) sum_mu [(r-g)U T+ + (r+g)U^dag T-] on each s."""
        pm, pp = gammas.projectors(self.r)
        pm = jnp.asarray(pm, dtype=psi.dtype)
        pp = jnp.asarray(pp, dtype=psi.dtype)
        out = (4.0 * self.r + self.m5) * psi
        hop = 0.0
        for mu in range(DIRS):
            umu = u[mu]  # (X,Y,Z,T,a,b) broadcasts over the leading L5 axis
            fwd = jnp.einsum("...ab,l...sb->l...sa", umu, _shift4(psi, mu, +1))
            bwd = jnp.einsum(
                "...ba,l...sb->l...sa",
                jnp.conj(jnp.roll(umu, 1, axis=mu)),
                _shift4(psi, mu, -1),
            )
            hop = hop + jnp.einsum("st,l...tc->l...sc", pm[mu], fwd)
            hop = hop + jnp.einsum("st,l...tc->l...sc", pp[mu], bwd)
        return out - 0.5 * hop

    def apply(self, u: jnp.ndarray, psi: jnp.ndarray) -> jnp.ndarray:
        """D_dw(m) psi for psi[L5, X, Y, Z, T, 4, NC]."""
        # dtype pinned: a default (f64 under x64) asarray here promotes
        # complex64 fields to complex128 through the broadcasts below
        rdt = jnp.float64 if psi.dtype == jnp.complex128 else jnp.float32
        g5 = jnp.asarray(np.diag(gammas.GAMMA5).real, dtype=rdt)
        p_minus = (1.0 - g5) / 2.0  # acts on spin axis diagonally
        p_plus = (1.0 + g5) / 2.0

        out = self._wilson4(u, psi) + psi

        # psi_{s+1} with boundary psi_{L5} = -m psi_0
        up = jnp.roll(psi, -1, axis=0)
        up = up.at[self.l5 - 1].set(-self.mass * psi[0])
        # psi_{s-1} with boundary psi_{-1} = -m psi_{L5-1}
        dn = jnp.roll(psi, 1, axis=0)
        dn = dn.at[0].set(-self.mass * psi[self.l5 - 1])

        out = out - p_minus[:, None] * up - p_plus[:, None] * dn
        return out

    def apply_dagger(self, u: jnp.ndarray, psi: jnp.ndarray) -> jnp.ndarray:
        """Exact adjoint via linear transpose: D^dag x = conj(D^T conj(x))."""
        f = lambda v: self.apply(u, v)
        (out,) = jax.linear_transpose(f, psi)(jnp.conj(psi))
        return jnp.conj(out)

    def apply_ddag_d(self, u, psi):
        return self.apply_dagger(u, self.apply(u, psi))
