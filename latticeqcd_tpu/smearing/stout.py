"""Stout smearing as a stack of differentiable layers.

Counterpart of Gaugefields.jl's CovNeuralnet / STOUT_Layer
(SURVEY.md 2.4.1; built at /root/reference/src/system/universe.jl:147-177,
used in MD at standardMD.jl:89-97,192-227). Each layer is the
Morningstar-Peardon map

    U'_mu = exp(i Q_mu) U_mu,
    Q_mu  = proj_TH( i U_mu V_mu ),   V_mu = staple sum of the layer's
                                      loop set weighted by rho,

with proj_TH the traceless-hermitian projection — algebraically
identical to the (i/2)(Omega^dag - Omega) - trace form of
hep-lat/0311018 with Omega = C U^dag. The whole stack is plain
differentiable jnp code, so the fermion-force chain rule through the
smearing (the reference's hand-written back_prop,
standardMD.jl:216-224) is jax.grad.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp

from latticeqcd_tpu.ops import sun, wilsonline
from latticeqcd_tpu.ops.wilsonline import make_loops_fromname

DIRS = 4


@dataclass(frozen=True)
class StoutLayer:
    """One stout layer: loop set + rho (uniform over loops)."""

    rho: float
    loop_names: Tuple[str, ...] = ("plaquette",)

    def _weighted_lines(self, dim=4):
        lines = []
        for name in self.loop_names:
            loops = make_loops_fromname(name, dim)
            for l in loops:
                lines.append((self.rho, l))
                lines.append((self.rho, l.adjoint()))
        return lines

    def smear(self, u: jnp.ndarray) -> jnp.ndarray:
        lines = self._weighted_lines()
        out = []
        for mu in range(DIRS):
            v = wilsonline.staple_sum(u, lines, mu)
            q = sun.traceless_hermitian(1j * sun.mul(u[mu], v))
            out.append(sun.mul(sun.expi_hermitian(q, 1.0), u[mu]))
        return jnp.stack(out, axis=0)


@dataclass(frozen=True)
class CovNet:
    """Stack of stout layers (CovNeuralnet semantics)."""

    layers: Tuple[StoutLayer, ...]

    def smear(self, u: jnp.ndarray) -> jnp.ndarray:
        for layer in self.layers:
            u = layer.smear(u)
        return u


def stout_stack(rhos, loop_names=("plaquette",)) -> CovNet:
    """Build a CovNet from per-layer rho values (universe.jl:147-171:
    one shared rho or one per layer)."""
    return CovNet(tuple(StoutLayer(float(r), tuple(loop_names)) for r in rhos))
