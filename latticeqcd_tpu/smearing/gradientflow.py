"""Wilson / generic-action gradient flow (Luescher RK3).

Counterpart of Gaugefields.jl's Gradientflow + flow! (SURVEY.md
2.4.1; driver use at /root/reference/src/system/lqcd.jl:95-99,150-165;
generic-action flow is the reference's experimental feature,
README.md:126).

Flow equation: dU/dt = i H_fl(U) U with H_fl = -K(U), where K is the
gradient of the flow action in the canonical su(N) metric (2 tr(XY)).
For the Wilson-plaquette flow the normalization is fixed to the
standard heat-kernel convention (dA/dt = Delta A in the small-field
limit, arXiv:1006.4518): flow action = wilson_gauge_action(NC, 2*NC),
validated in tests/test_smearing.py by the exact exp(-p_hat^2 t)
decay of a free transverse mode. Integrator: Luescher's 3-stage RK
(eq. (C.1.5)-style), one step per `eps`.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from latticeqcd_tpu.md.integrators import update_links
from latticeqcd_tpu.ops import gauge_action as ga


def wilson_flow_action(nc: int) -> ga.GaugeAction:
    """Heat-kernel-normalized plaquette flow action (beta_flow = 2 NC)."""
    return ga.wilson_gauge_action(nc, 2.0 * nc)


@dataclass(frozen=True)
class GradientFlow:
    """flow! over a fixed action; Nflow RK3 steps of size eps per call."""

    action: ga.GaugeAction
    eps: float = 0.01
    nflow: int = 1

    @partial(jax.jit, static_argnums=0)
    def flow(self, u: jnp.ndarray) -> jnp.ndarray:
        def z(uu):
            # H_fl = +force (force = -K = descent direction; see
            # ops/gauge_action.force derivation)
            return ga.force(self.action, uu)

        def rk3_step(uu, _):
            z0 = self.eps * z(uu)
            w1 = update_links(uu, z0, 0.25)
            z1 = self.eps * z(w1)
            w2 = update_links(w1, (8.0 / 9.0) * z1 - (17.0 / 36.0) * z0, 1.0)
            z2 = self.eps * z(w2)
            w3 = update_links(w2, 0.75 * z2 - (8.0 / 9.0) * z1 + (17.0 / 36.0) * z0, 1.0)
            return w3, None

        u_out, _ = jax.lax.scan(rk3_step, u, None, length=self.nflow)
        return u_out


def gradientflow(u_or_nc, nflow: int = 1, eps: float = 0.01, action: Optional[ga.GaugeAction] = None):
    """Gradientflow(U; Nflow, eps) facade (lqcd.jl:99)."""
    if action is None:
        nc = u_or_nc if isinstance(u_or_nc, int) else u_or_nc.shape[-1]
        action = wilson_flow_action(nc)
    return GradientFlow(action=action, eps=eps, nflow=nflow)
