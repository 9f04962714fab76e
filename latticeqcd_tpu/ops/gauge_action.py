"""Generic loop-based gauge action: evaluation, staples, HMC force.

Mirrors the GaugeAction container of Gaugefields.jl (SURVEY.md
2.4.1): an action is a list of (coupling, loop-set) pairs; the
reference builds the Wilson action as plaquette loops *plus their
adjoints* at coupling beta/2 (/root/reference/src/system/universe.jl:85-94),
and the HMC driver uses S_g = -Re evaluate(U) / NC
(/root/reference/src/updates/standardHMC.jl:50). We keep those exact
conventions so actions/forces are drop-in comparable.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from latticeqcd_tpu.ops import sun, wilsonline
from latticeqcd_tpu.ops.wilsonline import Wilsonline, make_loops_fromname

DIRS = 4


@dataclass(frozen=True)
class GaugeAction:
    """Immutable list of (coupling, (Wilsonline,...)) terms.

    Counterpart of GaugeAction + push! (universe.jl:85-94), but
    persistent/hashable so updaters carrying an action can be jit
    static arguments. `push` returns a new action.

    plaq_coeff: when the action is exactly the adjoint-closed
    plaquette set at one coupling (the Wilson action), this records
    that coupling and staples/forces use a fused 6-staple kernel
    with shared shifts instead of the generic symbolic path —
    fewer ops for the MD hot loop (and much smaller XLA graphs).
    """

    nc: int
    terms: tuple = ()
    plaq_coeff: float = 0.0

    def push(self, coeff: float, loops) -> "GaugeAction":
        return GaugeAction(self.nc, self.terms + ((float(coeff), tuple(loops)),), 0.0)

    def weighted_lines(self):
        return [(c, line) for c, loops in self.terms for line in loops]

    def max_extent(self) -> int:
        """Largest |offset| reached by any loop — sets halo width needs
        and the coloring modulus for general-action heatbath."""
        ext = 1
        for _, loops in self.terms:
            for line in loops:
                offs = wilsonline._path_offsets(line.expand())
                for o in offs:
                    ext = max(ext, max(abs(x) for x in o))
        return ext


def wilson_gauge_action(nc: int, beta: float, dim: int = 4) -> GaugeAction:
    """The standard Wilson (plaquette) action exactly as the reference
    builds it: plaquette loops + adjoints at coupling beta/2
    (universe.jl:90-93). Marked for the fused-staple fast path."""
    plaq = make_loops_fromname("plaquette", dim)
    loops = list(plaq) + [l.adjoint() for l in plaq]
    act = GaugeAction(nc).push(beta / 2, loops)
    return GaugeAction(act.nc, act.terms, plaq_coeff=beta / 2)


def general_gauge_action(nc: int, couplings, loopsets) -> GaugeAction:
    act = GaugeAction(nc)
    for c, loops in zip(couplings, loopsets):
        ls = list(loops) + [l.adjoint() for l in loops]
        act = act.push(c / 2, ls)
    return act


def evaluate(action: GaugeAction, u: jnp.ndarray) -> jnp.ndarray:
    """evaluate_GaugeAction: sum_i c_i sum_x sum_loops tr W (complex)."""
    total = 0.0 + 0.0j
    for coeff, loops in action.terms:
        total = total + coeff * wilsonline.evaluate_loop_trace_sum(u, loops)
    return total


def action_value(action: GaugeAction, u: jnp.ndarray) -> jnp.ndarray:
    """S_g = -Re evaluate(U)/NC (standardHMC.jl:50)."""
    return -jnp.real(evaluate(action, u)) / action.nc


def _plaquette_staple(u: jnp.ndarray, mu: int) -> jnp.ndarray:
    """Fused canonical staple sum A_mu(y) = sum_{nu != mu} of the
    forward and backward plaquette staples, with shared shifts:

      fwd: U_nu(y+mu) U_mu(y+nu)^dag U_nu(y)^dag
      bwd: U_nu(y+mu-nu)^dag U_mu(y-nu)^dag U_nu(y-nu)
    """
    total = 0.0
    for nu in range(DIRS):
        if nu == mu:
            continue
        unu = u[nu]
        umu = u[mu]
        unu_pmu = wilsonline._roll_to(unu, _unit(mu))
        umu_pnu = wilsonline._roll_to(umu, _unit(nu))
        fwd = sun.mul(unu_pmu, sun.dagger(sun.mul(unu, umu_pnu)))
        # backward staple: everything lives at y-nu, then shift up
        # (reuses the same U_nu(y+mu) shift as the forward staple)
        bwd_at = sun.mul(sun.dagger(sun.mul(umu, unu_pmu)), unu)
        bwd = wilsonline._roll_to(bwd_at, _neg_unit(nu))
        total = total + fwd + bwd
    return total


def _neg_unit(mu):
    e = [0] * DIRS
    e[mu] = -1
    return e


def staples(action: GaugeAction, u: jnp.ndarray, mu: int) -> jnp.ndarray:
    """Weighted staple sum V_mu(y): d(sum c tr W)/d(U_mu) = V^T.

    For the reference Wilson action this equals (beta/2) * A with A
    the ordinary 6-staple sum (fused fast path, validated against the
    symbolic path in tests/test_gauge_action.py)."""
    if action.plaq_coeff != 0.0:
        return action.plaq_coeff * _plaquette_staple(u, mu)
    return wilsonline.staple_sum(u, action.weighted_lines(), mu)


def local_heatbath_exponent_matrix(action: GaugeAction, u: jnp.ndarray, mu: int) -> jnp.ndarray:
    """Matrix V such that the single-link weight is
    exp(+(2/NC) Re tr(U_mu(y) V(y))) — consumed by heatbath/OR."""
    return staples(action, u, mu)


def force(action: GaugeAction, u: jnp.ndarray) -> jnp.ndarray:
    """Hdot_mu(y) = (1/NC) * proj_TH( i U_mu(y) V_mu(y) ).

    Derivation: with Udot = i H U and S_g = -(1/NC) Re sum c tr W over
    an adjoint-closed loop set, dS_g/dt = -(2/NC) sum tr(H proj_TH(iUV)),
    and conservation of H_tot = tr(H^2) + S_g gives the expression
    above. Counterpart of P_update!'s factor -eps*dtau/NC combined
    with calc_dSdUmu! (/root/reference/src/md/AbstractMD.jl:100-118).
    Verified against autodiff and finite differences in
    tests/test_gauge_force.py.
    """
    out = []
    for mu in range(DIRS):
        v = staples(action, u, mu)
        out.append(sun.traceless_hermitian(1j * sun.mul(u[mu], v)) / action.nc)
    return jnp.stack(out, axis=0)


def force_autodiff(action: GaugeAction, u: jnp.ndarray) -> jnp.ndarray:
    """Generic-oracle force via JAX autodiff of S_g.

    Works for any action (adjoint-closed or not). JAX's complex-grad
    convention for real S (pinned empirically against jax.jvp, see
    tests/test_gauge_action.py): dS = Re sum_ij g_ij du_ij
    (UNconjugated pairing). With du = iHU:
        dS/dt = Re tr(iHU g^T) = tr(H proj_TH(i U g^T)),
    and energy conservation d/dt[tr H^2 + S] = 0 gives
        Hdot = -(1/2) proj_TH(i U g^T).
    Used as a test oracle and as the fallback for exotic loop sets.
    """

    def s_of(uu):
        return action_value(action, uu)

    g = jax.grad(s_of)(u)
    out = []
    for mu in range(DIRS):
        m = 1j * sun.mul(u[mu], jnp.swapaxes(g[mu], -1, -2))
        out.append(-0.5 * sun.traceless_hermitian(m))
    return jnp.stack(out, axis=0)


# ---------------------------------------------------------------------------
# Plaquette observable
# ---------------------------------------------------------------------------


def plaquette_sum(u: jnp.ndarray) -> jnp.ndarray:
    """sum_x sum_{mu<nu} Re tr P_munu(x), computed with minimal shifts."""
    total = 0.0
    for mu in range(DIRS):
        for nu in range(mu + 1, DIRS):
            umu = u[mu]
            unu = u[nu]
            a = sun.mul(umu, wilsonline._roll_to(unu, _unit(mu)))
            b = sun.mul(unu, wilsonline._roll_to(umu, _unit(nu)))
            total = total + jnp.sum(jnp.real(sun.trace(sun.mul(a, sun.dagger(b)))))
    return total


def _unit(mu):
    e = [0] * DIRS
    e[mu] = 1
    return e


def mean_plaquette(u: jnp.ndarray) -> jnp.ndarray:
    """<Re tr P> / (6 * NV * NC) in 4D — the factor used by the
    reference's Plaquette measurement
    (/root/reference/src/measurements/unusedfiles/measure_plaquette.jl:34-41)."""
    nc = u.shape[-1]
    nv = 1
    for n in u.shape[1:5]:
        nv *= n
    comb = DIRS * (DIRS - 1) // 2
    return plaquette_sum(u) / (comb * nv * nc)
