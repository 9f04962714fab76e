"""Pure observable kernels (jit-friendly).

Algorithms mirror the reference's archived QCDMeasurements kernels
(SURVEY.md 2.4.3; /root/reference/src/measurements/unusedfiles/):

* plaquette:  Re tr sum P / (6 NV NC)          (measure_plaquette.jl:34-41)
* Polyakov:   <tr prod_t U_4> / (NC V3)        (measure_polyakov.jl:56-69)
* topological charge, plaq/clover/improved     (measure_topological_charge.jl:133-359)
* energy density (clover)                      (measure_energy_density.jl:93-157)
* RxT Wilson loop                              (measure_Wilsonloop.jl:106-135)
"""

from __future__ import annotations

import itertools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from latticeqcd_tpu.ops import gauge_action as ga
from latticeqcd_tpu.ops import sun, wilsonline
from latticeqcd_tpu.ops.wilsonline import Wilsonline

DIRS = 4

# All public observables are jitted: on a sharded mesh each is ONE SPMD
# program (eager per-op dispatch of sharded collectives can deadlock the
# multi-device runtime, and is slow anyway).


@jax.jit
def mean_plaquette(u):
    return ga.mean_plaquette(u)


@jax.jit
def polyakov_loop(u):
    """Complex <(1/NC) tr prod_t U_4(x, t)>_xspace."""
    nt = u.shape[4]
    nc = u.shape[-1]
    acc = u[3][:, :, :, 0]  # (X,Y,Z,a,b)
    for t in range(1, nt):
        acc = sun.mul(acc, u[3][:, :, :, t])
    tr = sun.trace(acc)
    return jnp.mean(tr) / nc


# ---------------------------------------------------------------------------
# Field strength via loop sets; topological charge; energy density
# ---------------------------------------------------------------------------

_EPS4 = np.zeros((4, 4, 4, 4))
for perm in itertools.permutations(range(4)):
    sign = 1
    p = list(perm)
    for i in range(4):
        for j in range(i + 1, 4):
            if p[i] > p[j]:
                sign = -sign
    _EPS4[perm] = sign


def _loopset_munu(name: str):
    """loops[mu][nu] and numofloops, mirroring calc_loopset_munu_name
    (measure_topological_charge.jl:287-345)."""
    loops = {}
    if name == "plaq":
        num = 1
        for mu in range(4):
            for nu in range(4):
                if mu == nu:
                    continue
                loops[(mu, nu)] = [Wilsonline([(mu, 1), (nu, 1), (mu, -1), (nu, -1)])]
    elif name == "clover":
        num = 4
        for mu in range(4):
            for nu in range(4):
                if mu == nu:
                    continue
                loops[(mu, nu)] = wilsonline.make_cloverloops(mu, nu)
    elif name == "rect":
        num = 8
        for mu in range(4):
            for nu in range(4):
                if mu == nu:
                    continue
                ls = []
                for (a, la, b, lb) in [(mu, 2, nu, 1), (mu, 1, nu, 2)]:
                    ls += [
                        Wilsonline([(a, la), (b, lb), (a, -la), (b, -lb)]),
                        Wilsonline([(b, lb), (a, -la), (b, -lb), (a, la)]),
                        Wilsonline([(b, -lb), (a, la), (b, lb), (a, -la)]),
                        Wilsonline([(a, -la), (b, -lb), (a, la), (b, lb)]),
                    ]
                loops[(mu, nu)] = ls
    else:
        raise ValueError(name)
    return loops, num


def _field_strength_ta(u, name):
    """TA-projected loop sums F[(mu,nu)] per ordered pair."""
    loops, num = _loopset_munu(name)
    f = {}
    for (mu, nu), ls in loops.items():
        acc = 0.0
        for line in ls:
            acc = acc + wilsonline.evaluate_line(u, line)
        f[(mu, nu)] = sun.traceless_antihermitian(acc)
    return f, num


def _q_from_fields(f, num):
    """Q = -(1/32 pi^2) sum eps_{mu nu rho sigma} tr(F F)/num^2
    over all ordered pairs (measure_topological_charge.jl:206-233)."""
    q = 0.0
    for mu in range(4):
        for nu in range(4):
            if mu == nu:
                continue
            for rho in range(4):
                for sig in range(4):
                    if rho == sig:
                        continue
                    e = _EPS4[mu, nu, rho, sig]
                    if e == 0:
                        continue
                    s = jnp.sum(sun.trace(sun.mul(f[(mu, nu)], f[(rho, sig)])))
                    q = q + e * jnp.real(s) / num**2
    return -q / (32 * np.pi**2)


@partial(jax.jit, static_argnums=1)
def topological_charge(u, kind: str = "clover"):
    """kind in {"plaquette", "clover", "improved"}."""
    if kind in ("plaquette", "plaq"):
        f, num = _field_strength_ta(u, "plaq")
        return _q_from_fields(f, num)
    if kind == "clover":
        f, num = _field_strength_ta(u, "clover")
        return _q_from_fields(f, num)
    if kind == "improved":
        fc, nc_ = _field_strength_ta(u, "clover")
        qclover = _q_from_fields(fc, nc_)
        fr, nr = _field_strength_ta(u, "rect")
        qrect = 2.0 * _q_from_fields(fr, nr)
        return (5.0 / 3.0) * qclover - (1.0 / 12.0) * qrect
    raise ValueError(kind)


@jax.jit
def energy_density(u):
    """Clover-based E (measure_energy_density.jl:93-133): W_munu = sum
    of 4 clover leaves; E = Re sum_{mu!=nu} tr(W W)/4 / (NV 6 NC 8)."""
    nc = u.shape[-1]
    nv = int(np.prod(u.shape[1:5]))
    total = 0.0
    loops, _ = _loopset_munu("clover")
    for (mu, nu), ls in loops.items():
        acc = 0.0
        for line in ls:
            acc = acc + wilsonline.evaluate_line(u, line)
        total = total + jnp.sum(sun.trace(sun.mul(acc, acc))) / 4.0
    ndir = 6.0
    return jnp.real(total) / nv / ndir / nc / 8.0


@partial(jax.jit, static_argnums=(1, 2))
def wilson_loop_rt(u, ls: int, lt: int):
    """<Re tr W(Ls x Lt)> averaged over the 3 spatial directions,
    normalized by 1/(NV 3 NC) (measure_Wilsonloop.jl:71-135)."""
    nc = u.shape[-1]
    nv = int(np.prod(u.shape[1:5]))
    total = 0.0
    for mu in range(3):
        line = Wilsonline([(mu, ls), (3, lt), (mu, -ls), (3, -lt)])
        w = wilsonline.evaluate_line(u, line)
        total = total + jnp.sum(jnp.real(sun.trace(w)))
    return total / (nv * 3 * nc)
