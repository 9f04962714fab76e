"""Pallas TPU kernel: fused Wilson D-slash (r=1, csw=0).

The VERDICT.md item-2 prototype: one hand-written Mosaic kernel that
applies the full hopping term in a single pass, A/B'd against the
XLA jnp.roll/einsum formulation in ops/dirac/wilson.py (which the
roofline in PERF.md shows is already HBM-bound). Reference semantics:
the same hopping form as WilsonDirac.apply (LatticeDiracOperators.jl
Wilson operator, SURVEY.md 2.4.2).

Design
------
* Mosaic has no complex dtype, so fields live in a planar float32
  "kernel layout": psi_k[T, 24, Z, Y*X] with plane p = (s*3+c)*2 + reim
  and lane index y*X + x; links u_k[T, 4, 18, Z, Y*X] with plane
  (a*3+b)*2 + reim. Layout conversion happens once outside the kernel
  (in a CG loop it amortizes over all iterations; the A/B script
  reports both the steady-state and conversion-included numbers).
* Grid over T (sequential). The t±1 spinor slices arrive as two extra
  inputs whose BlockSpec index maps are (i∓1) mod T — the periodic
  halo is pure pipeline indexing, no gather. Backward-t links come
  from a fourth input mapped to (i-1) mod T.
* Spatial hops are in-VMEM rolls on (Z, Y*X) planes: z = sublane roll,
  y = lane roll by X, x = lane roll by 1 with a (lane % X) select for
  the wraparound column.
* Spin structure: in this gamma basis every gamma_mu is block
  off-diagonal (it anticommutes with gamma5 = diag(1,1,-1,-1)), so
  (1 -+ gamma_mu) = W W^dag with W[4,2] = columns (e_h -+ gamma e_h),
  h = 0,1 — entries 0/±1/±i only. Project to a half spinor (pure
  adds / re-im swaps), do the 3x3 color multiply on 2 spin components
  instead of 4, reconstruct (adds again): the QPhiX/Grid trick, same
  as the XLA path's half_spinor_factors but with coefficient
  multiplies compiled away.

Boundary phases must already be absorbed into the links
(apply_boundary_phases), exactly like WilsonDirac.apply.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from latticeqcd_tpu.ops.dirac import gammas

DIRS = 4
NC = 3
NS = 4


# --------------------------------------------------------------- spin tables


def _w_tables():
    """W∓[mu][h] = (j, w_hh=1 implicit, w_jh) with (1 ∓ gamma_mu) = W W†.

    Returns (wm, wp): for each mu a list over h in (0,1) of
    (j, coeff) where column h of W is e_h + coeff * e_j, j in (2,3).
    """
    wm, wp = [], []
    for mu in range(DIRS):
        g = gammas.GAMMA[mu]
        rows_m, rows_p = [], []
        for h in (0, 1):
            nz = [j for j in (2, 3) if g[j, h] != 0]
            assert len(nz) == 1, (mu, h, g[:, h])
            j = nz[0]
            rows_m.append((j, complex(-g[j, h])))  # 1 - gamma
            rows_p.append((j, complex(+g[j, h])))  # 1 + gamma
        wm.append(rows_m)
        wp.append(rows_p)
    # verify W W† = 1 -+ gamma exactly
    for mu in range(DIRS):
        for rows, sign in ((wm[mu], -1), (wp[mu], +1)):
            w = np.zeros((4, 2), dtype=complex)
            for h, (j, c) in enumerate(rows):
                w[h, h] = 1.0
                w[j, h] = c
            assert np.allclose(w @ w.conj().T, np.eye(4) + sign * gammas.GAMMA[mu])
    return wm, wp


_WM, _WP = _w_tables()


# ------------------------------------------------------- complex plane algebra
# a complex field is a pair (re, im) of equal-shape float arrays


def _cadd(a, b):
    return (a[0] + b[0], a[1] + b[1])


def _cmul(a, b):
    return (a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0])


def _cmulj(a, b):
    """conj(a) * b."""
    return (a[0] * b[0] + a[1] * b[1], a[0] * b[1] - a[1] * b[0])


def _cconst(c, x):
    """c * x for c in {1, -1, i, -i} — free (sign flips / re-im swaps)."""
    if c == 1:
        return x
    if c == -1:
        return (-x[0], -x[1])
    if c == 1j:
        return (-x[1], x[0])
    if c == -1j:
        return (x[1], -x[0])
    raise ValueError(f"coefficient {c} is not a fourth root of unity")


# ---------------------------------------------------------------- the kernel


def _make_shift(lx, interpret):
    """Periodic x/y/z neighbor access on a (Z, Y*X) plane. All shift
    amounts are static; pltpu.roll requires them non-negative, so they
    are normalized modulo the axis length."""
    if interpret:
        _roll = lambda f, s, axis: jnp.roll(f, s, axis=axis)
    else:
        from jax.experimental.pallas import tpu as pltpu

        _roll = lambda f, s, axis: (
            f if s % f.shape[axis] == 0 else pltpu.roll(f, s % f.shape[axis], axis)
        )

    def shift(f, mu, sign):
        """f(x + sign*mu_hat), periodic."""
        if mu == 2:  # z: sublane axis
            return _roll(f, -sign, 0)
        if mu == 1:  # y: lane roll by X
            return _roll(f, -sign * lx, 1)
        # x: lane roll by 1 with wraparound select inside each X-group
        lane_x = jax.lax.broadcasted_iota(jnp.int32, f.shape, 1) % lx
        if sign > 0:
            return jnp.where(lane_x == lx - 1, _roll(f, lx - 1, 1), _roll(f, -1, 1))
        return jnp.where(lane_x == 0, _roll(f, -(lx - 1), 1), _roll(f, 1, 1))

    return shift


def _make_kernel(lattice, kappa, interpret):
    lx, ly, lz, lt = lattice
    yx = lx * ly

    shift = _make_shift(lx, interpret)

    def kernel(pm_ref, p0_ref, pp_ref, u_ref, utm_ref, out_ref):
        def psi_at(ref):
            return lambda s, c: (ref[0, (s * NC + c) * 2], ref[0, (s * NC + c) * 2 + 1])

        def link(mu, a, b):
            p = (a * NC + b) * 2
            return (u_ref[0, mu, p], u_ref[0, mu, p + 1])

        def linkm(a, b):  # backward-t link U_t(x, t-1)
            p = (a * NC + b) * 2
            return (utm_ref[0, p], utm_ref[0, p + 1])

        out = _dslash_body(
            shift, psi_at(p0_ref), psi_at(pm_ref), psi_at(pp_ref), link, linkm, kappa
        )
        for p in range(NS * NC * 2):
            out_ref[0, p] = out[p]

    return kernel


def _dslash_body(shift, psi0, psim, psip, link, linkm, kappa):
    """The unrolled D-slash compute, layout-agnostic.

    psi0/psim/psip: (s, c) -> (re, im) plane pair at t / t-1 / t+1;
    link: (mu, a, b) -> (re, im) at t; linkm: (a, b) -> U_t at t-1.
    Returns the 24 output planes [plane p = (s*NC+c)*2 + reim].
    """
    zero0, zero1 = psi0(0, 0)
    zero = zero0 * 0.0
    acc = [[(zero, zero) for _ in range(NC)] for _ in range(NS)]

    def accumulate(rows, phi):
        """acc += W phi, column structure rows[h] = (j, coeff)."""
        for h, (j, cf) in enumerate(rows):
            for c in range(NC):
                acc[h][c] = _cadd(acc[h][c], phi[h][c])
                acc[j][c] = _cadd(acc[j][c], _cconst(cf, phi[h][c]))

    def project(rows, get):
        """half[h][c] = (W† psi)[h][c] = psi[h] + conj(coeff) psi[j]."""
        return [
            [_cadd(get(h, c), _cconst(np.conj(cf), get(j, c))) for c in range(NC)]
            for h, (j, cf) in enumerate(rows)
        ]

    def colmul(u_of, half):
        """phi[h][a] = sum_b U[a,b] half[h][b]."""
        return [
            [
                _cadd(
                    _cadd(_cmul(u_of(a, 0), half[h][0]), _cmul(u_of(a, 1), half[h][1])),
                    _cmul(u_of(a, 2), half[h][2]),
                )
                for a in range(NC)
            ]
            for h in range(2)
        ]

    def colmul_dag(u_of, half):
        """phi[h][a] = sum_b conj(U[b,a]) half[h][b]."""
        return [
            [
                _cadd(
                    _cadd(_cmulj(u_of(0, a), half[h][0]), _cmulj(u_of(1, a), half[h][1])),
                    _cmulj(u_of(2, a), half[h][2]),
                )
                for a in range(NC)
            ]
            for h in range(2)
        ]

    # spatial directions: project at x, shift the 12 half planes
    for mu in range(3):
        # forward: W- (U_mu(x) (W-† psi)(x+mu))
        half = project(_WM[mu], psi0)
        half = [
            [(shift(re, mu, +1), shift(im, mu, +1)) for (re, im) in hc] for hc in half
        ]
        accumulate(_WM[mu], colmul(lambda a, b, _mu=mu: link(_mu, a, b), half))
        # backward: W+ (U_mu(x-mu)† (W+† psi)(x-mu))
        half = project(_WP[mu], psi0)
        half = [
            [(shift(re, mu, -1), shift(im, mu, -1)) for (re, im) in hc] for hc in half
        ]
        u_sh = lambda a, b, _mu=mu: tuple(shift(p, _mu, -1) for p in link(_mu, a, b))
        accumulate(_WP[mu], colmul_dag(u_sh, half))

    # time direction: neighbor slices
    accumulate(_WM[3], colmul(lambda a, b: link(3, a, b), project(_WM[3], psip)))
    accumulate(_WP[3], colmul_dag(linkm, project(_WP[3], psim)))

    # out = psi - kappa * hop
    k = jnp.asarray(kappa, dtype=zero.dtype)
    out = []
    for s in range(NS):
        for c in range(NC):
            pre, pim = psi0(s, c)
            out.append(pre - k * acc[s][c][0])
            out.append(pim - k * acc[s][c][1])
    return out


# ------------------------------------------------- sliding-window variant
#
# The simple pipelined kernel above re-reads the t-1 and t+1 spinor
# slices per grid step (3 psi reads -> 744 B/site of HBM traffic). This
# variant keeps psi and ALL links in HBM (memory_space ANY) and streams
# t-slices through 4-slot rotating VMEM windows with manual async DMA:
# every slice is read exactly once, so the traffic is the roofline
# minimum 480 B/site (PERF.md). The grid is sequential on a TPU core,
# so the windows persist across steps; prefetch of slice i+2 overlaps
# the compute of slice i.
#
# Load sequence: entry k holds slice (k-1) mod T (entry 0 = the t=T-1
# wraparound slice), slot = k mod 4. Step i consumes entries i, i+1,
# i+2 (slices i-1, i, i+1) and prefetches entry i+3 into the slot of
# the just-expired entry i-1.


def _make_window_kernel(lattice, kappa, interpret=False, depth=4):
    """depth = number of in-flight prefetched slices (window = 3 + depth
    slots); deeper prefetch hides more DMA latency at the cost of VMEM
    (each link slot is ~1.2 MB at 16^3 spatial)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lx, ly, lz, lt = lattice
    nplanes = NS * NC * 2
    nslot = 3 + depth
    shift = _make_shift(lx, interpret)

    def kernel(psi_hbm, u_hbm, out_ref, psi_win, u_win, sems):
        i = pl.program_id(0)

        def dma(field, k):
            """Async copy of load-sequence entry k (slice (k-1) mod T)."""
            t = (k - 1) % lt
            slot = k % nslot
            hbm, win, row = (
                (psi_hbm, psi_win, 0) if field == 0 else (u_hbm, u_win, 1)
            )
            return pltpu.make_async_copy(
                hbm.at[t], win.at[slot], sems.at[row, slot]
            )

        # entries 0..lt+1 each started and waited exactly once:
        # warm-up starts 0..depth+1 and waits 0..1; step i waits entry
        # i+2 and starts entry i+2+depth while slices i-1..i+1 compute.
        @pl.when(i == 0)
        def _():
            for k in range(min(depth + 2, lt + 2)):
                dma(0, k).start()
                dma(1, k).start()
            for k in (0, 1):
                dma(0, k).wait()
                dma(1, k).wait()

        @pl.when(i + 2 + depth <= lt + 1)
        def _():
            dma(0, i + 2 + depth).start()
            dma(1, i + 2 + depth).start()

        dma(0, i + 2).wait()
        dma(1, i + 2).wait()

        sl_m = i % nslot  # entry i     = slice i-1
        sl_0 = (i + 1) % nslot  # entry i+1 = slice i
        sl_p = (i + 2) % nslot  # entry i+2 = slice i+1

        def psi_at(slot):
            return lambda s, c: (
                psi_win[slot, (s * NC + c) * 2],
                psi_win[slot, (s * NC + c) * 2 + 1],
            )

        def link(mu, a, b):
            p = (a * NC + b) * 2
            return (u_win[sl_0, mu, p], u_win[sl_0, mu, p + 1])

        def linkm(a, b):
            p = (a * NC + b) * 2
            return (u_win[sl_m, 3, p], u_win[sl_m, 3, p + 1])

        out = _dslash_body(
            shift, psi_at(sl_0), psi_at(sl_m), psi_at(sl_p), link, linkm, kappa
        )
        for p in range(nplanes):
            out_ref[0, p] = out[p]

    return kernel


@partial(jax.jit, static_argnames=("lattice", "kappa", "interpret", "depth"))
def dslash_planes_window(psi_k, u_k, lattice, kappa, interpret=False, depth=4):
    """Sliding-window D-slash on kernel-layout fields. Minimum-traffic
    variant (manual DMA; interpret=True emulates the DMAs on CPU)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lx, ly, lz, lt = lattice
    if lt < 2:
        raise ValueError("window kernel needs T >= 2")
    nplanes, yx = NS * NC * 2, lx * ly
    nslot = 3 + depth
    kernel = _make_window_kernel(lattice, kappa, interpret, depth)
    return pl.pallas_call(
        kernel,
        grid=(lt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, nplanes, lz, yx), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(psi_k.shape, psi_k.dtype),
        scratch_shapes=[
            pltpu.VMEM((nslot, nplanes, lz, yx), psi_k.dtype),
            pltpu.VMEM((nslot, DIRS, 2 * NC * NC, lz, yx), u_k.dtype),
            pltpu.SemaphoreType.DMA((2, nslot)),
        ],
        interpret=interpret,
    )(psi_k, u_k)


# ----------------------------------------------------------- layout transforms


def psi_to_planes(psi):
    """[X,Y,Z,T,4,3] complex -> [T, 24, Z, Y*X] float."""
    lx, ly, lz, lt = psi.shape[:4]
    f = jnp.transpose(psi, (3, 4, 5, 2, 1, 0))  # [T,s,c,Z,Y,X]
    f = jnp.stack([f.real, f.imag], axis=3)  # [T,s,c,2,Z,Y,X]
    return f.reshape(lt, NS * NC * 2, lz, ly * lx)


def planes_to_psi_shaped(f, lattice, dtype=jnp.complex64):
    lx, ly, lz, lt = lattice
    g = f.reshape(lt, NS, NC, 2, lz, ly, lx)
    cplx = g[:, :, :, 0] + 1j * g[:, :, :, 1]  # [T,s,c,Z,Y,X]
    return jnp.transpose(cplx, (5, 4, 3, 0, 1, 2)).astype(dtype)


def links_to_planes(u):
    """[4,X,Y,Z,T,a,b] complex -> ([T,4,18,Z,Y*X], [T,18,Z,Y*X]) float.

    Second array = the t-direction links again (sliced view), DMA'd at
    (t-1) mod T for the backward time hop.
    """
    _, lx, ly, lz, lt = u.shape[:5]
    f = jnp.transpose(u, (4, 0, 5, 6, 3, 2, 1))  # [T,mu,a,b,Z,Y,X]
    f = jnp.stack([f.real, f.imag], axis=4)  # [T,mu,a,b,2,Z,Y,X]
    uk = f.reshape(lt, DIRS, NC * NC * 2, lz, ly * lx)
    return uk, uk[:, 3]


# ----------------------------------------------------------------- public API


@partial(jax.jit, static_argnames=("lattice", "kappa", "interpret"))
def dslash_planes(psi_k, u_k, ut_k, lattice, kappa, interpret=False):
    """Apply Wilson D on kernel-layout fields (steady-state hot path)."""
    from jax.experimental import pallas as pl

    lx, ly, lz, lt = lattice
    nplanes, yx = NS * NC * 2, lx * ly
    kernel = _make_kernel(lattice, kappa, interpret)

    def tmap(off):
        return lambda i: ((i + off) % lt, 0, 0, 0)

    def tmap_u(off):
        return lambda i: ((i + off) % lt, 0, 0, 0, 0)

    blk_psi = pl.BlockSpec((1, nplanes, lz, yx), tmap(0))
    return pl.pallas_call(
        kernel,
        grid=(lt,),
        in_specs=[
            pl.BlockSpec((1, nplanes, lz, yx), tmap(-1)),
            blk_psi,
            pl.BlockSpec((1, nplanes, lz, yx), tmap(+1)),
            pl.BlockSpec((1, DIRS, 2 * NC * NC, lz, yx), tmap_u(0)),
            pl.BlockSpec((1, 2 * NC * NC, lz, yx), tmap(-1)),
        ],
        out_specs=blk_psi,
        out_shape=jax.ShapeDtypeStruct(psi_k.shape, psi_k.dtype),
        interpret=interpret,
    )(psi_k, psi_k, psi_k, u_k, ut_k)


def dslash_pallas(u, psi, kappa, interpret=False, dtype=None):
    """Full D psi from framework-layout fields (conversions included).

    u must carry boundary phases already. Matches WilsonDirac(kappa,
    r=1, csw=0).apply(u, psi) up to float32 rounding.
    """
    lattice = tuple(psi.shape[:4])
    out_dtype = dtype or psi.dtype
    fdtype = jnp.float64 if out_dtype == jnp.complex128 else jnp.float32
    psi_k = psi_to_planes(psi).astype(fdtype)
    u_k, ut_k = links_to_planes(u)
    u_k, ut_k = u_k.astype(fdtype), ut_k.astype(fdtype)
    out_k = dslash_planes(psi_k, u_k, ut_k, lattice, float(kappa), interpret)
    return planes_to_psi_shaped(out_k, lattice, dtype=out_dtype)
