"""Pallas TPU kernel: fused packed even-odd staggered W = m² − D_eo D_oe.

The RHMC/CG hot operator (StaggeredDirac.apply_w_packed,
ops/dirac/staggered.py:134) as ONE Mosaic kernel: both half-volume
D-slash hops, the Kogut-Susskind phases, and the m² axpy fused, with
every input slice read from HBM exactly once.

The double hop has stencil radius 2 in t, so the kernel runs a
two-level sliding window over the (sequential) T grid:

* packed even spinor phi and the packed links (both parities) stream
  through 4-slot rotating VMEM windows via manual DMA — entry k of
  each load sequence holds t-slice (k−2) mod T in slot k mod 4;
* the odd-site intermediate d1 = D_oe phi lives in a 3-slot pure-VMEM
  ring: step i computes d1[i+1] (from phi slices i, i+1, i+2 and links
  i, i+1), then d2[i] = D_eo d1 (from d1 slices i−1, i, i+1 and links
  i−1, i), then writes out[i] = m²·phi[i] − d2[i];
* warm-up at i = 0 fills d1[T−1] and d1[0] from the wraparound
  slices (phi T−2..1, links T−2..0) before the steady state begins.

Packed-layout geometry (ops/dirac/eo_pack.py): lattice extents all
even; packed x' = x//2 with row offset s(y,z,t) = (y+z+t+parity) mod 2;
hops along y/z/t are plain neighbor accesses in the packed layout,
x hops are a row-parity select between the field and its x'-roll. The
KS phases reduce to (−1)^offset masks: with x = 2x'+s,
eta_2 = (−1)^x = (−1)^s, eta_3 = (−1)^(s+y), eta_4 = (−1)^(s+y+z) —
all computable from iotas + the (traced) slice index, so phase
application is a masked negate, not a multiply.

Plane layout: phi_k[T, 6, Z, Y·X2] float32 (plane = c·2+reim, lane =
y·X2+x'); links u_k[T, 2(parity), 4(mu), 18, Z, Y·X2]. At 16³×32 the
lane count is exactly 16·8 = 128. Boundary phases must already be in
the links (apply_boundary_phases) before packing, as for the XLA path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from latticeqcd_tpu.ops.dirac.wilson_pallas import (
    _cadd,
    _cmul,
    _cmulj,
    _make_shift,
)

NC = 3
DIRS = 4


def _csub(a, b):
    return (a[0] - b[0], a[1] - b[1])


def _cneg_where(mask, x):
    """(-1)^mask * x as a select (mask: bool array, broadcastable)."""
    return (jnp.where(mask, -x[0], x[0]), jnp.where(mask, -x[1], x[1]))


def _make_w_kernel(lattice, mass, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lx, ly, lz, lt = lattice
    x2 = lx // 2
    yx = ly * x2
    nplanes = NC * 2
    shift = _make_shift(x2, interpret)

    def geom(s_idx, p_t):
        """Offset/eta masks on a (Z, Y·X2) plane for target slice s_idx
        (traced or static) and target parity p_t (static)."""
        zz = jax.lax.broadcasted_iota(jnp.int32, (lz, yx), 0)
        yy = jax.lax.broadcasted_iota(jnp.int32, (lz, yx), 1) // x2
        off = (zz + yy + s_idx + p_t) % 2  # packed row offset s(y,z,t)
        m_off = off == 1
        eta = [
            None,  # eta_1 = +1
            m_off,  # eta_2 = (-1)^s
            (off + yy) % 2 == 1,  # eta_3 = (-1)^(s+y)
            (off + yy + zz) % 2 == 1,  # eta_4 = (-1)^(s+y+z)
        ]
        return m_off, eta

    def gather(f_pair, mu, sign, m_off):
        """Packed-layout neighbor access of a source-parity plane pair
        viewed from target sites (eo_pack.gather_plus/minus semantics);
        mu in (0,1,2) only — t neighbors come from the window."""
        if mu == 0:
            if sign > 0:
                return tuple(
                    jnp.where(m_off, shift(p, 0, +1), p) for p in f_pair
                )
            return tuple(jnp.where(m_off, p, shift(p, 0, -1)) for p in f_pair)
        return tuple(shift(p, mu, sign) for p in f_pair)

    def dslash_slice(s_idx, p_t, phi_m, phi_0, phi_p, link_t, link_s, link_s_tm):
        """0.5·sum_mu eta_mu (U fwd − U† bwd) at target slice s_idx.

        phi_m/0/p: (c) -> (re, im) source planes at slices s−1/s/s+1;
        link_t: (mu, a, b) target-parity links at s;
        link_s: (mu, a, b) source-parity links at s;
        link_s_tm: (a, b) source-parity t-links at s−1.
        Returns [(re, im)] * NC.
        """
        m_off, eta = geom(s_idx, p_t)
        acc = [None] * NC

        def add(c, val, mu):
            v = val if eta[mu] is None else _cneg_where(eta[mu], val)
            acc[c] = v if acc[c] is None else _cadd(acc[c], v)

        for mu in range(3):  # spatial
            fwdv = [gather(phi_0(c), mu, +1, m_off) for c in range(NC)]
            bwdv = [gather(phi_0(c), mu, -1, m_off) for c in range(NC)]
            u_b = [
                [gather(link_s(mu, a, b), mu, -1, m_off) for b in range(NC)]
                for a in range(NC)
            ]
            for a in range(NC):
                f = _cmul(link_t(mu, a, 0), fwdv[0])
                f = _cadd(f, _cmul(link_t(mu, a, 1), fwdv[1]))
                f = _cadd(f, _cmul(link_t(mu, a, 2), fwdv[2]))
                b = _cmulj(u_b[0][a], bwdv[0])
                b = _cadd(b, _cmulj(u_b[1][a], bwdv[1]))
                b = _cadd(b, _cmulj(u_b[2][a], bwdv[2]))
                add(a, _csub(f, b), mu)
        # t direction: neighbors are whole slices
        for a in range(NC):
            f = _cmul(link_t(3, a, 0), phi_p(0))
            f = _cadd(f, _cmul(link_t(3, a, 1), phi_p(1)))
            f = _cadd(f, _cmul(link_t(3, a, 2), phi_p(2)))
            b = _cmulj(link_s_tm(0, a), phi_m(0))
            b = _cadd(b, _cmulj(link_s_tm(1, a), phi_m(1)))
            b = _cadd(b, _cmulj(link_s_tm(2, a), phi_m(2)))
            add(a, _csub(f, b), 3)
        return [(0.5 * re, 0.5 * im) for (re, im) in acc]

    def kernel(phi_hbm, u_hbm, out_ref, phi_win, u_win, d1_win, sems):
        i = pl.program_id(0)

        # ---- windows: entry k <-> slice (k-2) mod T, slot k mod 4
        def dma(field, k):
            t = (k - 2) % lt
            slot = k % 4
            hbm, win, row = (
                (phi_hbm, phi_win, 0) if field == 0 else (u_hbm, u_win, 1)
            )
            return pltpu.make_async_copy(hbm.at[t], win.at[slot], sems.at[row, slot])

        # getters out of the windows (slot may be traced)
        def phi_at(slot):
            return lambda c: (phi_win[slot, 2 * c], phi_win[slot, 2 * c + 1])

        def link_at(slot, par):
            # u_win is flattened to (slot, 144, Z, YX): plane index
            # ((par*4 + mu)*9 + a*3 + b)*2 + reim — static per access,
            # keeping the scratch 4-D (Mosaic generates much better code
            # than for a 6-D scratch with a traced leading index).
            def get(mu, a, b):
                p = (((par * DIRS + mu) * NC + a) * NC + b) * 2
                return (u_win[slot, p], u_win[slot, p + 1])

            return get

        def compute_d1(entry):
            """d1[slice s = (entry-1) mod T] -> d1_win slot entry mod 3.

            Entry k of the phi/u windows holds slice (k-2) mod T, so the
            even-source slices s-1, s, s+1 are phi entries entry,
            entry+1, entry+2, and the links at s-1 / s are u entries
            entry / entry+1."""
            s_idx = (entry - 1) % lt
            lk_s = link_at((entry + 1) % 4, 1)  # odd (target) links at s
            lk_e = link_at((entry + 1) % 4, 0)  # even (source) links at s
            lk_e_tm = link_at(entry % 4, 0)  # even t-links at s-1
            vals = dslash_slice(
                s_idx, 1,
                phi_at(entry % 4), phi_at((entry + 1) % 4),
                phi_at((entry + 2) % 4),
                lk_s, lk_e, lambda a, b: lk_e_tm(3, a, b),
            )
            slot = entry % 3
            for c in range(NC):
                d1_win[slot, 2 * c] = vals[c][0]
                d1_win[slot, 2 * c + 1] = vals[c][1]

        @pl.when(i == 0)
        def _():
            # warm-up: fill d1[T-1] and d1[0] from the wraparound slices.
            # phi/u entries 0..3 = slices T-2, T-1, 0, 1.
            for k in (0, 1, 2, 3):
                dma(0, k).start()
                dma(1, k).start()
            for k in (0, 1, 2):
                dma(0, k).wait()
                dma(1, k).wait()
            compute_d1(0)  # slice T-1 (phi entries 0..2, u entries 0..1)
            dma(0, 4).start()  # slot 0 free once compute_d1(0) consumed it
            dma(0, 3).wait()
            compute_d1(1)  # slice 0 (phi entries 1..3, u entries 1..2)
            # u entry 3 stays un-waited here: the steady state at i=0
            # waits it (dma(1, i+3)); phi entry 4 likewise (dma(0, i+4)).

        # steady state: wait phi entry i+4 (slice i+2), u entry i+3 (slice i+1)
        dma(0, i + 4).wait()
        dma(1, i + 3).wait()

        @pl.when(i < lt - 1)
        def _():
            dma(0, i + 5).start()
            dma(1, i + 4).start()

        compute_d1(i + 2)  # d1 at slice i+1

        # d2 at even targets, slice i: d1 entries i..i+2 = slices i-1,i,i+1
        def d1_at(entry):
            slot = entry % 3
            return lambda c: (d1_win[slot, 2 * c], d1_win[slot, 2 * c + 1])

        lk_e = link_at((i + 2) % 4, 0)  # even (target) links at slice i
        lk_o = link_at((i + 2) % 4, 1)  # odd (source) links at slice i
        lk_o_tm = link_at((i + 1) % 4, 1)  # odd t-links at slice i-1
        d2 = dslash_slice(
            i, 0,
            d1_at(i), d1_at(i + 1), d1_at(i + 2),
            lk_e, lk_o, lambda a, b: lk_o_tm(3, a, b),
        )
        m2 = jnp.asarray(mass * mass, dtype=out_ref.dtype)
        phi0 = phi_at((i + 2) % 4)
        for c in range(NC):
            re, im = phi0(c)
            out_ref[0, 2 * c] = m2 * re - d2[c][0]
            out_ref[0, 2 * c + 1] = m2 * im - d2[c][1]

    return kernel


# ----------------------------------------------------------- layout transforms


def phi_to_planes(phi):
    """Packed spinor (X2, Y, Z, T, NC) complex -> [T, 6, Z, Y*X2] float."""
    x2, ly, lz, lt = phi.shape[:4]
    f = jnp.transpose(phi, (3, 4, 2, 1, 0))  # [T, c, Z, Y, X2]
    f = jnp.stack([f.real, f.imag], axis=2)  # [T, c, 2, Z, Y, X2]
    return f.reshape(lt, NC * 2, lz, ly * x2)


def planes_to_phi(f, packed_shape, dtype=jnp.complex64):
    x2, ly, lz, lt = packed_shape[:4]
    g = f.reshape(lt, NC, 2, lz, ly, x2)
    cplx = g[:, :, 0] + 1j * g[:, :, 1]  # [T, c, Z, Y, X2]
    return jnp.transpose(cplx, (4, 3, 2, 0, 1)).astype(dtype)


def links_to_planes(u_eo):
    """(u_e, u_o), each (4, X2, Y, Z, T, NC, NC) complex
    -> [T, 144, Z, Y*X2] float (plane = ((par*4+mu)*9 + a*3+b)*2 + reim)."""
    g = jnp.stack(u_eo, axis=0)  # [2, mu, X2, Y, Z, T, a, b]
    _, _, x2, ly, lz, lt = g.shape[:6]
    g = jnp.transpose(g, (5, 0, 1, 6, 7, 4, 3, 2))  # [T,2,mu,a,b,Z,Y,X2]
    g = jnp.stack([g.real, g.imag], axis=5)  # [T,2,mu,a,b,2,Z,Y,X2]
    return g.reshape(lt, 2 * DIRS * NC * NC * 2, lz, ly * x2)


# ----------------------------------------------------------------- public API


@partial(jax.jit, static_argnames=("lattice", "mass", "interpret"))
def w_planes_window(phi_k, u_k, lattice, mass, interpret=False):
    """W phi = (m² − D_eo D_oe) phi on kernel-layout packed-even fields."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lx, ly, lz, lt = lattice
    if lt < 2:
        raise ValueError("window kernel needs T >= 2")
    x2, yx = lx // 2, ly * (lx // 2)
    nplanes = NC * 2
    kernel = _make_w_kernel(lattice, float(mass), interpret)
    return pl.pallas_call(
        kernel,
        grid=(lt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, nplanes, lz, yx), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(phi_k.shape, phi_k.dtype),
        scratch_shapes=[
            pltpu.VMEM((4, nplanes, lz, yx), phi_k.dtype),
            pltpu.VMEM((4, 2 * DIRS * NC * NC * 2, lz, yx), u_k.dtype),
            pltpu.VMEM((3, nplanes, lz, yx), phi_k.dtype),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
        interpret=interpret,
    )(phi_k, u_k)


def apply_w_pallas(dirac, u, phi_packed, interpret=False):
    """Convenience wrapper from framework objects: StaggeredDirac +
    full links (boundary phases NOT yet applied) + packed even spinor."""
    from latticeqcd_tpu.ops.dirac.wilson import apply_boundary_phases

    up = apply_boundary_phases(u, dirac.bc)
    u_eo = dirac.packed_links(up)
    fdtype = jnp.float64 if phi_packed.dtype == jnp.complex128 else jnp.float32
    phi_k = phi_to_planes(phi_packed).astype(fdtype)
    u_k = links_to_planes(u_eo).astype(fdtype)
    out_k = w_planes_window(phi_k, u_k, tuple(dirac.lattice), float(dirac.mass),
                            interpret=interpret)
    return planes_to_phi(out_k, phi_packed.shape, dtype=phi_packed.dtype)
