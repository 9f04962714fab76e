"""Hybrid Monte Carlo updater (quenched and dynamical).

TPU-native counterpart of the reference's StandardHMC
(/root/reference/src/updates/standardHMC.jl:41-91): save old links,
refresh momenta (and pseudofermions), H_old = tr(H^2) + S_g (+ |xi|^2),
run MD, H_new likewise (fermion part via evaluate_FermiAction on the
evolved links), Metropolis accept exp(Sold-Snew) >= uniform with
restore on reject. The entire trajectory — momentum refresh, the MD
loop, both action evaluations, and the accept decision — is ONE
jitted SPMD program; on a sharded mesh the action sums and the
accept decision lower to psum + replicated select (the reference's
rank-replicated rand(), SURVEY.md 2.5).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from latticeqcd_tpu.md import integrators
from latticeqcd_tpu.ops import gauge_action as ga
from latticeqcd_tpu.ops import mdpair, sun


@dataclass(frozen=True)
class HMC:
    """Static configuration of an HMC updater.

    fermi_action: object implementing the FermiAction protocol
    (sample_pseudofermion, action, force) or None for quenched runs.
    smearing: optional CovNet (smearing/stout.py) applied to the
    links wherever the fermion determinant sees them
    (standardMD.jl:89-97, 192-227 semantics, via autodiff instead of
    hand-written back_prop).
    """

    action: ga.GaugeAction
    dtau: float
    md_steps: int
    scheme: str = "QPQ"
    sexton_weingarten: bool = False
    nsw: int = 2
    # Omelyan 2MN coefficient; the error-optimal value is system- and
    # coupling-dependent (md/integrators.OMELYAN_2MN_LAMBDA is the
    # minimum-norm literature default, hep-lat/0505020)
    omelyan_lambda: float = integrators.OMELYAN_2MN_LAMBDA
    fermi_action: Optional[Any] = None
    smearing: Optional[Any] = None
    staged: Optional[bool] = None  # None = auto (staged off-CPU dynamical)
    # "mixed": run the integrator STATE (U, H) and its updates in f64
    # real-pair arithmetic (ops/mdpair.py) while forces/solves/action
    # evaluations and the links handed to the next trajectory stay in
    # the production complex dtype. Mitigates the measured c64
    # integrator-rounding dH offset at >= 8^4 (PERF.md "complex64
    # sampling-bias evidence"; VERDICT r4 next #3). "auto"/"plain" =
    # plain arithmetic (current default; mixed costs ~nothing on
    # dynamical trajectories but is opt-in until TPU-measured).
    # Requires jax_enable_x64.
    md_precision: str = "auto"

    @property
    def quench(self) -> bool:
        return self.fermi_action is None

    @property
    def _mixed(self) -> bool:
        return self.md_precision == "mixed"

    def _use_staged(self) -> bool:
        """Dynamical trajectories on the TPU backend run as a sequence
        of small jitted programs instead of one fused program: the
        axon remote compiler stalls/fails on large monolithic graphs
        with many solver while_loops, while each phase compiles in
        seconds (and solvers may not nest in fori_loop there)."""
        if self.staged is not None:
            return self.staged
        if self.quench:
            return False
        return jax.default_backend() not in ("cpu",)

    # ---------------------------------------------------------------- step
    def _validate(self) -> None:
        """Validate identically on BOTH paths (fused and staged) so a
        config never behaves differently on CPU (fused) vs TPU
        (staged); called by step() and step_batched()."""
        if self.md_steps < 1:
            raise ValueError(f"MDsteps must be >= 1, got {self.md_steps}")
        if self.sexton_weingarten and self.quench:
            raise ValueError(
                "The quench update does not need the SextonWeingarten method"
            )
        if self.sexton_weingarten and self.nsw % 2 != 0:
            # the reference asserts this too (standardMD.jl:56); without
            # it the staged path would silently integrate 2*(nsw//2)
            # gauge substeps of size dtau/nsw — i.e. a short trajectory
            raise ValueError(f"Nsw must be even, got {self.nsw}")
        if self.md_precision not in ("auto", "plain", "mixed"):
            raise ValueError(
                f"md_precision must be auto/plain/mixed, got {self.md_precision!r}"
            )
        if self._mixed:
            mdpair.require_x64()

    def step(self, u: jnp.ndarray, key: jnp.ndarray):
        """One HMC trajectory: (U, key) -> (U', key', stats)."""
        self._validate()
        if self._use_staged():
            return self._step_staged(u, key)
        return self._step_fused(u, key)

    # ------------------------------------------------- staged (multi-program)
    @partial(jax.jit, static_argnums=(0, 3))
    def _u_update_jit(self, u, h, eps):
        return integrators.update_links(u, h, eps)

    @partial(jax.jit, static_argnums=0)
    def _gauge_kick_jit(self, u, h, eps):
        return h + eps * ga.force(self.action, mdpair.as_complex(u))

    # Fused gauge-only segments: everything between two fermion kicks
    # is pure gauge algebra (no solver while_loops), so it compiles
    # fine as one program even on the remote TPU — and each program
    # dispatch to a tunneled TPU costs real latency, which dominates
    # small-lattice trajectories (BASELINE.md headline: 4^4).
    @partial(jax.jit, static_argnums=(0, 3, 4))
    def _uk_update_jit(self, u, h, eps_u, eps_h):
        """u <- exp(i eps_u h) u, then the gauge kick h += eps_h F_g(u):
        one program instead of two (adjacent half-steps merged by the
        caller — QPQ merges U half-steps into eps_u = dtau, PQP merges
        P half-kicks into eps_h = dtau).

        All staged MD primitives are polymorphic over the state
        representation (plain complex arrays, or mdpair.PairField f64
        pairs for md_precision='mixed'): integrators.update_links
        dispatches on the type, forces always see a complex view."""
        u = integrators.update_links(u, h, eps_u)
        return u, h + eps_h * ga.force(self.action, mdpair.as_complex(u))

    @partial(jax.jit, static_argnums=(0, 3))
    def _gauge_segment_jit(self, u, h, n_sub):
        """Sexton-Weingarten gauge sub-segment: n_sub unrolled
        iterations of [u(1/2), kick, u(1/2)] at dtau/nsw — one program
        for the whole segment (standardMD.jl:144-167 inner loop)."""
        eps = self.dtau / self.nsw
        for _ in range(n_sub):
            u = integrators.update_links(u, h, 0.5 * eps)
            h = h + eps * ga.force(self.action, mdpair.as_complex(u))
            u = integrators.update_links(u, h, 0.5 * eps)
        return u, h

    @partial(jax.jit, static_argnums=0)
    def _begin_jit(self, u, key):
        """Momentum refresh + H_old gauge/kinetic terms: one program."""
        h = sun.random_hermitian_momentum(key, u.shape[:-2], self.action.nc, dtype=u.dtype)
        return h, sun.kinetic_energy(h), ga.action_value(self.action, u)

    @partial(jax.jit, static_argnums=0)
    def _begin_mixed_jit(self, u, key):
        """Mixed-precision begin: draw H in the production dtype (so
        the sampled trajectory start is IDENTICAL to the plain path),
        lift (U, H) to f64 pairs, and take the kinetic term in f64 —
        the same arithmetic _finish_jit uses for KE_new, so the KE
        difference carries no c64 summation noise."""
        h = sun.random_hermitian_momentum(key, u.shape[:-2], self.action.nc, dtype=u.dtype)
        hp = mdpair.lift(h)
        return mdpair.lift(u), hp, mdpair.kinetic_energy(hp), ga.action_value(self.action, u)

    @partial(jax.jit, static_argnums=0)
    def _lower_jit(self, p):
        """PairField -> complex view as one program (the staged path
        lowers between programs for fermion force/action evaluation)."""
        return mdpair.lower(p)

    @partial(jax.jit, static_argnums=0)
    def _finish_jit(self, u0, u, h, s_old, s_f_new, k_acc):
        """H_new gauge/kinetic terms + on-device Metropolis select +
        plaquette of the outgoing links: one program (the accept
        decision never round-trips to the host mid-trajectory)."""
        if isinstance(h, mdpair.PairField):
            sp_new = mdpair.kinetic_energy(h)  # f64, matches _begin_mixed_jit
        else:
            sp_new = sun.kinetic_energy(h)
        u = mdpair.as_complex(u)
        sg_new = ga.action_value(self.action, u)
        s_new = sp_new + sg_new + s_f_new
        d_h = s_new - s_old
        rdtype = jnp.float64 if d_h.dtype == jnp.float64 or u.dtype == jnp.complex128 \
            else jnp.float32
        d_h = d_h.astype(rdtype)
        accept = jnp.exp(-d_h) >= jax.random.uniform(k_acc, dtype=rdtype)
        u_out = jnp.where(accept, u, u0)
        return u_out, accept, d_h, sp_new, sg_new, ga.mean_plaquette(u_out)

    def _staged_md_core(self, u, h, uk_update, u_update, gauge_kick,
                        fermion_kick):
        """Non-SW staged MD orchestration (QPQ/PQP/Omelyan) over
        abstract primitives — shared by the single-chain staged path
        (plain jitted programs) and step_batched's staged variant
        (vmapped programs), so the merged-half-step program structure
        cannot drift between them."""
        dtau = self.dtau
        if self.scheme == "QPQ":
            # QPQ with adjacent half-steps merged across MD steps:
            # [u(1/2);kick_g] CG  ([u(1);kick_g] CG)^(N-1)  u(1/2)
            # — 2 programs per step instead of 4 (dispatch latency
            # dominates at small volume on the remote TPU)
            u, h = uk_update(u, h, 0.5 * dtau, dtau)
            if not self.quench:
                h = fermion_kick(u, h, dtau)
            for _ in range(self.md_steps - 1):
                u, h = uk_update(u, h, dtau, dtau)
                if not self.quench:
                    h = fermion_kick(u, h, dtau)
            u = u_update(u, h, 0.5 * dtau)
        elif self.scheme == "PQP":
            # PQP with adjacent half-kicks merged across MD steps:
            # kick(1/2) ([u(1);kick(1)] CG)^(N-1) [u(1);kick(1/2)] CG
            # (runMD_PQP!, standardMD.jl:170-190)
            h = gauge_kick(u, h, 0.5 * dtau)
            if not self.quench:
                h = fermion_kick(u, h, 0.5 * dtau)
            for i in range(self.md_steps):
                eps_h = dtau if i < self.md_steps - 1 else 0.5 * dtau
                u, h = uk_update(u, h, dtau, eps_h)
                if not self.quench:
                    h = fermion_kick(u, h, eps_h)
        else:
            # Omelyan 2MN (integrators.omelyan_pqp), adjacent lam-kicks
            # merged across MD steps:
            # kick(lam) ([u(1/2);kick(1-2lam)] CG [u(1/2);kick(c)] CG)^N
            # with c = 2 lam except lam on the final step
            lam = self.omelyan_lambda
            h = gauge_kick(u, h, lam * dtau)
            if not self.quench:
                h = fermion_kick(u, h, lam * dtau)
            for i in range(self.md_steps):
                u, h = uk_update(u, h, 0.5 * dtau, (1.0 - 2.0 * lam) * dtau)
                if not self.quench:
                    h = fermion_kick(u, h, (1.0 - 2.0 * lam) * dtau)
                c = lam if i == self.md_steps - 1 else 2.0 * lam
                u, h = uk_update(u, h, 0.5 * dtau, c * dtau)
                if not self.quench:
                    h = fermion_kick(u, h, c * dtau)
        return u, h

    def _step_staged(self, u, key):
        u0 = u  # restored on reject (standardHMC.jl:45,85)
        key, k_mom, k_ferm, k_acc = jax.random.split(key, 4)
        u_md = u
        if self._mixed:
            u_md, h, sp_old, sg_old = self._begin_mixed_jit(u, k_mom)
        else:
            h, sp_old, sg_old = self._begin_jit(u, k_mom)

        fa = self.fermi_action
        smear_fn = self.smearing.smear if self.smearing is not None else None
        s_f_old = 0.0
        eta = None
        if not self.quench:
            us = self._smear(u)
            s_f_old, eta = fa.sample_pseudofermion(us, k_ferm)

        s_old = sp_old + sg_old + s_f_old
        u = u_md  # mixed: MD runs on the f64 pair state from here on

        dtau = self.dtau
        if self.scheme not in ("QPQ", "PQP", "Omelyan"):
            raise ValueError(f"unknown MD scheme {self.scheme!r}")
        if self.scheme == "PQP" and self.sexton_weingarten and not self.quench:
            # mirror integrators.run_md / the reference factory
            raise ValueError("PQP update with SextonWeingarten is not supported")
        # chronological inverter: warm-start each force CG from the
        # previous MD step's solution when the action supports it
        force_g = getattr(fa, "force_with_guess", None) if not self.quench else None
        x_guess = None

        # Hasenbusch timescale split (staged): outer kicks carry the
        # light ratio force; the heavy term rides the fine gauge scale
        split = (
            self.sexton_weingarten
            and not self.quench
            and hasattr(fa, "force_heavy")
        )

        # split-path chronological guesses (light on the coarse scale,
        # heavy on the fine scale — each warm-starts its own CG chain)
        xg_light = None
        xg_heavy = None

        def fermion_kick(u, h, eps):
            nonlocal x_guess, xg_light
            # forces always evaluate on a complex view; in mixed mode
            # the pair state is lowered as one small program per kick
            uc = self._lower_jit(u) if self._mixed else u
            if split:
                if hasattr(fa, "force_light_with_guess"):
                    f, xg_light = fa.force_light_with_guess(
                        uc, eta, xg_light, smear_fn=smear_fn
                    )
                else:
                    f = fa.force_light(uc, eta, smear_fn=smear_fn)
            elif force_g is not None:
                # x_guess None on the first call -> a second jit variant
                f, x_guess = force_g(uc, eta, x_guess, smear_fn=smear_fn)
            else:
                f = fa.force(uc, eta, smear_fn=smear_fn)
            return h + eps * f

        def gauge_segment(u, h, n_sub):
            nonlocal xg_heavy
            if not split:
                return self._gauge_segment_jit(u, h, n_sub)
            eps = self.dtau / self.nsw
            for _ in range(n_sub):
                u, h = self._uk_update_jit(u, h, 0.5 * eps, eps)
                uc = self._lower_jit(u) if self._mixed else u
                if hasattr(fa, "force_heavy_with_guess"):
                    f, xg_heavy = fa.force_heavy_with_guess(
                        uc, eta, xg_heavy, smear_fn=smear_fn
                    )
                else:
                    f = fa.force_heavy(uc, eta, smear_fn=smear_fn)
                h = h + eps * f
                u = self._u_update_jit(u, h, 0.5 * eps)
            return u, h

        if self.sexton_weingarten and not self.quench and self.scheme == "Omelyan":
            # multi-timescale Omelyan 2MN (integrators.omelyan_sw):
            # minimum-norm outer fermion kicks around the nested gauge
            # sub-segments, adjacent lam-kicks merged across steps
            lam = self.omelyan_lambda
            h = fermion_kick(u, h, lam * dtau)
            for i in range(self.md_steps):
                u, h = gauge_segment(u, h, self.nsw // 2)
                h = fermion_kick(u, h, (1.0 - 2.0 * lam) * dtau)
                u, h = gauge_segment(u, h, self.nsw // 2)
                c = lam if i == self.md_steps - 1 else 2.0 * lam
                h = fermion_kick(u, h, c * dtau)
        elif self.sexton_weingarten and not self.quench:
            for _ in range(self.md_steps):
                u, h = gauge_segment(u, h, self.nsw // 2)
                h = fermion_kick(u, h, dtau)
                u, h = gauge_segment(u, h, self.nsw // 2)
        else:
            u, h = self._staged_md_core(
                u, h, self._uk_update_jit, self._u_update_jit,
                self._gauge_kick_jit, fermion_kick,
            )

        s_f_new = 0.0
        if not self.quench:
            uc = self._lower_jit(u) if self._mixed else u
            s_f_new = jnp.real(fa.action(self._smear(uc), eta))

        rdtype = (jnp.float64 if self._mixed or u0.dtype == jnp.complex128
                  else jnp.float32)
        u_out, accept, d_h, sp_new, sg_new, plaq = self._finish_jit(
            u0, u, h, jnp.asarray(s_old, rdtype), jnp.asarray(s_f_new, rdtype), k_acc
        )
        stats = {
            "accepted": bool(accept),
            "dH": d_h,
            "sg_old": sg_old,
            "sg_new": sg_new,
            "sp_old": sp_old,
            "sp_new": sp_new,
            "sf_old": s_f_old,
            "sf_new": s_f_new,
            "plaq": plaq,
        }
        return u_out, key, stats

    # -------------------------------------------------- fused (one program)
    @partial(jax.jit, static_argnums=0)
    def _step_fused(self, u: jnp.ndarray, key: jnp.ndarray):
        """One HMC trajectory as a single jitted program.

        stats: dict with accepted (bool), dH, sg_old/new, plaq.
        """
        nc = self.action.nc
        key, k_mom, k_ferm, k_acc = jax.random.split(key, 4)

        h = sun.random_hermitian_momentum(k_mom, u.shape[:-2], nc, dtype=u.dtype)

        force_fermion = None
        force_fine = None
        s_f_old = 0.0
        eta = None
        if not self.quench:
            us = self._smear(u)
            s_f_old, eta = self.fermi_action.sample_pseudofermion(us, k_ferm)
            smear_fn = self.smearing.smear if self.smearing is not None else None
            if self.sexton_weingarten and hasattr(self.fermi_action, "force_heavy"):
                # Hasenbusch timescale split: heavy (cheap) term on the
                # fine gauge scale, light (ratio) term on the coarse
                # one; both chronologically warm-started through the
                # unrolled MD graph (each scale threads its own chain)
                g_light = {"x": None}
                g_heavy = {"x": None}

                def force_fermion(uu):
                    f, g_light["x"] = self.fermi_action.force_light_with_guess(
                        uu, eta, g_light["x"], smear_fn=smear_fn
                    )
                    return f

                def force_fine(uu):
                    f, g_heavy["x"] = self.fermi_action.force_heavy_with_guess(
                        uu, eta, g_heavy["x"], smear_fn=smear_fn
                    )
                    return f
            elif hasattr(self.fermi_action, "force_with_guess"):
                # Chronological inverter in the fused path too: the MD
                # loop unrolls whenever a fermion force exists (_loop),
                # so a stateful closure threads the previous step's CG
                # solution through the traced graph as the next warm
                # start — same scheme the staged path uses. Converged to
                # eps_cg, the force (and so reversibility/exactness) is
                # guess-independent at that tolerance.
                guess = {"x": None}

                def force_fermion(uu):
                    f, x = self.fermi_action.force_with_guess(
                        uu, eta, guess["x"], smear_fn=smear_fn
                    )
                    guess["x"] = x
                    return f
            else:
                force_fermion = lambda uu: self.fermi_action.force(uu, eta, smear_fn=smear_fn)

        # every force evaluates on a complex view of the MD state; in
        # mixed mode the state itself is an f64 PairField and as_complex
        # lowers it (fused into the same program by XLA)
        force_gauge = lambda uu: ga.force(self.action, mdpair.as_complex(uu))
        if force_fermion is not None:
            _ff = force_fermion
            force_fermion = lambda uu: _ff(mdpair.as_complex(uu))
        if force_fine is not None:
            _ffi = force_fine
            force_fine = lambda uu: _ffi(mdpair.as_complex(uu))

        if self._mixed:
            u_md, h_md = mdpair.lift(u), mdpair.lift(h)
            sp_old = mdpair.kinetic_energy(h_md)
        else:
            u_md, h_md = u, h
            sp_old = sun.kinetic_energy(h)
        sg_old = ga.action_value(self.action, u)
        s_old = sp_old + sg_old + s_f_old

        u_new, h_new = integrators.run_md(
            u_md,
            h_md,
            force_gauge,
            self.dtau,
            self.md_steps,
            force_fermion=force_fermion,
            scheme=self.scheme,
            sexton_weingarten=self.sexton_weingarten,
            nsw=self.nsw,
            omelyan_lambda=self.omelyan_lambda,
            force_fine=force_fine,
        )

        if self._mixed:
            sp_new = mdpair.kinetic_energy(h_new)
            u_new = mdpair.lower(u_new)
        else:
            sp_new = sun.kinetic_energy(h_new)
        sg_new = ga.action_value(self.action, u_new)
        s_f_new = 0.0
        if not self.quench:
            s_f_new = jnp.real(self.fermi_action.action(self._smear(u_new), eta))
        s_new = sp_new + sg_new + s_f_new

        d_h = s_new - s_old
        accept = jnp.exp(-d_h) >= jax.random.uniform(k_acc, dtype=sg_old.dtype)
        u_out = jnp.where(accept, u_new, u)

        stats = {
            "accepted": accept,
            "dH": d_h,
            "sg_old": sg_old,
            "sg_new": sg_new,
            "sp_old": sp_old,
            "sp_new": sp_new,
            "sf_old": s_f_old,
            "sf_new": s_f_new,
            "plaq": ga.mean_plaquette(u_out),
        }
        return u_out, key, stats

    # ------------------------------------------- batched independent chains
    @partial(jax.jit, static_argnums=0)
    def _step_batched_jit(self, us, keys):
        return jax.vmap(self._step_fused)(us, keys)

    def step_batched(self, us: jnp.ndarray, keys: jnp.ndarray):
        """N independent Markov chains per device: us[n, 4, X, Y, Z, T,
        NC, NC], keys[n, 2] -> (us', keys', stats with a leading chain
        axis).

        A TPU-native capability with no reference counterpart: at small
        volume (the reference's 4^4 headline benchmark) a single
        trajectory cannot fill the chip and — on a remote backend —
        pays per-program dispatch latency, so batching chains multiplies
        ensemble throughput (configs/hour) at nearly constant
        wall-clock per step. Chains are statistically independent given
        independent keys; each carries its own momenta, pseudofermions
        and Metropolis decision.

        Path selection mirrors step(): one fused vmapped program on
        CPU / quenched, but the STAGED multi-program variant for
        dynamical chains off-CPU (VERDICT r3 next #9) — the axon
        remote compiler stalls on large fused dynamical graphs, and a
        vmapped one is strictly larger; the staged variant vmaps each
        small program instead (the batched CG while_loops still sit at
        program top level, which the axon runtime supports)."""
        self._validate()
        if us.ndim != 8:
            raise ValueError(
                f"us must be [nchain, 4, X, Y, Z, T, NC, NC], got shape {us.shape}"
            )
        if self._use_staged():
            return self._step_staged_batched(us, keys)
        return self._step_batched_jit(us, keys)

    # Batched-staged primitives: each is the vmap of the corresponding
    # single-chain program, jitted as its own small program (jit-of-jit
    # inlines, so the compile unit stays one MD segment x n chains).
    @partial(jax.jit, static_argnums=(0, 3, 4))
    def _uk_update_b_jit(self, us, hs, eps_u, eps_h):
        return jax.vmap(lambda u, h: self._uk_update_jit(u, h, eps_u, eps_h))(us, hs)

    @partial(jax.jit, static_argnums=(0, 3))
    def _u_update_b_jit(self, us, hs, eps):
        return jax.vmap(lambda u, h: self._u_update_jit(u, h, eps))(us, hs)

    @partial(jax.jit, static_argnums=0)
    def _gauge_kick_b_jit(self, us, hs, eps):
        return jax.vmap(lambda u, h: self._gauge_kick_jit(u, h, eps))(us, hs)

    @partial(jax.jit, static_argnums=0)
    def _begin_b_jit(self, us, keys):
        return jax.vmap(self._begin_jit)(us, keys)

    @partial(jax.jit, static_argnums=0)
    def _begin_mixed_b_jit(self, us, keys):
        return jax.vmap(self._begin_mixed_jit)(us, keys)

    @partial(jax.jit, static_argnums=0)
    def _finish_b_jit(self, u0s, us, hs, s_olds, s_f_news, k_accs):
        return jax.vmap(self._finish_jit)(u0s, us, hs, s_olds, s_f_news, k_accs)

    @partial(jax.jit, static_argnums=0)
    def _sample_pf_b_jit(self, us, keys):
        return jax.vmap(
            lambda u, k: self.fermi_action.sample_pseudofermion(self._smear(u), k)
        )(us, keys)

    @partial(jax.jit, static_argnums=0)
    def _faction_b_jit(self, us, etas):
        return jax.vmap(
            lambda u, e: jnp.real(
                self.fermi_action.action(self._smear(mdpair.as_complex(u)), e)
            )
        )(us, etas)

    @partial(jax.jit, static_argnums=(0, 4))
    def _fkick_cold_b_jit(self, us, hs, etas, eps):
        """First fermion kick (no chronological guess yet). Returns
        (hs', per-chain CG solutions) when the action supports warm
        starts, else (hs', None)."""
        fa = self.fermi_action
        smear_fn = self.smearing.smear if self.smearing is not None else None
        if hasattr(fa, "force_with_guess"):
            def one(u, h, e):
                f, x = fa.force_with_guess(
                    mdpair.as_complex(u), e, None, smear_fn=smear_fn)
                return h + eps * f, x

            return jax.vmap(one)(us, hs, etas)

        def one(u, h, e):
            return h + eps * fa.force(mdpair.as_complex(u), e, smear_fn=smear_fn)

        return jax.vmap(one)(us, hs, etas), None

    @partial(jax.jit, static_argnums=(0, 5))
    def _fkick_warm_b_jit(self, us, hs, etas, xgs, eps):
        fa = self.fermi_action
        smear_fn = self.smearing.smear if self.smearing is not None else None

        def one(u, h, e, xg):
            f, x = fa.force_with_guess(
                mdpair.as_complex(u), e, xg, smear_fn=smear_fn)
            return h + eps * f, x

        return jax.vmap(one)(us, hs, etas, xgs)

    def _step_staged_batched(self, us, keys):
        """Staged multi-program trajectory for n independent chains:
        the same merged-program structure as _step_staged (shared
        _staged_md_core), with every program vmapped over the chain
        axis and per-chain chronological warm starts threaded between
        programs on the host."""
        if self.md_steps < 1:
            raise ValueError(f"MDsteps must be >= 1, got {self.md_steps}")
        if self.sexton_weingarten:
            raise ValueError(
                "step_batched: SextonWeingarten/Hasenbusch timescale "
                "splits are single-chain-only (use step per chain)"
            )
        if self.scheme not in ("QPQ", "PQP", "Omelyan"):
            raise ValueError(f"unknown MD scheme {self.scheme!r}")
        u0s = us
        ks = jax.vmap(lambda k: jax.random.split(k, 4))(keys)
        keys_out, k_mom, k_ferm, k_acc = ks[:, 0], ks[:, 1], ks[:, 2], ks[:, 3]
        us_md = us
        if self._mixed:
            us_md, hs, sp_old, sg_old = self._begin_mixed_b_jit(us, k_mom)
        else:
            hs, sp_old, sg_old = self._begin_b_jit(us, k_mom)
        n = us.shape[0]
        rdtype = (jnp.float64 if self._mixed or us.dtype == jnp.complex128
                  else jnp.float32)
        s_f_old = jnp.zeros((n,), dtype=rdtype)
        etas = None
        if not self.quench:
            s_f_old, etas = self._sample_pf_b_jit(us, k_ferm)
        s_old = sp_old + sg_old + s_f_old
        us = us_md  # mixed: MD runs on the f64 pair state

        guess = {"x": None, "warm": False}

        def fermion_kick(u, h, eps):
            if not guess["warm"]:
                h2, x = self._fkick_cold_b_jit(u, h, etas, eps)
                guess["x"], guess["warm"] = x, x is not None
                return h2
            h2, guess["x"] = self._fkick_warm_b_jit(u, h, etas, guess["x"], eps)
            return h2

        u, h = self._staged_md_core(
            us, hs, self._uk_update_b_jit, self._u_update_b_jit,
            self._gauge_kick_b_jit, fermion_kick,
        )

        s_f_new = jnp.zeros((n,), dtype=rdtype)
        if not self.quench:
            s_f_new = self._faction_b_jit(u, etas)
        u_out, accept, d_h, sp_new, sg_new, plaq = self._finish_b_jit(
            u0s, u, h, s_old.astype(rdtype), s_f_new.astype(rdtype), k_acc
        )
        stats = {
            "accepted": accept,
            "dH": d_h,
            "sg_old": sg_old,
            "sg_new": sg_new,
            "sp_old": sp_old,
            "sp_new": sp_new,
            "sf_old": s_f_old,
            "sf_new": s_f_new,
            "plaq": plaq,
        }
        return u_out, keys_out, stats

    # ------------------------------------------------------------- helpers
    def _smear(self, u):
        if self.smearing is None:
            return u
        return self.smearing.smear(u)
