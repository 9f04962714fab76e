"""Krylov solvers under jit: CG, BiCGStab, multi-shift CG.

Counterpart of LatticeDiracOperators.jl's solve_DinvX! machinery
(SURVEY.md 2.4.2; eps_CG / MaxCGstep plumbed at universe.jl:132-134).
Convergence-dependent trip counts become lax.while_loop with the
residual norm in the carry (SURVEY.md 7.4 "Krylov solvers under
jit"); on a sharded mesh every inner product is a global psum —
exactly the reference's MPI allreduce points.

Stopping criterion: |r|^2 < eps * max(|b|^2, 1) — eps plays the role
of the reference's eps_CG (default 1e-19, parameter_structs.jl:294),
clamped per dtype to an attainable target (see _effective_eps) so a
f64-tuned TOML doesn't make every complex64 solve spin to maxiter.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


def _vdot(a, b):
    """sum(conj(a)*b) WITHOUT jnp.vdot: vdot ravels its operands, and
    reshaping a sharded lattice field to 1-D makes the GSPMD partitioner
    all-gather the FULL field on every device each CG iteration (seen in
    the round-3 HLO audit, tests/test_collective_audit.py). The
    elementwise form keeps the product sharded and lowers to partial
    sums + a scalar all-reduce."""
    return jnp.sum(jnp.conj(a) * b)


def _safe_div(a, b):
    """a/b with 0 where b == 0 (Krylov breakdown guard: a vanishing
    denominator here always means the residual is already ~0, so a zero
    step is the correct continuation instead of NaN)."""
    bz = b == 0
    return jnp.where(bz, jnp.zeros_like(a), a / jnp.where(bz, jnp.ones_like(b), b))


def _effective_eps(eps: float, dtype) -> float:
    """Clamp the relative |r|^2/|b|^2 target to what the dtype can reach.

    The reference's default eps_CG = 1e-19 (parameter_structs.jl:294)
    presumes f64; in complex64 (the TPU path, CLAUDE.md) the attainable
    relative residual-squared floors out around (few x 1e-7)^2, so an
    unclamped 1e-19 makes every solve silently spin to maxiter on
    stagnated iterations."""
    if jnp.dtype(dtype) in (jnp.dtype(jnp.complex64), jnp.dtype(jnp.float32)):
        return max(float(eps), 2.5e-13)
    return float(eps)


# Verified-exit restarts for reduced precision: in complex64/float32
# the recursively updated CG residual drifts from the true b - A x,
# so the loop can report convergence (or stagnate) while the TRUE
# relative |r|^2 sits orders of magnitude higher. After the loop we
# recompute the true residual and, if it misses the target, restart
# the recursion from the current iterate (fresh p = r_true). Measured
# on the staggered normal operator at mass 0.1 (c64): plain recursion
# floors at ~3e-10 relative |r_true|^2; restarting reaches ~1e-11 on
# both 4^3x8 and 8^4 (2026-08-21). Restarts are UNROLLED (no nested
# while_loop: the axon TPU rejects nested lax loops at runtime,
# CLAUDE.md). In f64 no restart runs and the returned x is
# bit-identical to the plain recursion's.
#
# A restart is only ENTERED when the true residual (a) exceeds the
# *attainable* verification target (_VERIFY_FLOOR — the recursion
# target, 2.5e-13, is below the ~1e-11 measured c64 floor, so gating
# on it would spin every solve through both restarts even when the
# first exit already sits at the floor — ADVICE r3 medium) and (b)
# still improved over the previous verification (a stagnated true
# residual means the floor is reached and more restarts only burn
# mat-vecs). Once entered, the restart loop still drives the
# RECURSION estimate to the aggressive eps target — that is what
# pushes the true floor from ~3e-10 down to ~1e-11.
_N_RESTARTS = {
    jnp.dtype(jnp.complex64): 2,
    jnp.dtype(jnp.float32): 2,
}

# Attainable relative TRUE |r|^2 verification target for reduced
# precision (measured floor ~1e-11 with restarts; 3e-11 adds margin).
_VERIFY_FLOOR = 3e-11


def cg(apply_a: Callable, b: jnp.ndarray, x0=None, eps: float = 1e-19, maxiter: int = 3000):
    """Conjugate gradient for hermitian positive definite A.

    Returns (x, iterations, final |r|^2). On reduced-precision dtypes
    the exit residual is re-verified against the true b - A x, the
    loop restarted (up to twice) while that true residual misses the
    attainable verification target AND keeps improving (see
    _N_RESTARTS note), and the returned |r|^2 is the VERIFIED true
    residual — not the recursion estimate — so callers can detect a
    solve that never truly met its target (ADVICE r3 medium). In f64
    the plain recursion estimate is returned unchanged.
    """
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - apply_a(x) if x0 is not None else b
    rsq = jnp.real(_vdot(r, r))
    bsq = jnp.maximum(jnp.real(_vdot(b, b)), 1.0)
    target = _effective_eps(eps, b.dtype) * bsq

    def cond(carry):
        x, r, p, rsq, it = carry
        return jnp.logical_and(rsq > target, it < maxiter)

    def body(carry):
        x, r, p, rsq, it = carry
        ap = apply_a(p)
        alpha = rsq / jnp.real(_vdot(p, ap))
        x = x + alpha * p
        r = r - alpha * ap
        rsq_new = jnp.real(_vdot(r, r))
        beta = rsq_new / rsq
        p = r + beta * p
        return x, r, p, rsq_new, it + 1

    x, r, p, rsq, it = jax.lax.while_loop(cond, body, (x, r, r, rsq, 0))
    n_restarts = _N_RESTARTS.get(jnp.dtype(b.dtype), 0)
    if n_restarts:
        vtarget = jnp.maximum(target, _VERIFY_FLOOR * bsq)
        prev_true = jnp.asarray(jnp.inf, dtype=rsq.dtype)
        for _ in range(n_restarts):
            r_true = b - apply_a(x)
            rsq_true = jnp.real(_vdot(r_true, r_true))
            # enter the restart only if above the attainable target and
            # still improving; a zeroed carry rsq makes cond False so
            # the while_loop is skipped entirely (x untouched).
            run = jnp.logical_and(rsq_true > vtarget, rsq_true < prev_true)
            x, r, p, rsq, it = jax.lax.while_loop(
                cond, body,
                (x, r_true, r_true, jnp.where(run, rsq_true, 0.0), it),
            )
            prev_true = rsq_true
        # return the verified true residual (one extra mat-vec).
        r_true = b - apply_a(x)
        rsq = jnp.real(_vdot(r_true, r_true))
    return x, it, rsq


def cg_multi(apply_a: Callable, b: jnp.ndarray, eps: float = 1e-19, maxiter: int = 3000,
             x0=None):
    """Batched CG: solve A x_i = b_i for a stack of RHS at once.

    b has a leading RHS axis (n, ...); apply_a maps the full stack
    (typically jax.vmap of the single-RHS operator). Each RHS carries
    its own alpha/beta (this is masked multi-RHS CG, not block CG —
    no Krylov-space sharing, so convergence per RHS is identical to
    the sequential solve up to rounding). Systems whose residual has
    met the per-RHS target are frozen (alpha = beta = 0) while the
    slowest finish.

    Why batch: the Dirac mat-vec is HBM-bound and its traffic is
    dominated by the link field (PERF.md roofline); n RHS through one
    batched apply read the links once per *batch* instead of once per
    source, multiplying the arithmetic intensity of the measurement
    solves (pion correlator: NC*Nspinor point sources; pbp: Nr noise
    vectors) by up to n.

    Returns (x, iterations, per-RHS final |r|^2).
    """
    axes = tuple(range(1, b.ndim))

    def rdot(u, v):
        return jnp.real(jnp.sum(jnp.conj(u) * v, axis=axes))

    def bcast(c):
        return c.reshape((-1,) + (1,) * (b.ndim - 1)).astype(b.dtype)

    # optional per-RHS initial guess (e.g. a low-mode deflation
    # projection, ops/eigen.deflation_guess); x0=None traces the exact
    # pre-existing zero-start program
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - apply_a(x) if x0 is not None else b
    p = r
    rsq = rdot(r, r)
    bsq = jnp.maximum(rdot(b, b), 1.0)
    target = _effective_eps(eps, b.dtype) * bsq

    def cond(carry):
        x, r, p, rsq, it = carry
        return jnp.logical_and(jnp.any(rsq > target), it < maxiter)

    def body(carry):
        x, r, p, rsq, it = carry
        ap = apply_a(p)
        active = rsq > target
        alpha = jnp.where(active, _safe_div(rsq, rdot(p, ap)), 0.0)
        x = x + bcast(alpha) * p
        r = r - bcast(alpha) * ap
        rsq_new = rdot(r, r)
        # frozen systems keep p = r (bounded), alpha stays 0
        beta = jnp.where(active, _safe_div(rsq_new, rsq), 0.0)
        p = r + bcast(beta) * p
        return x, r, p, rsq_new, it + 1

    x, r, p, rsq, it = jax.lax.while_loop(cond, body, (x, r, p, rsq, 0))
    n_restarts = _N_RESTARTS.get(jnp.dtype(b.dtype), 0)
    if n_restarts:
        # verified exit + restart, gated per RHS on the attainable
        # verification target + improvement, as in cg (_N_RESTARTS
        # note); returned rsq is the verified true per-RHS residual.
        vtarget = jnp.maximum(target, _VERIFY_FLOOR * bsq)
        prev_true = jnp.full_like(rsq, jnp.inf)
        for _ in range(n_restarts):
            r_true = b - apply_a(x)
            rsq_true = rdot(r_true, r_true)
            run = jnp.logical_and(rsq_true > vtarget, rsq_true < prev_true)
            x, r, p, rsq, it = jax.lax.while_loop(
                cond, body,
                (x, r_true, r_true, jnp.where(run, rsq_true, 0.0), it),
            )
            prev_true = rsq_true
        r_true = b - apply_a(x)
        rsq = rdot(r_true, r_true)
    return x, it, rsq


def cg_multi_auto(apply_one: Callable, b: jnp.ndarray, eps: float = 1e-19,
                  maxiter: int = 3000, force_mode: str = None, x0=None):
    """Backend-conditional multi-RHS solve (the measured policy VERDICT
    r2 missing #3 asked for, numbers in PERF.md "Batched multi-RHS").

    apply_one is the SINGLE-RHS operator; b carries a leading RHS axis.

    * Accelerators: one vmapped cg_multi program — the HBM-bound
      mat-vec reads the link field once per batch instead of once per
      RHS (links are ~3/5 of D-slash traffic, PERF.md roofline).
    * CPU: sequential lax.scan of single-RHS CGs — measured 1.40x
      faster than the batched program there (8^4 f64, 12 RHS staggered
      packed-W, 2026-08-21: 0.627 s vs 0.880 s; the batch's 12x working
      set falls out of cache and the batched iteration count is the
      per-batch max instead of per-RHS). Results agree to 5e-15.

    Semantics are identical either way (masked per-RHS alpha/beta in
    cg_multi, no Krylov sharing). Returns (x, iterations, per-RHS |r|^2)
    with iterations = the max over RHS on the sequential path.

    force_mode ("batched" | "sequential" | None): override the backend
    dispatch — used by tests to exercise the accelerator (batched) path
    on the CPU suite.
    """
    mode = force_mode or ("sequential" if jax.default_backend() == "cpu" else "batched")
    if mode == "sequential":
        if x0 is None:
            def solve_one(_, bi):
                x, it, rsq = cg(apply_one, bi, eps=eps, maxiter=maxiter)
                return None, (x, it, rsq)

            _, (xs, its, rsqs) = jax.lax.scan(solve_one, None, b)
        else:
            def solve_one_x0(_, bx):
                bi, x0i = bx
                x, it, rsq = cg(apply_one, bi, x0=x0i, eps=eps, maxiter=maxiter)
                return None, (x, it, rsq)

            _, (xs, its, rsqs) = jax.lax.scan(solve_one_x0, None, (b, x0))
        return xs, jnp.max(its), rsqs
    return cg_multi(jax.vmap(apply_one), b, eps=eps, maxiter=maxiter, x0=x0)


def bicgstab(apply_a: Callable, b: jnp.ndarray, x0=None, eps: float = 1e-19, maxiter: int = 3000):
    """BiCGStab for general (non-hermitian) A, e.g. the Wilson D itself."""
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - apply_a(x) if x0 is not None else b
    rhat = r
    rho = _vdot(rhat, r)
    p = r
    rsq = jnp.real(_vdot(r, r))
    target = _effective_eps(eps, b.dtype) * jnp.maximum(jnp.real(_vdot(b, b)), 1.0)

    def cond(carry):
        x, r, p, rho, rsq, it = carry
        return jnp.logical_and(rsq > target, it < maxiter)

    def body(carry):
        x, r, p, rho, rsq, it = carry
        v = apply_a(p)
        alpha = _safe_div(rho, _vdot(rhat, v))
        s = r - alpha * v
        t = apply_a(s)
        # breakdown guards: s == 0 (converged at the alpha half step)
        # makes omega 0/0; omega = 0 then yields r = s = 0 and a clean
        # exit instead of a NaN-poisoned x. Likewise rho/omega -> beta.
        omega = _safe_div(_vdot(t, s), _vdot(t, t))
        x = x + alpha * p + omega * s
        r = s - omega * t
        rho_new = _vdot(rhat, r)
        beta = _safe_div(rho_new, rho) * _safe_div(alpha, omega)
        p = r + beta * (p - omega * v)
        rsq = jnp.real(_vdot(r, r))
        return x, r, p, rho_new, rsq, it + 1

    x, r, p, rho, rsq, it = jax.lax.while_loop(cond, body, (x, r, p, rho, rsq, 0))
    return x, it, rsq


def multishift_cg(
    apply_a: Callable,
    b: jnp.ndarray,
    shifts,
    eps: float = 1e-19,
    maxiter: int = 3000,
):
    """Multi-shift CG: solve (A + sigma_k) x_k = b for all k at once.

    The RHMC workhorse (SURVEY.md 2.4.2: Remez + multi-shift CG behind
    FermiAction for Nf not in {4,8}). One Krylov space; shifted
    iterates via the Jegerlehner zeta recurrence (hep-lat/9612014),
    rewritten with the positive CG step a_n = rsq/(p,Ap):

        zeta^{n+1} = zeta^n zeta^{n-1} a_{n-1} /
            [ a_n b_{n-1} (zeta^{n-1} - zeta^n)
              + zeta^{n-1} a_{n-1} (1 + sigma a_n) ]
        x_s  += a_n (zeta^{n+1}/zeta^n) p_s
        p_s   = zeta^{n+1} r_new + b_n (zeta^{n+1}/zeta^n)^2 p_s

    shifts must be >= 0 and A positive definite. Convergence is
    monitored on the unshifted residual (the slowest). Returns
    (xs[k], iterations, |r|^2).
    """
    rdtype = jnp.float64 if b.dtype == jnp.complex128 else jnp.float32
    sigma = jnp.asarray(shifts, dtype=rdtype)
    ns = sigma.shape[0]

    x = jnp.zeros((ns,) + b.shape, dtype=b.dtype)
    r = b
    p = r
    ps = jnp.broadcast_to(b, (ns,) + b.shape).astype(b.dtype)
    zeta = jnp.ones((ns,), dtype=rdtype)
    zeta_prev = jnp.ones((ns,), dtype=rdtype)
    a_prev = jnp.ones((), dtype=rdtype)
    b_prev = jnp.zeros((), dtype=rdtype)
    rsq = jnp.real(_vdot(r, r))
    target = _effective_eps(eps, b.dtype) * jnp.maximum(jnp.real(_vdot(b, b)), 1.0)

    def cond(carry):
        (x, r, p, ps, zeta, zeta_prev, a_prev, b_prev, rsq, it) = carry
        return jnp.logical_and(rsq > target, it < maxiter)

    def body(carry):
        (x, r, p, ps, zeta, zeta_prev, a_prev, b_prev, rsq, it) = carry
        ap = apply_a(p)
        a_n = rsq / jnp.real(_vdot(p, ap))
        zeta_new_raw = (
            zeta
            * zeta_prev
            * a_prev
            / (
                a_n * b_prev * (zeta_prev - zeta)
                + zeta_prev * a_prev * (1.0 + sigma * a_n)
            )
        )
        # freeze shifted systems whose residual |r_s|^2 ~ zeta^2 rsq is
        # already below target — their zeta underflows geometrically and
        # would poison the recurrence with 0/0 at tight tolerances
        active = (zeta * zeta) * rsq > target
        zeta_new = jnp.where(active, zeta_new_raw, zeta)
        ratio = jnp.where(active, zeta_new_raw / jnp.where(active, zeta, 1.0), 0.0)
        x = x + _bcast(a_n * ratio, ps).astype(b.dtype) * ps
        r_new = r - a_n * ap
        rsq_new = jnp.real(_vdot(r_new, r_new))
        b_n = rsq_new / rsq
        p_new = r_new + b_n * p
        ps = (
            _bcast(jnp.where(active, zeta_new, 0.0), ps).astype(b.dtype) * r_new[None]
            + _bcast(b_n * ratio**2, ps).astype(b.dtype) * ps
        )
        return (x, r_new, p_new, ps, zeta_new, zeta, a_n, b_n, rsq_new, it + 1)

    carry = (x, r, p, ps, zeta, zeta_prev, a_prev, b_prev, rsq, 0)
    (x, r, p, ps, zeta, zeta_prev, a_prev, b_prev, rsq, it) = jax.lax.while_loop(
        cond, body, carry
    )
    return x, it, rsq


def _bcast(coeffs, field):
    """Broadcast per-shift coefficients over field axes."""
    return coeffs.reshape((-1,) + (1,) * (field.ndim - 1))
