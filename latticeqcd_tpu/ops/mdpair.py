"""Mixed-precision MD state: complex fields as float64 (re, im) pairs.

Why this exists (VERDICT r4 weak #2 / next #3): the round-4 bias study
(PERF.md "complex64 sampling-bias evidence") measured a real
+0.078 +- 0.026 dH offset and ~18 pp acceptance loss at 8^4 in the
production complex64 dtype, localized *by elimination* to c64 rounding
in the integrator arithmetic itself — the exp(i eps H) U products and
the kick accumulation h += eps*F — after link-unitarity drift and
force/solver precision were ruled out by direct experiment. The fix is
to run ONLY the integrator state (U, H) and its updates in f64 while
every expensive term (gauge/fermion forces, CG solves, action
evaluations, the links handed to the next trajectory) stays complex64.

Why real pairs instead of complex128: complex128 does not compile on
the target TPU (CLAUDE.md, verified empirically), but real float64
does. A `PairField` carries (re, im) float64 arrays plus the complex
dtype it lowers back to, registered as a pytree so it flows through
`jax.jit` / `lax.fori_loop` carries unchanged. All pair arithmetic
(matmul, scale, add, the exponential map) is expressed in real f64
ops, so one code path serves CPU tests and the TPU production backend.

Requires jax_enable_x64 (else the "f64" pair silently truncates to
f32 and buys nothing) — callers must check `require_x64()`.

Cost model: the pair exponential is the generic Taylor +
scaling-and-squaring scheme of ops/sun._expm_taylor_ss (order 10,
8 squarings, ~1e-16 relative for |eps*H| <~ 20) at 4 real matmuls per
complex matmul — ~70 real [3,3] matmuls per link update. That is noise
next to a single fermion-force CG (hundreds of D-slash applications),
which is why the measured wall-clock overhead target is ~10%
(VERDICT r4 next #3 "Done" criterion; measured numbers in PERF.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class PairField:
    """A complex field stored as float64 (re, im), lowering to cdtype.

    Supports the only algebra the MD integrators apply to state:
    PairField + PairField, PairField + complex_array (a kick increment,
    upcast exactly to f64), and real_scalar * PairField. Everything
    else must go through the module functions.
    """

    __slots__ = ("re", "im", "cdtype")

    def __init__(self, re, im, cdtype):
        self.re = re
        self.im = im
        self.cdtype = jnp.dtype(cdtype)

    def tree_flatten(self):
        return (self.re, self.im), str(self.cdtype)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)

    # --- the (only) operators integrator bodies use on MD state
    def __add__(self, other):
        if isinstance(other, PairField):
            return PairField(self.re + other.re, self.im + other.im, self.cdtype)
        # kick increment: a complex (c64) force array; the upcast to
        # f64 is exact, the accumulation into the large H happens here
        # in f64 — this is the compensated-kick half of the fix
        re = self.re + jnp.real(other).astype(self.re.dtype)
        im = self.im + jnp.imag(other).astype(self.im.dtype)
        return PairField(re, im, self.cdtype)

    __radd__ = __add__

    def __mul__(self, s):
        return PairField(self.re * s, self.im * s, self.cdtype)

    __rmul__ = __mul__

    @property
    def shape(self):
        return self.re.shape

    @property
    def dtype(self):  # the complex dtype this lowers to
        return self.cdtype


def require_x64() -> None:
    if not jax.config.jax_enable_x64:
        raise RuntimeError(
            "md_precision='mixed' needs jax_enable_x64=True; without it the "
            "f64 pair state silently truncates to f32 and mitigates nothing"
        )


def lift(x: jnp.ndarray) -> PairField:
    """Complex array -> f64 pair (exact)."""
    f64 = jnp.float64
    return PairField(jnp.real(x).astype(f64), jnp.imag(x).astype(f64), x.dtype)


def lower(p: PairField) -> jnp.ndarray:
    """f64 pair -> the original complex dtype.

    Builds complex64 via lax.complex on downcast f32 parts — never
    materializing a complex128 array, which the TPU cannot compile.
    """
    if p.cdtype == jnp.complex64:
        return jax.lax.complex(p.re.astype(jnp.float32), p.im.astype(jnp.float32))
    return jax.lax.complex(p.re, p.im)


def as_complex(x):
    """Polymorphic view for force/action evaluation: lower pairs,
    pass complex arrays through."""
    return lower(x) if isinstance(x, PairField) else x


def matmul(a: PairField, b: PairField) -> PairField:
    """Batched complex matmul in real-pair arithmetic (4 real matmuls)."""
    re = jnp.matmul(a.re, b.re) - jnp.matmul(a.im, b.im)
    im = jnp.matmul(a.re, b.im) + jnp.matmul(a.im, b.re)
    return PairField(re, im, a.cdtype)


_TAYLOR_ORDER = 10
_SCALING_SQUARINGS = 8


def expi_hermitian(h: PairField, eps) -> PairField:
    """exp(i * eps * H) in pair arithmetic (mirrors sun._expm_taylor_ss).

    X = i*eps*H has re = -eps*H_im, im = eps*H_re (a pure swap/scale).
    Fixed order-10 Taylor after 8 halvings: ~1e-16 relative for
    |eps*H| <~ 20, far beyond any MD step size.
    """
    scale = 2.0 ** (-_SCALING_SQUARINGS)
    xr = (-eps * scale) * h.im
    xi = (eps * scale) * h.re
    x = PairField(xr, xi, h.cdtype)
    nc = h.re.shape[-1]
    ident = jnp.eye(nc, dtype=jnp.float64)
    acc = PairField(ident + xr / _TAYLOR_ORDER, xi / _TAYLOR_ORDER, h.cdtype)
    for k in range(_TAYLOR_ORDER - 1, 0, -1):
        m = matmul(x, acc)
        acc = PairField(ident + m.re / k, m.im / k, h.cdtype)
    for _ in range(_SCALING_SQUARINGS):
        acc = matmul(acc, acc)
    return acc


def update_links(u: PairField, h: PairField, eps) -> PairField:
    """U <- exp(i eps H) U, fully in f64 pair arithmetic."""
    return matmul(expi_hermitian(h, eps), u)


def kinetic_energy(h: PairField) -> jnp.ndarray:
    """tr(H^2) summed over batch axes, f64. For hermitian H this equals
    sum |H_ij|^2 = sum (re^2 + im^2), matching sun.kinetic_energy."""
    return jnp.sum(h.re * h.re) + jnp.sum(h.im * h.im)
