"""Linearity-preserving lattice shifts (round 4).

jnp.roll is linear and its transpose is exactly the opposite roll (a
permutation matrix), but JAX's AD transposes roll's concatenate/slice
lowering into pad ops, which GSPMD partitions as masked halo-plane
ALL-REDUCES instead of collective-permutes — measured in the sharded
fermion-force programs (4 plane-shaped all-reduces per Wilson force,
~3.5x a permute's halo traffic plus all-reduce latency) and in the
transposed domain-wall stencils before their adjoints went explicit
(tests/test_collective_audit.py). `roll` is a custom primitive whose
transpose rule IS the opposite roll, so every derivative (jvp, vjp,
linear_transpose) of a stencil lowers to the same halo permutes as
the forward pass; a batching rule keeps it vmap-compatible (multi-RHS
solvers, batched multi-chain HMC).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.extend.core import Primitive
from jax.interpreters import ad, batching, mlir

roll_p = Primitive("lattice_roll")


def _normalize(shift, axis, ndim):
    if isinstance(axis, (tuple, list)):
        shifts = tuple(int(s) for s in shift)
        axes = tuple(int(a) % ndim for a in axis)
    else:
        shifts, axes = (int(shift),), (int(axis) % ndim,)
    return shifts, axes


def roll(x, shift, axis):
    """jnp.roll with its transpose pinned to jnp.roll(ct, -shift)."""
    shifts, axes = _normalize(shift, axis, jnp.ndim(x))
    return roll_p.bind(x, shifts=shifts, axes=axes)


def _impl(x, *, shifts, axes):
    return jnp.roll(x, shifts, axes)


roll_p.def_impl(_impl)
roll_p.def_abstract_eval(lambda x, *, shifts, axes: x)
mlir.register_lowering(roll_p, mlir.lower_fun(_impl, multiple_results=False))

# Linear: jvp is the roll itself; transpose is the opposite roll.
ad.deflinear2(
    roll_p,
    lambda ct, x, *, shifts, axes: [
        roll_p.bind(ct, shifts=tuple(-s for s in shifts), axes=axes)
    ],
)


def _batch(vals, dims, *, shifts, axes):
    (x,), (d,) = vals, dims
    # a batch dim inserted at d pushes every rolled axis >= d right by 1
    new_axes = tuple(a + 1 if d is not None and a >= d else a for a in axes)
    return roll_p.bind(x, shifts=shifts, axes=new_axes), d


batching.primitive_batchers[roll_p] = _batch
