"""ops/rolls.py — the lattice_roll primitive must agree with jnp.roll
under every transformation the framework uses (jit, grad, jvp,
linear_transpose, vmap, and compositions), and its sharded GRADIENT
must lower to collective-permutes with no all-reduce (the raison
d'etre: JAX AD transposes jnp.roll into pad ops that GSPMD partitions
as halo-plane all-reduces — see test_collective_audit.py)."""

import re
from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latticeqcd_tpu.ops.rolls import roll


@pytest.fixture()
def x():
    return jnp.asarray(np.arange(24.0).reshape(2, 3, 4))


def test_forward_matches_jnp_roll(x):
    for shift, axis in [(1, 0), (-1, 1), (2, 2), (1, -1), (5, 1)]:
        np.testing.assert_array_equal(roll(x, shift, axis),
                                      jnp.roll(x, shift, axis))
    np.testing.assert_array_equal(roll(x, (1, -1), (1, 2)),
                                  jnp.roll(x, (1, -1), (1, 2)))


def test_grad_jvp_transpose_match(x):
    g1 = jax.grad(lambda v: jnp.sum(jnp.sin(roll(v, 2, 2))))(x)
    g2 = jax.grad(lambda v: jnp.sum(jnp.sin(jnp.roll(v, 2, 2))))(x)
    np.testing.assert_allclose(g1, g2)
    _, t = jax.jvp(lambda v: roll(v, 1, 0), (x,), (2.0 * x,))
    np.testing.assert_array_equal(t, jnp.roll(2.0 * x, 1, 0))
    (lt,) = jax.linear_transpose(lambda v: roll(v, 1, 1), x)(x)
    np.testing.assert_array_equal(lt, jnp.roll(x, -1, 1))
    g3 = jax.grad(lambda v: jnp.sum(jnp.cos(roll(v, (1, -1), (1, 2)))))(x)
    g4 = jax.grad(lambda v: jnp.sum(jnp.cos(jnp.roll(v, (1, -1), (1, 2)))))(x)
    np.testing.assert_allclose(g3, g4)


def test_vmap_and_vmap_of_grad(x):
    vm = jax.vmap(lambda v: roll(v, 1, 0))(x)
    np.testing.assert_array_equal(
        vm, jnp.stack([jnp.roll(x[i], 1, 0) for i in range(2)]))
    vg = jax.vmap(jax.grad(lambda v: jnp.sum(roll(v, 1, 0) ** 2)))(x)
    np.testing.assert_allclose(vg, 2.0 * x)
    # batch axis BEFORE the rolled axis must leave the roll axis alone
    vm2 = jax.vmap(lambda v: roll(v, 1, 1), in_axes=1)(x)
    np.testing.assert_array_equal(
        vm2, jnp.stack([jnp.roll(x[:, i], 1, 1) for i in range(3)]))


def test_sharded_grad_lowers_to_permutes_only():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(jax.devices()[:8], ("t",))
    y = jax.device_put(jnp.ones((16, 8)), NamedSharding(mesh, P("t", None)))
    hlo = jax.jit(
        jax.grad(lambda v: jnp.sum(jnp.sin(roll(v, 1, 0))))
    ).lower(y).compile().as_text()
    ops = Counter(m.group(1) for m in re.finditer(
        r"(collective-permute|all-reduce|all-gather)(?:-start)?\(", hlo))
    assert ops.get("all-reduce", 0) == 0 and ops.get("all-gather", 0) == 0, ops
    assert ops.get("collective-permute", 0) > 0, ops
