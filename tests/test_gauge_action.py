import jax
import jax.numpy as jnp
import numpy as np
import pytest

from latticeqcd_tpu.ops import fields, gauge_action, sun, wilsonline

LAT = (4, 4, 4, 4)


@pytest.fixture(scope="module")
def u3():
    return fields.hot_start(LAT, 3, seed=7)


def test_cold_plaquette_is_one():
    u = fields.cold_start(LAT, 3)
    assert abs(float(gauge_action.mean_plaquette(u)) - 1.0) < 1e-14


def test_plaquette_matches_loop_evaluator(u3):
    """The dedicated plaquette path and the generic symbolic evaluator agree."""
    loops = wilsonline.make_loops_fromname("plaquette", 4)
    s = wilsonline.evaluate_loop_trace_sum(u3, loops)
    assert abs(float(jnp.real(s)) - float(gauge_action.plaquette_sum(u3))) < 1e-8


def test_action_normalization(u3):
    """evaluate with beta/2 + adjoints == beta * sum Re tr P (universe.jl:90-93)."""
    beta = 5.7
    act = gauge_action.wilson_gauge_action(3, beta)
    val = gauge_action.evaluate(act, u3)
    expected = beta * float(gauge_action.plaquette_sum(u3))
    assert abs(float(jnp.real(val)) - expected) < 1e-7
    assert abs(float(jnp.imag(val))) < 1e-7


def test_gauge_invariance(u3):
    """tr of closed loops is invariant under U_mu(x) -> g(x) U_mu(x) g(x+mu)^dag."""
    rng = np.random.default_rng(3)
    g = jnp.asarray(sun.random_sun_host(rng, LAT, 3))
    u_t = []
    for mu in range(4):
        gshift = wilsonline._roll_to(g, wilsonline._path_offsets([(mu, 1)])[1])
        u_t.append(sun.mul(sun.mul(g, u3[mu]), sun.dagger(gshift)))
    ut = jnp.stack(u_t)
    p1 = float(gauge_action.mean_plaquette(u3))
    p2 = float(gauge_action.mean_plaquette(ut))
    assert abs(p1 - p2) < 1e-12


def test_staple_reproduces_action(u3):
    """sum_y Re tr(U_mu V_mu) summed over mu == 2 * Re evaluate (each link
    occurrence counted once; plaquette has 4 occurrences = 4 trace terms,
    but tr(UV) per +occurrence counts each loop once per its mu-content:
    for the adjoint-closed plaquette set each loop contains exactly 2
    +occurrences across all mu)."""
    beta = 1.9
    act = gauge_action.wilson_gauge_action(3, beta)
    total = 0.0
    for mu in range(4):
        v = gauge_action.staples(act, u3, mu)
        total += float(jnp.sum(jnp.real(sun.trace(sun.mul(u3[mu], v)))))
    ev = float(jnp.real(gauge_action.evaluate(act, u3)))
    assert abs(total - 2 * ev) < 1e-7 * abs(ev)


def test_force_staple_vs_autodiff(u3):
    act = gauge_action.wilson_gauge_action(3, 5.7)
    f1 = gauge_action.force(act, u3)
    f2 = gauge_action.force_autodiff(act, u3)
    scale = float(jnp.max(jnp.abs(f1)))
    assert float(jnp.max(jnp.abs(f1 - f2))) < 1e-10 * scale


def test_force_vs_finite_difference(u3):
    """dS/dt along a random algebra direction == <force-pairing>."""
    act = gauge_action.wilson_gauge_action(3, 5.7)
    key = jax.random.PRNGKey(11)
    h = sun.random_hermitian_momentum(key, (4, *LAT), 3)

    def s_along(t):
        e = sun.expi_hermitian(h, t)
        ut = jnp.stack([sun.mul(e[mu], u3[mu]) for mu in range(4)])
        return gauge_action.action_value(act, ut)

    dt = 1e-5
    ds_num = (float(s_along(dt)) - float(s_along(-dt))) / (2 * dt)
    f = gauge_action.force(act, u3)
    # dS/dt = -2 sum tr(H Hdot_force)  (from Hdot = -dS pairing)
    ds_force = -2.0 * float(jnp.sum(jnp.real(sun.trace(sun.mul(h, f)))))
    assert abs(ds_num - ds_force) < 1e-5 * max(1.0, abs(ds_num))


def test_rect_and_chair_forces_autodiff_consistent(u3):
    """Generic loop sets: symbolic staple force == autodiff force."""
    act = gauge_action.general_gauge_action(
        3,
        [1.0, 0.5],
        [wilsonline.make_loops_fromname("plaquette", 4),
         wilsonline.make_loops_fromname("rectangular", 4)],
    )
    f1 = gauge_action.force(act, u3)
    f2 = gauge_action.force_autodiff(act, u3)
    scale = float(jnp.max(jnp.abs(f1)))
    assert float(jnp.max(jnp.abs(f1 - f2))) < 1e-9 * scale
