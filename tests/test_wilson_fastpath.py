import jax
import jax.numpy as jnp

from latticeqcd_tpu.ops import fields
from latticeqcd_tpu.ops.dirac.wilson import WilsonDirac, apply_boundary_phases, gaussian_spinor

LAT = (4, 4, 4, 4)


def test_half_spinor_matches_generic():
    """The r=1 half-spinor hopping equals the generic projector form."""
    u = apply_boundary_phases(fields.hot_start(LAT, 3, seed=71))
    psi = gaussian_spinor(jax.random.PRNGKey(0), LAT, 3)
    d = WilsonDirac(kappa=0.137)
    fast = d._hop_half_spinor(u, psi)
    slow = d._hop_generic(u, psi)
    assert float(jnp.max(jnp.abs(fast - slow))) < 1e-12
