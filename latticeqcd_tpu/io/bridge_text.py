"""Bridge++ plain-text gauge-configuration I/O.

Format (pinned against the reference's checked-in test ensembles,
test/confs_*/conf_*.ildg.txt): one float per line, 2 * NC*NC * 4 * V
lines total; site-major with x fastest (ix innermost of the site
loops, it slowest), then direction mu = x,y,z,t, then color row a,
then color column b, with re/im interleaved (re first). Counterpart
of load_BridgeText!/save_textdata (SURVEY.md 2.4.1,
/root/reference/src/system/universe.jl:67-68, lqcd.jl:242). The
ordering is validated in tests/test_io.py by reproducing equilibrium
plaquette values on every checked-in reference config family.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

DIRS = 4


def load_bridge_text(filename, lattice, nc: int, dtype=jnp.complex128) -> jnp.ndarray:
    """Load a Bridge++ text config into U[mu, x, y, z, t, a, b]."""
    from latticeqcd_tpu.io import native_ext

    nx, ny, nz, nt = lattice
    data = native_ext.parse_text_doubles(
        filename, 2 * nc * nc * DIRS * nx * ny * nz * nt
    )
    expected = 2 * nc * nc * DIRS * nx * ny * nz * nt
    if data.size != expected:
        raise ValueError(
            f"{filename}: got {data.size} values, expected {expected} "
            f"for lattice {lattice} NC={nc}"
        )
    cplx = native_ext.to_complex(data)
    # file order: t slowest, then z, y, x, then mu, row a, col b
    arr = cplx.reshape(nt, nz, ny, nx, DIRS, nc, nc)
    # -> (mu, x, y, z, t, a, b)
    u = np.transpose(arr, (4, 3, 2, 1, 0, 5, 6))
    return jnp.asarray(u, dtype=dtype)


def save_bridge_text(filename, u) -> None:
    """Save U[mu, x, y, z, t, a, b] in the same line ordering."""
    un = np.asarray(u)
    # -> (t, z, y, x, mu, a, b)
    arr = np.transpose(un, (4, 3, 2, 1, 0, 5, 6))
    flat = arr.reshape(-1)
    out = np.empty(2 * flat.size, dtype=np.float64)
    out[0::2] = flat.real
    out[1::2] = flat.imag
    with open(filename, "w") as fp:
        fp.write("\n".join(repr(float(v)) for v in out))
        fp.write("\n")
