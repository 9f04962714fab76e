"""Native checkpoint I/O (.npz) — the JLD2 counterpart.

The reference saves/loads link fields with JLD2 (saveU/loadU,
SURVEY.md 2.4.1; /root/reference/src/system/lqcd.jl:236,
universe.jl:71). Here the native format is a NumPy .npz archive, and
— improving on the reference (SURVEY.md section 5: "RNG state and
updater state are NOT checkpointed") — full-run checkpoints can also
carry the PRNG key and trajectory counter for bitwise resume.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def save_u(filename, u) -> None:
    np.savez_compressed(filename, u=np.asarray(u))


def load_u(filename, dtype=jnp.complex128) -> jnp.ndarray:
    with np.load(filename) as z:
        return jnp.asarray(z["u"], dtype=dtype)


def save_checkpoint(filename, u, rng_key=None, itrj=None, extra=None) -> None:
    payload = {"u": np.asarray(u)}
    if rng_key is not None:
        payload["rng_key"] = np.asarray(rng_key)
    if itrj is not None:
        payload["itrj"] = np.asarray(itrj)
    if extra:
        for k, v in extra.items():
            payload["extra_" + k] = np.asarray(v)
    np.savez_compressed(filename, **payload)


def load_checkpoint(filename, dtype=jnp.complex128):
    with np.load(filename) as z:
        out = {"u": jnp.asarray(z["u"], dtype=dtype)}
        if "rng_key" in z:
            out["rng_key"] = jnp.asarray(z["rng_key"])
        if "itrj" in z:
            out["itrj"] = int(z["itrj"])
        for k in z.files:
            if k.startswith("extra_"):
                out[k[6:]] = jnp.asarray(z[k])
    return out
