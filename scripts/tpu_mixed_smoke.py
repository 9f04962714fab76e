"""TPU smoke for md_precision='mixed': does the f64 real-pair MD state
compile and run on the axon chip?

complex128 does not compile there (CLAUDE.md); mixed mode was designed
around that by carrying (re, im) float64 arrays instead
(ops/mdpair.py). Whether axon's f64 *real* path compiles the pair
exponential + staged HMC programs is the one thing only the chip can
answer. One 4^4 quenched staged trajectory, plus a plain-c64 one for
an apples-to-apples wall comparison.

Usage: python scripts/tpu_mixed_smoke.py   (run WITHOUT --cpu: targets
the default axon backend; exits nonzero on failure so the capture
harness can retry)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_enable_x64", True)  # mixed requires x64

import jax.numpy as jnp  # noqa: E402

from latticeqcd_tpu.ops import fields, gauge_action as ga  # noqa: E402
from latticeqcd_tpu.updates import HMC  # noqa: E402

LAT = (4, 4, 4, 4)


def one(md_precision):
    hmc = HMC(action=ga.wilson_gauge_action(3, 5.7), dtau=0.05, md_steps=10,
              staged=True, md_precision=md_precision)
    u = fields.hot_start(LAT, 3, seed=1, dtype=jnp.complex64)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    u, key, st = hmc.step(u, key)  # compile
    compile_s = time.time() - t0
    t0 = time.time()
    n = 5
    for _ in range(n):
        u, key, st = hmc.step(u, key)
    jax.block_until_ready(u)
    return {
        "md_precision": md_precision,
        "compile_s": round(compile_s, 1),
        "wall_per_traj_s": round((time.time() - t0) / n, 3),
        "plaq": round(float(st["plaq"]), 5),
        "dH": round(float(st["dH"]), 5),
    }


if __name__ == "__main__":
    out = {"device": str(jax.devices()[0])}
    for prec in ("plain", "mixed"):
        out[prec] = one(prec)
    # sanity: both must land in the same equilibrium neighbourhood
    ok = abs(out["plain"]["plaq"] - out["mixed"]["plaq"]) < 0.2 \
        and 0.2 < out["mixed"]["plaq"] < 0.9
    out["ok"] = bool(ok)
    print(json.dumps(out), flush=True)
    sys.exit(0 if ok else 1)
