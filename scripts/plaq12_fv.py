"""12^4 published-plaquette finite-volume cross-check (VALIDATION 1c).

The committed 8^4 measurements sit BELOW the published infinite-volume
<P> at beta = 5.7 / 6.0 (-2.2% / -1.0%), attributed to finite volume.
This one-off 12^4 run tests that attribution: quadrupling the volume
(5.06x the sites, L ~ 1.1 fm at beta 6.0) must move <P> toward the
published value. complex64 storage like the committed 8^4 table rows.

Usage: python scripts/plaq12_fv.py [--cpu] [beta ...]
Appends one JSON line per beta to PERF_CAPTURE/plaq12_fv.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax  # noqa: E402

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from latticeqcd_tpu.analysis import autocorrelation  # noqa: E402
from latticeqcd_tpu.ops import fields, gauge_action as ga  # noqa: E402
from latticeqcd_tpu.updates.heatbath import Heatbath  # noqa: E402

PUBLISHED = {5.7: 0.549195, 6.0: 0.593679}
LAT = (12, 12, 12, 12)


def run(beta, n_therm=200, n_meas=400):
    hb = Heatbath(action=ga.wilson_gauge_action(3, beta))
    u = fields.cold_start(LAT, 3, dtype=jnp.complex64)
    key = jax.random.PRNGKey(17)
    t0 = time.time()
    for i in range(n_therm):
        u, key = hb.sweep(u, key)
        if i % 50 == 0:
            print(f"# beta={beta} therm {i}/{n_therm} "
                  f"P={float(ga.mean_plaquette(u)):.5f} ({time.time()-t0:.0f}s)",
                  flush=True)
    ps = []
    for i in range(n_meas):
        u, key = hb.sweep(u, key)
        ps.append(float(ga.mean_plaquette(u)))
        if i % 100 == 0:
            print(f"# beta={beta} meas {i}/{n_meas} ({time.time()-t0:.0f}s)",
                  flush=True)
    mean, err, tau, _ = autocorrelation(np.asarray(ps))
    out = {
        "lattice": "12^4", "beta": beta, "plaq": round(float(mean), 6),
        "err": round(float(err), 6), "tau_int": round(float(tau), 2),
        "n_meas": n_meas, "published_infV": PUBLISHED.get(beta),
        "deviation": round(float(mean) - PUBLISHED.get(beta, np.nan), 6),
        "wall_s": round(time.time() - t0, 1), "device": str(jax.devices()[0]),
    }
    print(json.dumps(out), flush=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                           "PERF_CAPTURE", "plaq12_fv.jsonl"), "a") as fp:
        fp.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    betas = [float(a) for a in sys.argv[1:] if not a.startswith("--")] or [6.0, 5.7]
    for b in betas:
        run(b)
