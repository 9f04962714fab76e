"""Post-hoc analysis helpers for measurement text files.

Counterpart of the reference's exported analysis helpers
(/root/reference/src/examples/analysis/analysis_sample.jl:1-17,
exports at LatticeQCD.jl:171-172): parse the whitespace-separated
measurement series written by the driver.
"""

from __future__ import annotations

import numpy as np


def read_measurement_series(filename, value_columns=(1,)):
    """Read non-comment lines: first column itrj, then values."""
    itrjs, values = [], []
    with open(filename) as fp:
        for line in fp:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split("#")[0].split()
            if not parts:
                continue
            try:
                itrjs.append(int(float(parts[0])))
                values.append([float(parts[c]) for c in value_columns])
            except (ValueError, IndexError):
                continue
    return np.asarray(itrjs), np.asarray(values)


def get_plaquette_average(measuredir, skip: int = 0):
    itrj, vals = read_measurement_series(f"{measuredir}/Plaquette.txt")
    return float(np.mean(vals[skip:, 0]))


def get_polyakov_average(measuredir, skip: int = 0):
    itrj, vals = read_measurement_series(f"{measuredir}/Polyakov_loop.txt", value_columns=(1, 2))
    v = vals[skip:]
    return complex(np.mean(v[:, 0]), np.mean(v[:, 1]))


def jackknife(samples, fn=np.mean, nblocks: int = 10):
    """Blocked jackknife mean and error for a derived quantity."""
    samples = np.asarray(samples)
    n = len(samples) // nblocks * nblocks
    blocks = samples[:n].reshape(nblocks, -1)
    estimates = []
    for i in range(nblocks):
        rest = np.concatenate([blocks[j] for j in range(nblocks) if j != i])
        estimates.append(fn(rest))
    estimates = np.asarray(estimates)
    mean = float(np.mean(estimates))
    err = float(np.sqrt((nblocks - 1) * np.mean((estimates - mean) ** 2)))
    return mean, err


def main(argv=None):
    """CLI: python -m latticeqcd_tpu.analysis <measuredir> [skip]

    Prints mean +- jackknife error for every measurement series in the
    directory (the reference's analysis_sample.jl workflow,
    src/analyze.jl counterpart).
    """
    import os
    import sys

    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print("usage: python -m latticeqcd_tpu.analysis <measuredir> [skip]")
        return 2
    measuredir = argv[0]
    skip = int(argv[1]) if len(argv) > 1 else 0
    for fn in sorted(os.listdir(measuredir)):
        if not fn.endswith(".txt"):
            continue
        path = os.path.join(measuredir, fn)
        itrj, vals = read_measurement_series(path)
        if len(itrj) <= skip:
            print(f"{fn:32s} ({len(itrj)} rows, skipped)")
            continue
        v = vals[skip:, 0]
        if len(v) >= 20:
            mean, err = jackknife(v)
            print(f"{fn:32s} {mean:+.8f} +- {err:.8f}  (n={len(v)})")
        else:
            print(f"{fn:32s} {float(np.mean(v)):+.8f} +- {float(np.std(v)):.8f}  (n={len(v)}, naive)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
