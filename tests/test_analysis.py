"""Analysis helpers: series parsing, jackknife, Wolff Gamma-method."""

import numpy as np

from latticeqcd_tpu.analysis import autocorrelation, jackknife, read_measurement_series


def test_jackknife_iid_error():
    rng = np.random.default_rng(1)
    x = rng.normal(size=5000)
    mean, err = jackknife(x)
    assert abs(mean) < 0.05
    naive = x.std() / np.sqrt(len(x))
    assert 0.5 * naive < err < 2.0 * naive


def test_autocorrelation_iid():
    """Uncorrelated series: tau_int = 1/2, err = naive standard error."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=20000)
    mean, err, tau, w = autocorrelation(x)
    assert abs(tau - 0.5) < 0.1, tau
    naive = x.std() / np.sqrt(len(x))
    assert abs(err / naive - 1.0) < 0.2


def test_autocorrelation_ar1():
    """AR(1) with rho = 0.9: tau_int = (1+rho)/(2(1-rho)) = 9.5 and the
    quoted error inflates by sqrt(2 tau_int) over naive."""
    rng = np.random.default_rng(2)
    y = np.zeros(200000)
    for i in range(1, len(y)):
        y[i] = 0.9 * y[i - 1] + rng.normal()
    mean, err, tau, w = autocorrelation(y)
    assert 7.5 < tau < 11.5, tau
    naive = y.std() / np.sqrt(len(y))
    assert abs(err / naive - np.sqrt(2 * tau)) < 0.2


def test_read_series_skips_comments(tmp_path):
    p = tmp_path / "Plaquette.txt"
    p.write_text("# header\n1 0.5 # plaq\n2 0.6 # plaq\nbad line\n3 0.7 # plaq\n")
    itrj, vals = read_measurement_series(str(p))
    assert list(itrj) == [1, 2, 3]
    assert np.allclose(vals[:, 0], [0.5, 0.6, 0.7])


def test_static_potential_and_creutz_ratio_recover_area_law():
    """Synthetic area-law loops W(R,T) = exp(-sigma R T - p (R+T) - c):
    V(R) must come out sigma*R + p and every Creutz ratio exactly
    sigma (perimeter and corner terms cancel)."""
    import numpy as np

    from latticeqcd_tpu.analysis import creutz_ratio, static_potential

    sigma, p, c = 0.31, 0.11, 0.05
    rmax = tmax = 5
    w = np.array(
        [[np.exp(-sigma * r * t - p * (r + t) - c) for t in range(1, tmax + 1)]
         for r in range(1, rmax + 1)]
    )
    v = static_potential(w)
    expect = np.array([sigma * r + p for r in range(1, rmax + 1)])
    np.testing.assert_allclose(v, expect, rtol=1e-12)
    for r in range(2, rmax + 1):
        for t in range(2, tmax + 1):
            assert abs(creutz_ratio(w, r, t) - sigma) < 1e-12


def test_read_wilson_loop_roundtrip(tmp_path):
    import numpy as np

    from latticeqcd_tpu.analysis import read_wilson_loop

    fn = tmp_path / "Wilson_loop.txt"
    lines = []
    for itrj in (1, 2):
        for r in (1, 2):
            for t in (1, 2, 3):
                lines.append(f"{itrj} {r} {t} {0.5 ** (r * t) * itrj} # RxT wilson loop")
    fn.write_text("\n".join(lines) + "\n")
    mats = read_wilson_loop(fn)
    assert set(mats) == {1, 2}
    assert mats[1].shape == (2, 3)
    assert abs(mats[2][1, 2] - 0.5 ** 6 * 2) < 1e-15


def test_creutz_ratio_guards_small_extents():
    """r or t < 2 must not wrap to negative indices (ADVICE r3): the
    chi(1,t) numerator would silently use the largest-R loops."""
    import math

    import numpy as np

    from latticeqcd_tpu.analysis import creutz_ratio

    w = np.exp(-0.3 * np.outer(np.arange(1, 5), np.arange(1, 5)))
    assert math.isnan(creutz_ratio(w, 1, 3))
    assert math.isnan(creutz_ratio(w, 3, 1))
    assert math.isnan(creutz_ratio(w, 5, 2))  # out of range too
    assert not math.isnan(creutz_ratio(w, 2, 2))


def test_read_wilson_loop_with_additional_string_prefix(tmp_path):
    """Flowed measurements prefix `{istep} {tau} ` via additional_string
    (lqcd.py:231); r,t,w must be parsed from the right (ADVICE r3)."""
    from latticeqcd_tpu.analysis import read_wilson_loop

    fn = tmp_path / "Wilson_loop.txt"
    fn.write_text(
        "5 3 0.15 2 3 0.125 # RxT wilson loop\n"
        "5 3 0.15 1 1 0.5 # RxT wilson loop\n"
    )
    mats = read_wilson_loop(fn)
    assert mats[5].shape == (2, 3)
    assert abs(mats[5][1, 2] - 0.125) < 1e-15
    assert abs(mats[5][0, 0] - 0.5) < 1e-15
