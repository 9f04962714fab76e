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
