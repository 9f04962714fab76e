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


# ---------------------------------------------------------------------------
# Gradient-flow scale setting (t0 / w0)
# ---------------------------------------------------------------------------


def test_t0_w0_exact_on_linear_t2e():
    """For t^2 E = c t (i.e. E = c/t), both scales are analytic:
    t0 = 0.3/c exactly (linear interpolation is exact on a line), and
    W(t) = t d/dt(c t) = c t crosses 0.3 at the same point, so
    w0 = sqrt(0.3/c). Centered differences are exact on a linear y."""
    from latticeqcd_tpu.analysis import t0_scale, w0_scale

    c = 1.7
    taus = np.linspace(0.02, 0.5, 25)
    e = c / taus  # => t^2 E = c t
    t0 = t0_scale(taus, e)
    w0 = w0_scale(taus, e)
    assert abs(t0 - 0.3 / c) < 1e-12
    assert abs(w0 - np.sqrt(0.3 / c)) < 1e-9


def test_t0_quadratic_interpolation_error_bounded():
    """t^2 E = a t^2: crossing at t0 = sqrt(0.3/a); linear interpolation
    on a fine grid lands within one grid spacing's curvature error."""
    from latticeqcd_tpu.analysis import t0_scale

    a = 4.0
    taus = np.linspace(0.01, 0.6, 240)
    t0 = t0_scale(taus, np.full_like(taus, a))  # E = a => t^2 E = a t^2
    exact = np.sqrt(0.3 / a)
    assert abs(t0 - exact) < 1e-4


def test_flow_scales_no_crossing_is_nan():
    from latticeqcd_tpu.analysis import t0_scale, w0_scale

    taus = np.linspace(0.02, 0.2, 10)
    e = np.full_like(taus, 1e-6)  # t^2 E stays far below 0.3
    assert np.isnan(t0_scale(taus, e))
    assert np.isnan(w0_scale(taus, e))
    assert np.isnan(w0_scale(taus[:2], e[:2]))  # <3 points: no derivative


def test_read_flow_series_driver_format(tmp_path):
    """Pins the driver's flowed-line contract: `{itrj} {itrj} {istep}
    {tau} {value} # name` (lqcd.py flowed-measurement loop), value and
    tau right-anchored, mean over trajectories at fixed tau."""
    from latticeqcd_tpu.analysis import read_flow_series, t0_scale

    f = tmp_path / "Energy_density_flow.txt"
    lines = []
    c = 2.0
    for itrj in (10, 20):  # two trajectories, same flow grid
        for istep, tau in enumerate((0.1, 0.2, 0.3), start=1):
            val = c / tau + (0.01 if itrj == 20 else -0.01)  # mean = c/tau
            lines.append(f"{itrj} {itrj} {istep} {tau} {val} # energydensity")
    f.write_text("\n".join(lines) + "\n")
    taus, e = read_flow_series(str(f))
    assert np.allclose(taus, [0.1, 0.2, 0.3])
    assert np.allclose(e, c / taus)
    assert abs(t0_scale(taus, e) - 0.3 / c) < 1e-12


# ---------------------------------------------------------------------------
# Pion effective mass
# ---------------------------------------------------------------------------


def test_effective_mass_cosh_exact_on_synthetic_correlator():
    """C(t) = A [e^{-mt} + e^{-m(T-t)}]: the cosh solver recovers m on
    EVERY usable timeslice, while the naive log drifts near T/2."""
    from latticeqcd_tpu.analysis import effective_mass

    m, t_ext, a = 0.73, 16, 2.4
    t = np.arange(t_ext)
    c = a * (np.exp(-m * t) + np.exp(-m * (t_ext - t)))
    me = effective_mass(c, periodic=True)
    usable = [j for j in range(t_ext - 1) if np.isfinite(me[j])]
    assert len(usable) >= t_ext - 3
    for j in usable:
        assert abs(me[j] - m) < 1e-8, (j, me[j])
    # the naive log underestimates approaching T/2 but matches at small t
    ml = effective_mass(c, periodic=False)
    assert abs(ml[1] - m) < 5e-3
    assert ml[t_ext // 2 - 2] < m - 1e-3


def test_effective_mass_handles_nonpositive_entries():
    from latticeqcd_tpu.analysis import effective_mass

    c = np.array([1.0, 0.5, -0.1, 0.2, 0.1, 0.05, 0.02, 0.01])
    me = effective_mass(c)
    assert np.isnan(me[1]) and np.isnan(me[2])  # slices touching c<=0


def test_cli_summarizes_pion_correlator_files(tmp_path, capsys):
    """The CLI quotes a cosh m_eff for Pion_correlator series files."""
    from latticeqcd_tpu.analysis import main

    m, t_ext = 0.6, 8
    t = np.arange(t_ext)
    c = np.exp(-m * t) + np.exp(-m * (t_ext - t))
    lines = []
    for itrj in (1, 2):
        lines.append(f"{itrj} " + " ".join(str(v) for v in c) + " ")
        lines.append("#pioncorrelator")
    (tmp_path / "Pion_correlator.txt").write_text("\n".join(lines) + "\n")
    assert main([str(tmp_path)]) == 0
    out = capsys.readouterr().out
    assert "m_eff" in out
    quoted = float(out.split("m_eff(t=2)=")[1].split()[0])
    assert abs(quoted - m) < 1e-6
