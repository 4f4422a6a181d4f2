"""Slope estimation: the engine must recover a planted beach slope from
a tidally contaminated chainage series (R16 end-to-end property)."""

import numpy as np
import pandas as pd
import pytest

from coastsat_spark.operators import slope as SL


def _series(true_slope=0.1, n=180, step_days=8.0, seed=3):
    rng = np.random.default_rng(seed)
    t = np.arange(n) * step_days * 86400.0
    # M2-aliased-ish tide sampled at 8-day cadence + spring-neap envelope
    tide = 0.5 * np.sin(2 * np.pi * t / (12.4206 * 3600)) + 0.2 * np.sin(
        2 * np.pi * t / (14.77 * 86400)
    )
    seasonal = 5.0 * np.sin(2 * np.pi * t / (365.25 * 86400))
    noise = rng.normal(scale=0.3, size=n)
    # observed chainage = true cross-shore + horizontal tide displacement
    chain = 50.0 + seasonal + noise - tide / true_slope
    return t, chain, tide


def test_frequency_grid_shape():
    t = np.arange(100) * 8 * 86400.0
    freqs = SL.frequency_grid(t, 8 * 86400.0, 50)
    assert freqs[0] == pytest.approx(1.0 / (t.max() - t.min()))
    assert freqs[-1] <= 1.0 / (2 * 8 * 86400.0)


def test_lomb_scargle_finds_planted_frequency():
    t = np.sort(np.random.default_rng(1).uniform(0, 100 * 86400, 300))
    f0 = 1.0 / (5 * 86400.0)
    y = np.sin(2 * np.pi * f0 * t)
    freqs = np.linspace(1 / (100 * 86400), 1 / (2 * 86400), 2000)
    ps = SL.lomb_scargle_psd(t, y, freqs)
    assert abs(freqs[np.argmax(ps)] - f0) / f0 < 0.02


def test_simpson_matches_analytic():
    x = np.linspace(0, np.pi, 101)
    assert SL.simpson(np.sin(x), x) == pytest.approx(2.0, abs=1e-6)
    # non-uniform grid
    x = np.sort(np.random.default_rng(2).uniform(0, 1, 51))
    x[0], x[-1] = 0.0, 1.0
    assert SL.simpson(3 * x**2, x) == pytest.approx(1.0, abs=5e-3)


def test_range_slopes_rounding():
    s = SL.range_slopes(0.01, 0.2, 0.005)
    assert s[0] == 0.01 and s[-1] >= 0.2
    assert np.all(np.round(s, 3) == s)


def test_recovers_planted_slope_numpy():
    true_slope = 0.1
    t, chain, tide = _series(true_slope)
    s = SL.SlopeSettings()
    fmax = SL.find_tide_peak(t, tide, s)
    est, lo, hi = SL.estimate_slope_1d(t, chain, tide, fmax, s)
    assert abs(est - true_slope) <= 0.02, est
    assert lo <= est <= hi


def test_estimate_slopes_spark(spark):
    rows = []
    for tr, sl in [("A", 0.08), ("B", 0.15)]:
        t, chain, tide = _series(sl, seed=ord(tr))
        dates = pd.Timestamp("2020-01-01") + pd.to_timedelta(t, unit="s")
        rows += [
            (tr, d.to_pydatetime(), float(c), float(td))
            for d, c, td in zip(dates, chain, tide)
        ]
    pdf = pd.DataFrame(rows, columns=["transect", "scene_month", "chainage", "tide"])
    out = SL.estimate_slopes(spark.createDataFrame(pdf)).toPandas().set_index("transect")
    assert abs(out.loc["A", "slope"] - 0.08) <= 0.02
    assert abs(out.loc["B", "slope"] - 0.15) <= 0.03
