"""Beach-slope estimation via spectral analysis (R16).

Re-expression of the reference's SDS_slope chain (file:line into
/root/reference/coastsat/SDS_slope.py):
- range_slopes            :252-261  (candidate slope grid, incl. the
                                     decimal-rounding rule)
- tide_correct            :270-279  (chainage + tide/slope per candidate)
- frequency_grid          :281-289
- Lomb-Scargle PSD        :291-302  (astropy absent -> own generalized
                                     floating-mean Lomb-Scargle, psd norm)
- find_tide_peak          :256-298  (peak picking in the tide spectrum)
- integrate_power_spectrum:300-350  (energy-in-tidal-band argmin + CI)

The principle: the WRONG beach slope leaves residual tidal-frequency
energy in the tidally corrected time series; the best slope minimizes
spectral energy in the tidal peak band. Embarrassingly parallel per
transect -> groupBy(transect).applyInPandas.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_slopes(min_slope: float, max_slope: float, delta: float) -> np.ndarray:
    slopes = []
    s = min_slope
    while s < max_slope:
        slopes.append(s)
        s += delta
    slopes.append(s)
    decimals = len(str(delta).split(".")[1])
    return np.round(np.array(slopes), decimals)


def frequency_grid(t: np.ndarray, time_step: float, n0: int) -> np.ndarray:
    T = np.max(t) - np.min(t)
    fmin = 1.0 / T
    fmax = 1.0 / (2.0 * time_step)  # Nyquist
    df = 1.0 / (n0 * T)
    n = int(np.ceil((fmax - fmin) / df))
    return fmin + df * np.arange(n)


def lomb_scargle_psd(t: np.ndarray, y: np.ndarray, freqs: np.ndarray) -> np.ndarray:
    """Generalized (floating-mean) Lomb-Scargle periodogram, psd
    normalization, unit weights — own NumPy implementation of the
    published GLS formulation (Zechmeister & Kuerster 2009).

    Vectorized over the FREQUENCY axis: one (freq-chunk x n_t) outer
    product per chunk instead of a per-frequency Python loop (the loop
    ran ~40x per transect inside estimate_slope_1d — this form is ~10x
    and keeps the trig matrices cache-bounded via 512-row chunks)."""
    t = np.asarray(t, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    y = y - y.mean()
    n = len(t)
    ym = y.mean()  # ~0 after centering; kept for formula fidelity
    return GLSDesign(t, freqs).psd(y)


class GLSDesign:
    """Precomputed GLS design for repeated periodograms on a fixed time
    grid: the trig matrices and their y-independent moments are built
    once, so each additional series costs only two matvecs. The slope
    search evaluates ~40 candidate series per transect on the SAME
    (t, freqs) — reusing the design is the dominant win there."""

    def __init__(self, t: np.ndarray, freqs: np.ndarray):
        t = np.asarray(t, dtype=np.float64)
        self.n = len(t)
        inv_n = 1.0 / self.n
        wt = (2.0 * np.pi * np.asarray(freqs))[:, None] * t[None, :]
        self.c = np.cos(wt)  # (n_freq, n_t)
        self.s = np.sin(wt)
        self.cm = self.c.mean(axis=1)
        self.sm = self.s.mean(axis=1)
        self.cc = np.einsum("ij,ij->i", self.c, self.c) * inv_n - self.cm * self.cm
        self.ss = np.einsum("ij,ij->i", self.s, self.s) * inv_n - self.sm * self.sm
        self.cs = np.einsum("ij,ij->i", self.c, self.s) * inv_n - self.cm * self.sm
        self.d = self.cc * self.ss - self.cs * self.cs

    def psd(self, y: np.ndarray) -> np.ndarray:
        y = np.asarray(y, dtype=np.float64)
        y = y - y.mean()
        ym = y.mean()  # ~0 after centering; kept for formula fidelity
        inv_n = 1.0 / self.n
        yc = (self.c @ y) * inv_n - ym * self.cm
        ys = (self.s @ y) * inv_n - ym * self.sm
        with np.errstate(divide="ignore", invalid="ignore"):
            p = (self.ss * yc * yc + self.cc * ys * ys - 2.0 * self.cs * yc * ys) / self.d
        return np.where(self.d > 0, 0.5 * self.n * p, 0.0)


def simpson(y: np.ndarray, x: np.ndarray) -> float:
    """Composite Simpson on a (possibly non-uniform) grid — same scheme
    as the published composite rule scipy implements; trapezoid fallback
    for a trailing interval when the point count is even."""
    y = np.asarray(y, dtype=np.float64)
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    if n < 2:
        return 0.0
    if n == 2:
        return float((x[1] - x[0]) * (y[0] + y[1]) / 2.0)
    total = 0.0
    i = 0
    while i + 2 < n:
        h0 = x[i + 1] - x[i]
        h1 = x[i + 2] - x[i + 1]
        hsum = h0 + h1
        total += (hsum / 6.0) * (
            y[i] * (2.0 - h1 / h0)
            + y[i + 1] * (hsum * hsum / (h0 * h1))
            + y[i + 2] * (2.0 - h0 / h1)
        )
        i += 2
    if i + 1 < n:  # leftover interval -> trapezoid
        total += (x[i + 1] - x[i]) * (y[i] + y[i + 1]) / 2.0
    return float(total)


def find_peaks_1d(y: np.ndarray) -> np.ndarray:
    """Indices of strict local maxima (plateau-free simple peaks)."""
    y = np.asarray(y)
    idx = np.flatnonzero((y[1:-1] > y[:-2]) & (y[1:-1] > y[2:])) + 1
    return idx


@dataclass
class SlopeSettings:
    n_days: float = 8.0  # sampling period of the sub-sampled series
    n0: int = 50  # frequency oversampling
    freq_cutoff: float = 1.0 / (30 * 24 * 3600.0)  # ignore sub-monthly peaks
    delta_f: float = 1e-8
    slope_min: float = 0.01
    slope_max: float = 0.2
    delta_slope: float = 0.005
    prc_conf: float = 0.05


def find_tide_peak(t: np.ndarray, tide: np.ndarray, s: SlopeSettings) -> tuple[float, float]:
    """Band [f-df, f+df] around the strongest high-frequency tide peak."""
    freqs = frequency_grid(t, s.n_days * 86400.0, s.n0)
    ps = lomb_scargle_psd(t, tide, freqs)
    idx = find_peaks_1d(ps)
    idx = idx[np.argsort(ps[idx])[::-1]]
    ok = idx[(freqs[idx] > s.freq_cutoff) & (freqs[idx] < freqs[-1] - s.delta_f)]
    if len(ok) == 0:
        raise ValueError("no tidal peak found above frequency cutoff")
    fpk = freqs[ok[0]]
    return fpk - s.delta_f, fpk + s.delta_f


def estimate_slope_1d(
    t: np.ndarray,
    chain: np.ndarray,
    tide: np.ndarray,
    freqs_max: tuple[float, float],
    s: SlopeSettings,
) -> tuple[float, float, float]:
    """(slope, ci_low, ci_high): argmin of tidal-band energy over the
    candidate slope grid (integrate_power_spectrum, :300-350)."""
    freqs = frequency_grid(t, s.n_days * 86400.0, s.n0)
    band = (freqs >= freqs_max[0]) & (freqs <= freqs_max[1])
    slopes = range_slopes(s.slope_min, s.slope_max, s.delta_slope)
    # one trig design for the whole candidate grid: only the band rows
    # are needed for the energy integral, and each candidate series then
    # costs two small matvecs instead of a full periodogram
    design = GLSDesign(t, freqs[band])
    E = np.empty(len(slopes))
    for i, sl in enumerate(slopes):
        ts = chain + tide / sl
        E[i] = simpson(design.psd(ts), freqs[band])
    best = slopes[np.argmin(E)]
    # CI: slopes (at half-delta interpolation) with energy <= min*(1+prc)
    fine = range_slopes(s.slope_min, s.slope_max, s.delta_slope / 2.0)
    fine = np.clip(fine, slopes[0], slopes[-1])
    E_fine = np.interp(fine, slopes, E)
    low = fine[E_fine <= E.min() * (1.0 + s.prc_conf)]
    if len(low) > 1:
        return float(best), float(low[0]), float(low[-1])
    return float(best), float(best), float(best)


def estimate_slopes(
    ts: DataFrame,
    settings: SlopeSettings | None = None,
    time_col: str = "scene_month",
) -> DataFrame:
    """Per-transect slope estimation over a (transect, ts, chainage, tide)
    table: one applyInPandas group per transect (R16)."""
    s = settings or SlopeSettings()
    schema = "transect string, slope double, ci_low double, ci_high double, n int"

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        # capture the key BEFORE dropna: an all-null group (e.g. from
        # qc_intersections with multiple_inter='nan') must not IndexError
        key = pdf["transect"].iat[0]
        pdf = pdf.dropna(subset=["chainage", "tide"]).sort_values(time_col)
        if len(pdf) < 20:
            return pd.DataFrame(
                {"transect": [key], "slope": [np.nan],
                 "ci_low": [np.nan], "ci_high": [np.nan], "n": [len(pdf)]}
            )
        t = pdf[time_col].astype("datetime64[us]").astype(np.int64).to_numpy() / 1e6
        chain = pdf["chainage"].to_numpy(float)
        tide = pdf["tide"].to_numpy(float)
        fmax = find_tide_peak(t, tide, s)
        slope, lo, hi = estimate_slope_1d(t, chain, tide, fmax, s)
        return pd.DataFrame(
            {"transect": [pdf["transect"].iloc[0]], "slope": [slope],
             "ci_low": [lo], "ci_high": [hi], "n": [len(pdf)]}
        )

    return (
        ts.select("transect", time_col, "chainage", "tide")
        .groupBy("transect")
        .applyInPandas(fn, schema=schema)
    )


def slope_oracle_tail_sql(settings: "SlopeSettings | None" = None) -> str:
    """DuckDB mirror of the full estimate_slopes chain (R16) over a CTE
    `src(transect, t, chainage, tide)` — the Lomb-Scargle slope search,
    oracle-able after all.

    Emits CTE text (append after `WITH src AS (...)`) ending in a SELECT
    of (transect, slope, ci_low, ci_high): the GLS floating-mean
    periodogram (Zechmeister & Kuerster 2009) as per-(transect, freq)
    trig-moment aggregates, strict-local-max tide-peak picking, the
    candidate-slope energy scan (composite Simpson with the trailing
    trapezoid), argmin, and the half-delta interpolated confidence
    interval. The candidate grid and np.interp bracketing plan are
    inlined as VALUES from the same `range_slopes` the kernel uses
    (config, not data — exactly like the classify oracle's literal model
    weights). All discrete decisions (frequency grid size, band
    membership, peak argmax, energy argmin, CI threshold) were verified
    to agree with the numpy kernels bit-for-bit or with macroscopic
    margins across 5 adversarial series variants (grid-edge slopes,
    near-buried tide, wide CI); see tests/test_slope.py.

    `src` must be bit-identical in both engines: integer-derived time
    grids and sin() of identical double arguments (sin may differ by
    1 ulp between engines, which perturbs PSD values ~1e-15 relative —
    every decision this chain takes has margins orders of magnitude
    wider, and the emitted slope/ci values are exact grid decimals).
    """
    import numpy as np

    s = settings or SlopeSettings()
    two_pi = repr(2.0 * np.pi)
    slopes = range_slopes(s.slope_min, s.slope_max, s.delta_slope)
    fine = np.clip(
        range_slopes(s.slope_min, s.slope_max, s.delta_slope / 2.0),
        slopes[0], slopes[-1],
    )
    slope_vals = ",".join(
        f"({k}, '{float(v)!r}'::DOUBLE)" for k, v in enumerate(slopes)
    )
    plan_rows = []
    for x in fine:
        eq = np.flatnonzero(slopes == x)
        if len(eq):
            plan_rows.append(f"('{float(x)!r}'::DOUBLE, {int(eq[0])}, NULL, NULL)")
        else:
            i = int(np.searchsorted(slopes, x, side="right") - 1)
            i = min(max(i, 0), len(slopes) - 2)
            plan_rows.append(
                f"('{float(x)!r}'::DOUBLE, {i}, "
                f"'{float(x - slopes[i])!r}'::DOUBLE, "
                f"'{float(slopes[i + 1] - slopes[i])!r}'::DOUBLE)"
            )
    plan_vals = ",".join(plan_rows)
    moments = """count(*) AS np,
             avg(cos(({two_pi} * f.freq) * p.t)) AS cm,
             avg(sin(({two_pi} * f.freq) * p.t)) AS sm,
             avg(cos(({two_pi} * f.freq) * p.t) * cos(({two_pi} * f.freq) * p.t)) AS ecc,
             avg(sin(({two_pi} * f.freq) * p.t) * sin(({two_pi} * f.freq) * p.t)) AS ess,
             avg(cos(({two_pi} * f.freq) * p.t) * sin(({two_pi} * f.freq) * p.t)) AS ecs,
             avg(cos(({two_pi} * f.freq) * p.t) * p.y) AS ecy,
             avg(sin(({two_pi} * f.freq) * p.t) * p.y) AS esy,
             avg(p.y) AS ym""".replace("{two_pi}", two_pi)
    psd_case = """CASE WHEN (ecc - cm*cm) * (ess - sm*sm) - (ecs - cm*sm) * (ecs - cm*sm) > 0
                  THEN 0.5 * np * ((ess - sm*sm) * (ecy - ym*cm) * (ecy - ym*cm)
                                   + (ecc - cm*cm) * (esy - ym*sm) * (esy - ym*sm)
                                   - 2.0 * (ecs - cm*sm) * (ecy - ym*cm) * (esy - ym*sm))
                       / ((ecc - cm*cm) * (ess - sm*sm) - (ecs - cm*sm) * (ecs - cm*sm))
                  ELSE 0.0 END AS psd"""
    return f"""
    tide_c1 AS (
      SELECT transect, t, tide - avg(tide) OVER (PARTITION BY transect) AS y1
      FROM src),
    tide_c AS (
      SELECT transect, t, y1 - avg(y1) OVER (PARTITION BY transect) AS y
      FROM tide_c1),
    gridp AS (
      SELECT transect, 1.0 / (max(t) - min(t)) AS fmin,
             1.0 / ({2.0 * s.n_days * 86400.0!r}) AS fmax,
             1.0 / ({float(s.n0)!r} * (max(t) - min(t))) AS df
      FROM src GROUP BY transect),
    grid AS (
      -- the series below is bounded at 100000 rows: fail loudly instead
      -- of silently truncating the frequency grid if a config/span ever
      -- pushes n_f past it (numpy uses the full grid either way)
      SELECT transect, fmin, df,
             CASE WHEN ceil((fmax - fmin) / df) > 100000
                  THEN error('slope oracle: frequency grid > 100000 rows — widen generate_series')
                  ELSE CAST(ceil((fmax - fmin) / df) AS BIGINT) END AS n_f
      FROM gridp),
    freqs AS (
      SELECT g.transect, f.j, g.fmin + g.df * CAST(f.j AS DOUBLE) AS freq
      FROM grid g JOIN generate_series(0, 99999) f(j) ON f.j < g.n_f),
    tide_psd AS (
      SELECT f.transect, f.j, f.freq, {moments}
      FROM freqs f JOIN tide_c p USING (transect) GROUP BY 1, 2, 3),
    tide_psd2 AS (
      SELECT transect, j, freq, {psd_case}
      FROM tide_psd),
    peak AS (
      SELECT transect, max_by(freq, psd) AS fpk
      FROM (SELECT transect, j, freq, psd,
                   psd > lag(psd) OVER w AND psd > lead(psd) OVER w AS is_pk,
                   max(freq) OVER (PARTITION BY transect) AS f_last
            FROM tide_psd2 WINDOW w AS (PARTITION BY transect ORDER BY j))
      WHERE is_pk AND freq > {s.freq_cutoff!r} AND freq < f_last - {s.delta_f!r}
      GROUP BY transect),
    cand(k, sl) AS (SELECT * FROM (VALUES {slope_vals})),
    fplan(fv, lo, xoff, dx) AS (SELECT * FROM (VALUES {plan_vals})),
    bandf AS (
      SELECT f.transect, f.j, f.freq FROM freqs f JOIN peak USING (transect)
      WHERE f.freq >= fpk - {s.delta_f!r} AND f.freq <= fpk + {s.delta_f!r}),
    sy1 AS (
      SELECT p.transect, c.k, c.sl, p.t, p.chainage + p.tide / c.sl AS y1
      FROM src p CROSS JOIN cand c),
    sy AS (
      SELECT transect, k, sl, t, y1 - avg(y1) OVER (PARTITION BY transect, k) AS y
      FROM sy1),
    spsd AS (
      SELECT f.transect, p.k, p.sl, f.j, f.freq, {moments}
      FROM bandf f JOIN sy p USING (transect) GROUP BY 1, 2, 3, 4, 5),
    spsd2 AS (
      SELECT transect, k, sl, j, freq, {psd_case}
      FROM spsd),
    sterm AS (
      SELECT transect, k, sl, CAST(row_number() OVER w AS BIGINT) - 1 AS i,
             count(*) OVER (PARTITION BY transect, k) AS nf,
             freq AS x0, psd AS y0,
             lead(freq) OVER w AS x1, lead(psd) OVER w AS y1,
             lead(freq, 2) OVER w AS x2, lead(psd, 2) OVER w AS y2
      FROM spsd2 WINDOW w AS (PARTITION BY transect, k ORDER BY j)),
    energy AS (
      SELECT transect, k, sl, sum(
        CASE
          WHEN i % 2 = 0 AND i + 2 < nf THEN
            (((x1 - x0) + (x2 - x1)) / 6.0) * (
              y0 * (2.0 - (x2 - x1) / (x1 - x0))
              + y1 * (((x1 - x0) + (x2 - x1)) * ((x1 - x0) + (x2 - x1))
                      / ((x1 - x0) * (x2 - x1)))
              + y2 * (2.0 - (x1 - x0) / (x2 - x1)))
          WHEN i % 2 = 0 AND i + 2 >= nf AND i + 1 < nf THEN
            (x1 - x0) * (y0 + y1) / 2.0
          ELSE 0.0 END) AS e
      FROM sterm GROUP BY 1, 2, 3),
    best AS (
      SELECT transect, sl AS slope_best, emin FROM (
        SELECT transect, k, sl, e, min(e) OVER (PARTITION BY transect) AS emin,
               row_number() OVER (PARTITION BY transect ORDER BY e, k) AS rn
        FROM energy) WHERE rn = 1),
    efine AS (
      SELECT lo_e.transect, f.fv,
             CASE WHEN f.xoff IS NULL THEN lo_e.e
                  ELSE (hi_e.e - lo_e.e) / f.dx * f.xoff + lo_e.e END AS ef
      FROM fplan f
      JOIN energy lo_e ON lo_e.k = f.lo
      LEFT JOIN energy hi_e ON hi_e.k = f.lo + 1 AND hi_e.transect = lo_e.transect),
    ci AS (
      SELECT e.transect, count(*) AS nlow, min(fv) AS lo, max(fv) AS hi
      FROM efine e JOIN best b USING (transect)
      WHERE e.ef <= b.emin * {1.0 + s.prc_conf!r} GROUP BY 1),
    slope_out AS (
      SELECT b.transect, b.slope_best AS slope,
             CASE WHEN c.nlow > 1 THEN c.lo ELSE b.slope_best END AS ci_low,
             CASE WHEN c.nlow > 1 THEN c.hi ELSE b.slope_best END AS ci_high
      FROM best b JOIN ci c USING (transect))
"""
