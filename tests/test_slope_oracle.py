"""SQL-vs-kernel parity for the Lomb-Scargle slope oracle: the DuckDB
mirror (slope_oracle_tail_sql) must reproduce find_tide_peak +
estimate_slope_1d exactly on adversarial series variants — grid-edge
slopes, near-buried tide, wide interpolated CIs. Spark-free."""

import math

import duckdb
import numpy as np

from coastsat_spark.operators import slope as SL

N = 150
P1 = 2 * math.pi / (12.4206 * 3600)
P2 = 2 * math.pi / (14.77 * 86400)
P3 = 2 * math.pi / (365.25 * 86400)
P4 = 2 * math.pi / (97.3 * 86400)  # incommensurate wobble

VARIANTS = [
    # (slope_a, slope_b, tide_amp1, tide_amp2, seasonal_amp, wobble_amp)
    (0.08, 0.15, 0.5, 0.2, 5.0, 0.0),     # the registered query's shape
    (0.1, 0.2, 0.1, 0.05, 8.0, 2.0),      # weak tide, big wobble -> wide CI
    (0.01, 0.035, 0.5, 0.2, 2.0, 1.0),    # grid-edge slopes
    (0.06, 0.09, 0.05, 0.02, 3.0, 4.0),   # tide nearly buried
]


def _src_sql(va, vb, a1, a2, sa, wa):
    step = 8.0 * 86400.0
    return f"""
    src AS (
      SELECT transect, tr AS t, tide,
             {50.0!r} + {sa!r} * sin(tr * {P3!r}) + {wa!r} * sin(tr * {P4!r})
               - tide / sl_true AS chainage
      FROM (
        SELECT CASE WHEN id < {N} THEN 'T_A' ELSE 'T_B' END AS transect,
               CASE WHEN id < {N} THEN {va!r} ELSE {vb!r} END AS sl_true,
               CAST(id % {N} AS DOUBLE) * {step!r} AS tr,
               {a1!r} * sin(CAST(id % {N} AS DOUBLE) * {step!r} * {P1!r})
                 + {a2!r} * sin(CAST(id % {N} AS DOUBLE) * {step!r} * {P2!r}) AS tide
        FROM generate_series(0, {2 * N - 1}) g(id)
      )
    )"""


def test_slope_sql_matches_kernels_on_variants():
    s = SL.SlopeSettings()
    for va, vb, a1, a2, sa, wa in VARIANTS:
        want = {}
        for name, sl_true in (("T_A", va), ("T_B", vb)):
            i = np.arange(N, dtype=np.float64)
            t = i * (8.0 * 86400.0)
            tide = a1 * np.sin(t * P1) + a2 * np.sin(t * P2)
            chain = 50.0 + sa * np.sin(t * P3) + wa * np.sin(t * P4) - tide / sl_true
            band = SL.find_tide_peak(t, tide, s)
            want[name] = SL.estimate_slope_1d(t, chain, tide, band, s)
        q = f"""
        WITH {_src_sql(va, vb, a1, a2, sa, wa)},
        {SL.slope_oracle_tail_sql(s)}
        SELECT transect, slope, ci_low, ci_high FROM slope_out ORDER BY 1
        """
        got = {r[0]: (r[1], r[2], r[3]) for r in duckdb.sql(q).fetchall()}
        assert got == want, f"variant {(va, vb, a1, a2, sa, wa)}: {got} != {want}"


def test_slope_sql_recovers_planted_slopes():
    q = f"""
    WITH {_src_sql(0.08, 0.15, 0.5, 0.2, 5.0, 0.0)},
    {SL.slope_oracle_tail_sql()}
    SELECT transect, slope FROM slope_out ORDER BY 1
    """
    assert duckdb.sql(q).fetchall() == [("T_A", 0.08), ("T_B", 0.15)]
