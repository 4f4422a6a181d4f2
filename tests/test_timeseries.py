"""Time-series operators: as-of vs merge_asof, despike parity, seasonal
DJF rule, validation-join band semantics, session dedup."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from coastsat_spark import kernels
from coastsat_spark.operators import timeseries as TS


def test_asof_forward_backward_match_pandas(spark):
    rng = np.random.default_rng(2)
    lts = pd.to_datetime("2021-01-01") + pd.to_timedelta(
        np.sort(rng.integers(0, 10**7, 300)), unit="s"
    )
    rts = pd.to_datetime("2021-01-01") + pd.to_timedelta(
        np.sort(rng.integers(0, 10**7, 500)), unit="s"
    )
    left = pd.DataFrame({"lts": lts, "k": np.arange(300)})
    right = pd.DataFrame({"rts": rts, "val": rng.normal(size=500)}).drop_duplicates("rts")
    ldf, rdf = spark.createDataFrame(left), spark.createDataFrame(right)
    for direction, pd_dir in (("forward", "forward"), ("backward", "backward")):
        # bucket must exceed the right series' max gap (~1.2e5 s here)
        for bucket in (None, 500_000.0):
            got = (
                TS.asof_join(
                    ldf, rdf, "lts", "rts", ["val"], direction=direction,
                    bucket_seconds=bucket,
                )
                .toPandas()
                .sort_values("k")
                .reset_index(drop=True)
            )
            exp = pd.merge_asof(
                left.sort_values("lts"), right.sort_values("rts"),
                left_on="lts", right_on="rts", direction=pd_dir,
            ).sort_values("k").reset_index(drop=True)
            a, b = got["val"].to_numpy(), exp["val"].to_numpy()
            mask = ~(np.isnan(a) & np.isnan(b))
            assert np.allclose(a[mask], b[mask]), (direction, bucket)


def test_asof_equal_ts_inclusive(spark):
    left = pd.DataFrame({"lts": [pd.Timestamp("2021-01-02")], "k": [0]})
    right = pd.DataFrame(
        {"rts": [pd.Timestamp("2021-01-01"), pd.Timestamp("2021-01-02")], "val": [1.0, 2.0]}
    )
    ldf, rdf = spark.createDataFrame(left), spark.createDataFrame(right)
    fwd = TS.asof_join(ldf, rdf, "lts", "rts", ["val"], "forward").collect()[0]["val"]
    bwd = TS.asof_join(ldf, rdf, "lts", "rts", ["val"], "backward").collect()[0]["val"]
    assert fwd == 2.0 and bwd == 2.0  # >= and <= both include the tie


def test_despike_spark_matches_kernel(spark):
    rng = np.random.default_rng(9)
    rows = []
    for tr in ["A", "B"]:
        base = np.cumsum(rng.normal(scale=0.05, size=40)) + 1.5
        base[[7, 19]] += 3.0  # spikes
        months = pd.date_range("2020-01-01", periods=40, freq="MS")
        rows += [(tr, m.to_pydatetime(), float(v)) for m, v in zip(months, base)]
    pdf = pd.DataFrame(rows, columns=["transect", "scene_month", "chainage"])
    sdf = spark.createDataFrame(pdf)
    got = (
        TS.despike_timeseries(sdf, max_cross_change=1.0)
        .toPandas()
        .sort_values(["transect", "scene_month"])
        .reset_index(drop=True)
    )
    exps = []
    for tr, g in pdf.groupby("transect"):
        g = g.sort_values("scene_month")
        keep = kernels.despike(g["chainage"].to_numpy(), 1.0)
        exps.append(g[keep])
    exp = pd.concat(exps).sort_values(["transect", "scene_month"]).reset_index(drop=True)
    assert len(got) == len(exp)
    assert np.allclose(got["chainage"], exp["chainage"])


def test_season_bucket_djf_shift(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"ts": pd.to_datetime(["2020-12-15", "2021-01-10", "2021-02-28", "2021-03-01"])})
    )
    got = df.select(TS.season_bucket(F.col("ts")).alias("s")).toPandas()["s"].astype(str).tolist()
    assert got == ["2021-01-01", "2021-01-01", "2021-01-01", "2021-04-01"]


def test_monthly_average_cutoff(spark):
    months = pd.date_range("2020-01-01", periods=6, freq="MS")
    pdf = pd.DataFrame(
        {
            "transect": "A",
            "scene_month": np.repeat(months, 2),
            "chainage": np.arange(12, dtype=float),
        }
    )
    out = TS.monthly_average(spark.createDataFrame(pdf)).toPandas()
    # last label 2020-06-15 vs cutoff = 2020-06-01 - 30d = 2020-05-02 →
    # June AND May dropped
    assert str(out["month_label"].max()) == "2020-04-15"


def test_trend_matches_numpy(spark):
    months = pd.date_range("2020-01-01", periods=24, freq="MS")
    y = 1.0 + 0.4 * np.arange(24) / 12.0 + np.sin(np.arange(24)) * 0.01
    pdf = pd.DataFrame({"transect": "A", "scene_month": months, "chainage": y})
    out = TS.trend(spark.createDataFrame(pdf)).toPandas().iloc[0]
    x = (months - months.min()).total_seconds() / (365.25 * 86400)
    slope, intercept = np.polyfit(x, y, 1)
    assert abs(out["trend"] - slope) < 1e-6
    assert abs(out["intercept"] - intercept) < 1e-6


def test_validation_join_bands(spark):
    sat = pd.DataFrame(
        {
            "transect": ["A"] * 4,
            "scene_month": pd.to_datetime(
                ["2021-01-10", "2021-02-10", "2021-03-15", "2021-06-01"]
            ),
            "chainage": [10.0, 20.0, 30.0, 40.0],
        }
    )
    survey = pd.DataFrame(
        {
            "transect": ["A"] * 4,
            "ts": pd.to_datetime(["2021-01-09", "2021-02-05", "2021-02-14", "2021-03-30"]),
            "chainage": [1.0, 2.0, 3.0, 4.0],
        }
    )
    out = (
        TS.validation_join(spark.createDataFrame(sat), spark.createDataFrame(survey))
        .toPandas()
        .sort_values("scene_month")
        .reset_index(drop=True)
    )
    # 01-10: 1 day from 01-09 -> closest (1.0)
    assert out["survey_chainage"][0] == 1.0
    # 02-10: 5 days before / 4 after -> interpolate between 02-05 and 02-14
    x = (pd.Timestamp("2021-02-10") - pd.Timestamp("2021-02-05")).days
    span = (pd.Timestamp("2021-02-14") - pd.Timestamp("2021-02-05")).days
    assert abs(out["survey_chainage"][1] - (2.0 + (3.0 - 2.0) * x / span)) < 1e-9
    # 03-15: 29d before next survey? prev 02-14 (29d), next 03-30 (15d) -> >10d -> null
    assert pd.isna(out["survey_chainage"][2])
    # 06-01: >10 days from everything -> null
    assert pd.isna(out["survey_chainage"][3])


def test_dedup_close_timestamps_keeps_best(spark):
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                [
                    "2021-01-01 00:00:00",
                    "2021-01-01 00:03:00",  # within 5 min of previous
                    "2021-01-01 01:00:00",
                ]
            ),
            "grp": ["g"] * 3,
            "quality": [1.0, 5.0, 2.0],
            "rid": [0, 1, 2],
        }
    )
    out = (
        TS.dedup_close_timestamps(
            spark.createDataFrame(pdf),
            ts_col="ts",
            gap_seconds=300,
            priority=[F.desc("quality")],
            partition_cols=["grp"],
            tiebreakers=[F.asc("rid")],
        )
        .toPandas()
        .sort_values("rid")
    )
    assert out["rid"].tolist() == [1, 2]


def test_tidal_correction_formula(spark):
    pdf = pd.DataFrame({"chainage": [10.0], "tide": [0.5]})
    out = TS.tidal_correction(spark.createDataFrame(pdf), beach_slope=0.1).collect()[0]
    assert abs(out["chainage_corrected"] - 15.0) < 1e-12


def test_same_day_mode_dedup(spark):
    """W2 (filter_S2_collection): majority zone kept, same-day cap of 2,
    single-zone sites pass through uncapped."""
    rows = []
    # site A: zones 32 (majority, 5 rows) and 33 (2 rows); day 1 has three
    # zone-32 scenes -> capped to 2; zone-33 scenes dropped entirely
    for h, z in [(1, 32), (2, 32), (3, 32), (4, 33), (30, 33), (26, 32), (50, 32)]:
        rows.append(("A", len(rows), pd.Timestamp("2024-03-01") + pd.Timedelta(hours=h), z))
    # site B: single zone, 3 same-day scenes -> all kept (no cap)
    for h in (1, 2, 3):
        rows.append(("B", len(rows), pd.Timestamp("2024-03-01") + pd.Timedelta(hours=h), 17))
    sdf = spark.createDataFrame(
        pd.DataFrame(rows, columns=["site", "scene_id", "ts", "zone"])
    )
    out = TS.same_day_mode_dedup(
        sdf, ts_col="ts", zone_col="zone", cap=2,
        partition_cols=["site"], tiebreakers=[F.asc("scene_id")],
    ).toPandas()
    kept = set(out["scene_id"])
    # site A day 1 (hours 1,2,3 zone 32) capped to first two; zone 33 gone
    assert {0, 1} <= kept and 2 not in kept
    assert 3 not in kept and 4 not in kept
    # day-2 zone-32 scenes kept (hours 26, 50 are days 2 and 3)
    assert {5, 6} <= kept
    # site B: all three kept despite same day (single zone -> passthrough)
    assert {7, 8, 9} <= kept
    assert len(kept) == 7


def test_sessionize_gap_semantics(spark):
    from datetime import datetime as DT

    from coastsat_spark.operators.timeseries import sessionize

    rows = [
        # user 1: three events 10 min apart -> one session
        (1, DT(2024, 1, 1, 0, 0, 0), 1, 1.0),
        (2, DT(2024, 1, 1, 0, 10, 0), 1, 2.0),
        (3, DT(2024, 1, 1, 0, 20, 0), 1, 3.0),
        # gap of exactly 1800s -> SAME session (break requires > gap)
        (4, DT(2024, 1, 1, 0, 50, 0), 1, 4.0),
        # gap of 1800.000001s -> new session
        (5, DT(2024, 1, 1, 1, 20, 0, 1), 1, 5.0),
        # user 2: single event -> singleton session, duration 0
        (6, DT(2024, 1, 1, 9, 0, 0), 2, 7.5),
    ]
    ev = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])
    out = {
        (r["user_id"], r["session_id"]): r
        for r in sessionize(ev, gap_seconds=1800.0).collect()
    }
    assert set(out) == {(1, 1), (1, 2), (2, 1)}
    s11 = out[(1, 1)]
    assert s11["n_events"] == 4 and s11["total_value"] == 10.0
    assert s11["duration_s"] == 3000.0
    s12 = out[(1, 2)]
    assert s12["n_events"] == 1 and s12["duration_s"] == 0.0
    assert out[(2, 1)]["n_events"] == 1 and out[(2, 1)]["total_value"] == 7.5
