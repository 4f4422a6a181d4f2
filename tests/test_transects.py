"""Transect join parity: Spark column-math join vs an independent NumPy
implementation of the reference's rotation-matrix formulation
(SDS_transects.py:205-238), plus QC policy mode checks."""

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from coastsat_spark.operators import transects as TR


def reference_style_join(points: pd.DataFrame, trs: pd.DataFrame, along, max_origin, bearing):
    """Direct port of the reference geometry (rotation matrix + cross
    product) as an independent oracle for the column-math join."""
    rows = []
    for _, t in trs.iterrows():
        p1 = np.array([t.x0, t.y0])
        p2 = np.array([t.x1, t.y1])
        phi = math.atan2(p2[1] - p1[1], p2[0] - p1[0])
        mrot = np.array(
            [[math.cos(phi), math.sin(phi)], [-math.sin(phi), math.cos(phi)]]
        )
        sl = points[["lon", "lat"]].to_numpy()
        d_line = np.abs(np.cross(p2 - p1, sl - p1)) / np.linalg.norm(p2 - p1)
        d_origin = np.linalg.norm(sl - p1, axis=1)
        keep = (d_line <= along) & (d_origin <= max_origin)
        if bearing:
            phi_sl = np.arctan2(sl[:, 1] - p1[1], sl[:, 0] - p1[0])
            keep &= np.abs(phi - phi_sl) < np.pi / 2
        xy = (mrot @ (sl[keep] - p1).T).T
        for pi, chain in zip(points.index[keep], xy[:, 0]):
            rows.append((t.transect, int(pi), chain))
    return pd.DataFrame(rows, columns=["transect", "pid", "chainage"])


def _points_df(spark, n=400):
    rng = np.random.default_rng(5)
    lons = rng.uniform(-44, 44, n)
    from coastsat_spark.datagen import coast_lat

    lats = coast_lat(lons) + rng.normal(scale=0.5, size=n)
    pdf = pd.DataFrame(
        {
            "pid": np.arange(n),
            "lon": lons,
            "lat": lats,
            "scene_month": pd.Timestamp("2021-01-01"),
        }
    )
    return pdf, spark.createDataFrame(pdf)


def test_join_matches_reference_geometry(spark):
    pdf, sdf = _points_df(spark)
    trs = TR.make_transects_pdf(15)
    tdf = spark.createDataFrame(trs)
    for bearing in (True, False):
        got = (
            TR.transect_join(sdf, tdf, use_bearing=bearing)
            .select("transect", "pid", "chainage")
            .toPandas()
            .sort_values(["transect", "pid"])
            .reset_index(drop=True)
        )
        exp = (
            reference_style_join(pdf, trs, TR.ALONG_DIST, TR.MAX_DIST_ORIGIN, bearing)
            .sort_values(["transect", "pid"])
            .reset_index(drop=True)
        )
        assert len(got) == len(exp)
        assert (got["transect"].to_numpy() == exp["transect"].to_numpy()).all()
        assert (got["pid"].to_numpy() == exp["pid"].to_numpy()).all()
        assert np.allclose(got["chainage"], exp["chainage"], atol=1e-9)


def test_cell_join_equals_broadcast_join(spark):
    pdf, sdf = _points_df(spark)
    trs = TR.make_transects_pdf(15)
    tdf = spark.createDataFrame(trs)
    a = (
        TR.transect_join(sdf, tdf)
        .select("transect", "pid")
        .toPandas()
        .sort_values(["transect", "pid"])
        .reset_index(drop=True)
    )
    b = (
        TR.transect_join_cells(sdf, tdf, trs, res=6)
        .select("transect", "pid")
        .toPandas()
        .sort_values(["transect", "pid"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def _qc_reference(stats: pd.DataFrame, n_scenes, max_std, max_range, min_points, mode, auto_prc):
    out = {}
    for tr, g in stats.groupby("transect"):
        med = g["med"].to_numpy().astype(float)
        std = g["std"].to_numpy().astype(float)
        rng_ = g["mx"].to_numpy() - g["mn"].to_numpy()
        n = g["n"].to_numpy()
        good = (std <= max_std) & (rng_ <= max_range) & (n >= min_points)
        res = med.copy()
        if mode == "nan":
            res[~good] = np.nan
        elif mode == "max":
            res[~good] = g["mx"].to_numpy()[~good]
            res[n < min_points] = np.nan
        else:  # auto
            prc_over = np.sum(std > max_std) / n_scenes
            if prc_over > auto_prc:
                res[~good] = g["mx"].to_numpy()[~good]
                res[n < min_points] = np.nan
            else:
                res[~good] = np.nan
        for sm, v in zip(g["scene_month"], res):
            out[(tr, sm)] = v
    return out


def _synthetic_pairs(spark):
    rng = np.random.default_rng(11)
    rows = []
    months = pd.date_range("2020-01-01", periods=10, freq="QS")
    for tr in ["A", "B", "C"]:
        for m in months:
            n = rng.integers(1, 8)
            base = rng.uniform(1, 2)
            spread = rng.choice([0.01, 0.5])  # some high-dispersion scenes
            for _ in range(n):
                rows.append((tr, m.to_pydatetime(), base + rng.normal(scale=spread)))
    pdf = pd.DataFrame(rows, columns=["transect", "scene_month", "chainage"])
    return pdf, spark.createDataFrame(pdf)


def test_qc_policy_modes(spark):
    pdf, sdf = _synthetic_pairs(spark)
    n_scenes = pdf["scene_month"].nunique()
    max_std, max_range, min_points, auto_prc = 0.25, 0.6, 3, 0.1
    stats = (
        pdf.groupby(["transect", "scene_month"])
        .agg(
            med=("chainage", "median"),
            std=("chainage", lambda x: np.std(x)),
            mx=("chainage", "max"),
            mn=("chainage", "min"),
            n=("chainage", "count"),
        )
        .reset_index()
    )
    for mode in ("nan", "max", "auto"):
        got = TR.qc_intersections(
            sdf,
            n_scenes=n_scenes,
            max_std=max_std,
            max_range=max_range,
            min_points=min_points,
            multiple_inter=mode,
            auto_prc=auto_prc,
        ).toPandas()
        exp = _qc_reference(stats, n_scenes, max_std, max_range, min_points, mode, auto_prc)
        assert len(got) == len(exp)
        for _, r in got.iterrows():
            e = exp[(r["transect"], pd.Timestamp(r["scene_month"]))]
            if pd.isna(e):
                assert pd.isna(r["chainage"]), (mode, r)
            else:
                assert abs(r["chainage"] - e) < 1e-9, (mode, r)


def test_min_chainage_nulling(spark):
    pdf = pd.DataFrame(
        {
            "transect": ["A"] * 4,
            "scene_month": [pd.Timestamp("2020-01-01")] * 4,
            "chainage": [-250.0, 1.0, 2.0, 3.0],
        }
    )
    sdf = spark.createDataFrame(pdf)
    got = TR.qc_intersections(
        sdf, n_scenes=1, min_chainage=-100.0, max_std=10, max_range=100, min_points=1
    ).toPandas()
    # -250 nulled before stats: median of [1,2,3] = 2, n = 3
    assert got["n"].iloc[0] == 3
    assert abs(got["chainage"].iloc[0] - 2.0) < 1e-12
