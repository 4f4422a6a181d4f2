"""Raster pipeline parity: Spark plan vs NumPy/pandas oracle, plus
geometric sanity of extracted shorelines (FIXTURES.md §6)."""

import numpy as np
import pandas as pd

from coastsat_spark import kernels
from coastsat_spark.datagen import coast_lat, gen_batch, webpages_df
from coastsat_spark.functions import cells
from coastsat_spark.operators import raster, tiling

N_DOCS = 20_000


def oracle_shorelines(n_docs: int, s: raster.ShorelineSettings) -> pd.DataFrame:
    """Pandas/NumPy re-implementation of docs->pixels->scenes->points."""
    pdf = gen_batch(np.arange(n_docs))
    lat, lon = pdf["_lat"].to_numpy(), pdf["_lon"].to_numpy()
    bands = tiling.np_bands(lat, lon)
    tile, pr, pc = cells.np_fine_to_tile_pixel(lat, lon)
    df = pd.DataFrame(
        {
            "tile": tile,
            "scene_month": pdf["warc_ts"].dt.to_period("Q").dt.start_time.astype(
                "datetime64[us]"
            ),
            "px_row": pr,
            "px_col": pc,
            "green": bands["green"],
            "swir": bands["swir"],
            "cloud": bands["cloud"].astype(float),
        }
    )
    px = (
        df.groupby(["tile", "scene_month", "px_row", "px_col"], as_index=False)
        .agg(
            green=("green", "mean"),
            swir=("swir", "mean"),
            n_docs=("green", "size"),
            cloud_frac=("cloud", "mean"),
        )
    )
    outs = []
    for _, grp in px.groupby(["tile", "scene_month"]):
        outs.append(raster.scene_extract_pdf(grp.reset_index(drop=True), s))
    return pd.concat(outs, ignore_index=True)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["scene_month"] = pd.to_datetime(df["scene_month"]).astype("datetime64[us]")
    return df.sort_values(
        ["tile", "scene_month", "contour_id", "point_idx"]
    ).reset_index(drop=True)


def test_spark_pipeline_matches_numpy_oracle(spark):
    s = raster.ShorelineSettings()
    docs = webpages_df(spark, N_DOCS)
    prepared = tiling.prepare_documents(docs)
    px = raster.aggregate_pixels(prepared)
    got = _norm(raster.extract_shorelines(px, s).toPandas())
    exp = _norm(oracle_shorelines(N_DOCS, s))
    assert len(got) == len(exp), (len(got), len(exp))
    assert (got["tile"].to_numpy() == exp["tile"].to_numpy()).all()
    assert (got["contour_id"].to_numpy() == exp["contour_id"].to_numpy()).all()
    assert (got["point_idx"].to_numpy() == exp["point_idx"].to_numpy()).all()
    for col in ("px_x", "px_y", "lon", "lat", "t_mndwi"):
        assert np.allclose(got[col].to_numpy(), exp[col].to_numpy(), atol=1e-9), col


def test_shoreline_lies_near_coast(spark):
    docs = webpages_df(spark, N_DOCS)
    prepared = tiling.prepare_documents(docs)
    px = raster.aggregate_pixels(prepared)
    q = raster.scene_quality(px, raster.ShorelineSettings())
    pts = raster.extract_shorelines(px, quality=q).toPandas()
    assert len(pts) > 50
    err = np.abs(pts["lat"].to_numpy() - coast_lat(pts["lon"].to_numpy()))
    # pixel size is ~0.7 deg; the median shoreline point sits within a pixel
    assert np.median(err) < 0.75, np.median(err)


def test_scene_quality_gates_match_kernel(spark):
    s = raster.ShorelineSettings()
    docs = webpages_df(spark, 6_000)
    prepared = tiling.prepare_documents(docs)
    px = raster.aggregate_pixels(prepared).cache()
    q = raster.scene_quality(px, s)
    # extraction WITHOUT the relational gate must produce points only for
    # scenes the kernel's internal gates accept; the relational filter is
    # a superset check (combined-bad + class gates)
    gated = raster.extract_shorelines(px, s, quality=q).select("tile", "scene_month").distinct()
    ungated = raster.extract_shorelines(px, s).select("tile", "scene_month").distinct()
    extra = ungated.exceptAll(gated).count()
    missing = gated.exceptAll(ungated).count()
    assert missing == 0  # gate never *adds* scenes
    # kernel-only path may keep a few scenes the relational gate rejects
    # (combined_bad) — they must be a small minority
    assert extra <= max(1, int(0.2 * max(ungated.count(), 1)))


def test_pixel_aggregate_counts(spark):
    docs = webpages_df(spark, 6_000)
    prepared = tiling.prepare_documents(docs)
    px = raster.aggregate_pixels(prepared)
    total = px.agg({"n_docs": "sum"}).collect()[0][0]
    assert total == 6_000
