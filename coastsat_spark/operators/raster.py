"""Raster layer: pixel aggregation, scene gates, shoreline extraction.

Pipeline shape (the two-shuffle plan of SURVEY.md §3 EP2):

  docs --(shuffle 1: groupBy tile,scene,px)--> pixel aggregates (JVM,
  partial+final hash agg — raw docs never cross into Python) --(shuffle 2:
  groupBy tile,scene)--> applyInPandas(extract) --> shoreline points.

The Python stage receives at most GRID*GRID rows per scene (64 for the
default 8x8 grid), so executor memory is bounded regardless of how many
billions of docs feed a scene — the doc-volume skew of coastal-dense
cells is absorbed by the JVM partial aggregation (map-side combine), the
engine's primary skew defense; AQE skew-join/partition splitting is the
backstop (SURVEY.md §4.2).

Scene-local kernels (Otsu -> marching squares -> contour cleanup ->
world-coordinate shoreline + cloud proximity filter) mirror
SDS_shoreline.py:419-709 but run once per (tile, month) group.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import kernels
from ..functions import cells
from .tiling import BANDS


@dataclass(frozen=True)
class ShorelineSettings:
    """Knobs mirroring the reference's `settings` dict (example.py:96-120)."""

    grid_log2: int = cells.GRID_LOG2
    min_docs_per_px: int = 1  # px with fewer docs = nodata
    cloud_mask_frac: float = 0.5  # px cloud_frac above this -> cloud px (R1)
    max_cloud_frac_combined: float = 0.99  # F2 gate (SDS_shoreline.py:159-162)
    max_cloud_frac: float = 0.95  # F3 gate (SDS_shoreline.py:163-171)
    min_filled_frac: float = 0.30  # F7 empty-scene guard
    min_contour_len_px: float = 1.0  # min_length_sl analog (R12)
    dist_cloud_px: float = 1.0  # J7 proximity anti-join radius (px units)
    # two-class presence gate (analog of the >=50-sand-px branch,
    # SDS_shoreline.py:195): a scene must show clearly-water and
    # clearly-land pixels before thresholding is meaningful.
    water_cut: float = -0.2
    land_cut: float = 0.1
    min_water_px: int = 2
    min_land_px: int = 2


def aggregate_pixels(docs: DataFrame) -> DataFrame:
    """Shuffle 1: per-(tile, scene_month, pixel) band means + cloud fraction.

    All-JVM hash aggregate with map-side combine; the analog of building
    the scene raster from observations (gdal_merge mosaic, §2.1 S12).
    """
    aggs = [F.avg(b).alias(b) for b in BANDS]
    aggs += [
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("cloud").cast("double")).alias("cloud_frac"),
    ]
    return docs.groupBy("tile", "scene_month", "px_row", "px_col").agg(*aggs)


def scene_quality(pixels: DataFrame, s: ShorelineSettings) -> DataFrame:
    """Per-scene cloud/nodata stats + keep flag (gates F2/F3/F7).

    Exposed as its own operator so the gate is a relational filter *before*
    the Python stage (cheap-filter-first staging, SURVEY.md §4.1).
    """
    g = 1 << s.grid_log2
    total_px = g * g
    clear = F.col("cloud_frac") <= s.cloud_mask_frac
    mndwi = (F.col("swir") - F.col("green")) / (F.col("swir") + F.col("green"))
    st = pixels.groupBy("tile", "scene_month").agg(
        F.count(F.lit(1)).alias("filled_px"),
        F.sum((F.col("cloud_frac") > s.cloud_mask_frac).cast("int")).alias("cloud_px"),
        F.sum("n_docs").alias("n_docs"),
        F.sum((clear & (mndwi < s.water_cut)).cast("int")).alias("water_px"),
        F.sum((clear & (mndwi > s.land_cut)).cast("int")).alias("land_px"),
    )
    filled_frac = F.col("filled_px") / F.lit(float(total_px))
    cloud_frac = F.col("cloud_px") / F.col("filled_px")
    combined_bad = (F.col("cloud_px") + F.lit(total_px) - F.col("filled_px")) / F.lit(
        float(total_px)
    )
    return st.select(
        "tile",
        "scene_month",
        "filled_px",
        "cloud_px",
        "n_docs",
        "water_px",
        "land_px",
        filled_frac.alias("filled_frac"),
        cloud_frac.alias("cloud_frac"),
        combined_bad.alias("combined_bad_frac"),
        (
            (filled_frac >= s.min_filled_frac)
            & (cloud_frac <= s.max_cloud_frac)
            & (combined_bad <= s.max_cloud_frac_combined)
            & (F.col("water_px") >= s.min_water_px)
            & (F.col("land_px") >= s.min_land_px)
        ).alias("keep"),
    )


_SHORELINE_SCHEMA = (
    "tile long, scene_month timestamp, contour_id int, point_idx int, "
    "px_x double, px_y double, lon double, lat double, t_mndwi double"
)


def scene_extract_pdf(pdf: pd.DataFrame, s: ShorelineSettings) -> pd.DataFrame:
    """Scene-local kernel: grid assembly -> masks -> MNDWI -> Otsu ->
    marching squares -> min-length + cloud-proximity filters -> world coords.

    Shared verbatim by the pytest NumPy oracle.
    """
    g = 1 << s.grid_log2
    tile = int(pdf["tile"].iloc[0])
    month = pdf["scene_month"].iloc[0]

    grid = np.full((g, g, 2), np.nan)  # [:, :, 0]=green, 1=swir
    cloudm = np.zeros((g, g), dtype=bool)
    filled = np.zeros((g, g), dtype=bool)
    r = pdf["px_row"].to_numpy(int)
    c = pdf["px_col"].to_numpy(int)
    ok = pdf["n_docs"].to_numpy() >= s.min_docs_per_px
    grid[r[ok], c[ok], 0] = pdf["green"].to_numpy()[ok]
    grid[r[ok], c[ok], 1] = pdf["swir"].to_numpy()[ok]
    filled[r[ok], c[ok]] = True
    cl = ok & (pdf["cloud_frac"].to_numpy() > s.cloud_mask_frac)
    cloudm[r[cl], c[cl]] = True

    empty = pd.DataFrame(
        {
            k: pd.Series(dtype=t)
            for k, t in [
                ("tile", "int64"),
                ("scene_month", "datetime64[us]"),
                ("contour_id", "int32"),
                ("point_idx", "int32"),
                ("px_x", "float64"),
                ("px_y", "float64"),
                ("lon", "float64"),
                ("lat", "float64"),
                ("t_mndwi", "float64"),
            ]
        }
    )

    # scene gates (redundant with scene_quality filter; cheap safety)
    n_filled = int(filled.sum())
    if n_filled == 0 or n_filled / (g * g) < s.min_filled_frac:
        return empty
    if cloudm.sum() / max(n_filled, 1) > s.max_cloud_frac:
        return empty

    mndwi = (grid[:, :, 1] - grid[:, :, 0]) / (grid[:, :, 1] + grid[:, :, 0])
    mndwi[cloudm | ~filled] = np.nan

    vals = mndwi[np.isfinite(mndwi)]
    if (vals < s.water_cut).sum() < s.min_water_px or (vals > s.land_cut).sum() < s.min_land_px:
        return empty
    t = kernels.otsu_threshold(vals)
    if not np.isfinite(t):
        return empty

    contours = kernels.marching_squares(mndwi, t)

    # cloud-proximity anti-join (J7, SDS_shoreline.py:679-692): drop points
    # within dist_cloud_px of any cloud pixel center (scene-local exact).
    cy, cx = np.nonzero(cloudm)
    lon0, lat0, dlon, dlat = cells.np_cell_bounds(np.array([tile]))
    lon0, lat0, dlon, dlat = float(lon0[0]), float(lat0[0]), float(dlon[0]), float(dlat[0])

    rows = []
    cid = 0
    for cont in contours:
        if kernels.polyline_length(cont) < s.min_contour_len_px:
            continue
        pts = cont  # (n, 2) as (row, col) sub-pixel
        if len(cy):
            d2 = (pts[:, 0:1] - cy[None, :]) ** 2 + (pts[:, 1:2] - cx[None, :]) ** 2
            keep = d2.min(axis=1) > s.dist_cloud_px**2
        else:
            keep = np.ones(len(pts), dtype=bool)
        pts = pts[keep]
        if len(pts) < 2:
            continue
        # pixel -> world affine: pixel centers at (index + 0.5)
        lon = lon0 + (pts[:, 1] + 0.5) * dlon / g
        lat = lat0 - (pts[:, 0] + 0.5) * dlat / g
        for k in range(len(pts)):
            rows.append((tile, month, cid, k, pts[k, 1], pts[k, 0], lon[k], lat[k], t))
        cid += 1
    if not rows:
        return empty
    return pd.DataFrame(
        rows,
        columns=[
            "tile",
            "scene_month",
            "contour_id",
            "point_idx",
            "px_x",
            "px_y",
            "lon",
            "lat",
            "t_mndwi",
        ],
    )


def extract_shorelines(
    pixels: DataFrame, s: ShorelineSettings | None = None, quality: DataFrame | None = None
) -> DataFrame:
    """Shuffle 2: scene-grouped contour extraction (<=G*G rows in per group).

    `quality` (from scene_quality) pre-filters scenes relationally; pass
    None to gate inside the kernel only.
    """
    s = s or ShorelineSettings()
    if quality is not None:
        keep = quality.filter(F.col("keep")).select("tile", "scene_month")
        pixels = pixels.join(keep, ["tile", "scene_month"], "left_semi")

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return scene_extract_pdf(pdf, s)

    return pixels.groupBy("tile", "scene_month").applyInPandas(fn, schema=_SHORELINE_SCHEMA)
