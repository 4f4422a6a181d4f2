"""Pixel classification layer (R5/R6/A5/A13 + the refined-Otsu branch).

Reference behavior re-expressed (file:line into /root/reference):
- R5 `calculate_features` (SDS_shoreline.py:263-324): 20 features per
  pixel = 5 bands + 5 normalized-difference indices (NIR-G, SWIR-G,
  NIR-R, SWIR-NIR, B-R) + 3x3 windowed std of each;
- R6 `classify_image_NN` (SDS_shoreline.py:326-387): broadcast
  pretrained model -> batched inference -> remove small sand/water blobs
  (connectivity 2);
- A5/R9 `find_wl_contours2` (SDS_shoreline.py:441-519): class-refined
  Otsu on sand/water pixels, class-balanced *deterministically* (the
  reference uses unseeded np.random.choice, SDS_shoreline.py:496-500 —
  replaced per SURVEY.md §4.3 with smallest-hash-key subsampling);
- A13 confusion matrix (SDS_classify.py:465): a groupBy pivot.

The "pretrained model" is a multinomial least-squares linear classifier
fitted at import time on deterministic synthetic pixels drawn from the
sensor model — the engine analog of shipping sklearn pickles
(classification/models/*.pkl): read-only parameters broadcast to
executors, inference is one matmul per Arrow batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import kernels
from ..hashing import hash_stream, uniform01
from .raster import ShorelineSettings
from .tiling import BANDS

CLASS_OTHER, CLASS_SAND, CLASS_WHITEWATER, CLASS_WATER = 0, 1, 2, 3

_ND_PAIRS = [  # (a, b) -> (a - b) / (a + b), order per SDS_shoreline.py:292-306
    ("nir", "green"),
    ("swir", "green"),
    ("nir", "red"),
    ("swir", "nir"),
    ("blue", "red"),
]


def grid_features(grids: dict[str, np.ndarray]) -> np.ndarray:
    """(h, w, 20) feature cube from the five band grids (NaN = nodata)."""
    h, w = grids[BANDS[0]].shape
    feats = [grids[b] for b in BANDS]
    nds = []
    for a, b in _ND_PAIRS:
        with np.errstate(invalid="ignore", divide="ignore"):
            nds.append((grids[a] - grids[b]) / (grids[a] + grids[b]))
    feats += nds
    feats += [kernels.image_std(f, 1) for f in feats[:10]]
    return np.stack(feats, axis=-1)


def _synthetic_training_pixels(n: int = 4000, seed: int = 7):
    """Deterministic labeled pixels in band space (the training set the
    shipped model was 'trained' on). Water/sand follow the sensor model
    (tiling._BAND_MODEL); whitewater = bright mixed; other = cloud-bright."""
    idx = np.arange(n, dtype=np.uint64)
    u = uniform01(idx, 901, seed)
    label = (u * 4).astype(np.int64)
    noise = lambda s: (uniform01(idx, s, seed) - 0.5) * 16.0  # noqa: E731
    base = {
        CLASS_SAND: dict(blue=120.0, green=150.0, red=130.0, nir=60.0, swir=40.0),
        CLASS_WATER: dict(blue=90.0, green=100.0, red=110.0, nir=140.0, swir=180.0),
        CLASS_WHITEWATER: dict(blue=170.0, green=180.0, red=175.0, nir=120.0, swir=90.0),
        CLASS_OTHER: dict(blue=250.0, green=250.0, red=250.0, nir=250.0, swir=250.0),
    }
    # NOTE: in the engine's sensor model "water-side" docs darken SWIR/NIR
    # (tiling._BAND_MODEL water_delta) — match that here: water = low swir.
    base[CLASS_WATER], base[CLASS_SAND] = base[CLASS_SAND], base[CLASS_WATER]
    bands = {}
    for i, b in enumerate(BANDS):
        vals = np.array([base[l][b] for l in label])
        bands[b] = vals + noise(910 + i)
    return bands, label


def train_default_classifier() -> np.ndarray:
    """(4, 21) one-vs-rest linear model by least squares on the synthetic
    training pixels; deterministic, no sklearn."""
    bands, label = _synthetic_training_pixels()
    n = len(label)
    g = 64
    side = int(np.ceil(np.sqrt(n)))
    # embed the training pixels in a grid so windowed-std features exist
    grids = {}
    for b in BANDS:
        gr = np.full((side, side), np.nan)
        gr.ravel()[:n] = bands[b]
        grids[b] = gr
    feats = grid_features(grids).reshape(side * side, 20)[:n]
    feats = np.nan_to_num(feats, nan=1e-9, posinf=1e-9, neginf=1e-9)
    X = np.concatenate([np.ones((n, 1)), feats], axis=1)
    Y = np.zeros((n, 4))
    Y[np.arange(n), label] = 1.0
    W, *_ = np.linalg.lstsq(X, Y, rcond=None)
    return W.T  # (4, 21)


DEFAULT_MODEL = train_default_classifier()


def classify_grid(
    grids: dict[str, np.ndarray],
    cloud_mask: np.ndarray,
    model: np.ndarray,
    min_beach_area: int = 2,
) -> np.ndarray:
    """Label grid: argmax of the linear model; NaN/cloud pixels -> -1;
    small sand/water blobs demoted to OTHER (R6 min-area cleanup)."""
    h, w = cloud_mask.shape
    feats = grid_features(grids).reshape(h * w, 20)
    feats = np.where(np.isfinite(feats), feats, 1e-9)
    valid = np.isfinite(grids[BANDS[0]]).ravel() & ~cloud_mask.ravel()
    X = np.concatenate([np.ones((h * w, 1)), feats], axis=1)
    scores = X @ model.T
    labels = np.argmax(scores, axis=1)
    labels[~valid] = -1
    lab = labels.reshape(h, w)
    for cls in (CLASS_SAND, CLASS_WATER):
        m = lab == cls
        cleaned = kernels.remove_small_objects(m, min_beach_area, connectivity=2)
        lab[m & ~cleaned] = CLASS_OTHER
    return lab


def _classify_schema(pixels: DataFrame) -> str:
    # scene_month is a timestamp on the webpages path but a derived bigint
    # on the oracle-mirror path; carry the input's type through
    mt = dict(pixels.dtypes).get("scene_month", "timestamp")
    return f"tile long, scene_month {mt}, px_row int, px_col int, label int"


def classify_scenes(
    pixels: DataFrame,
    s: ShorelineSettings | None = None,
    model: np.ndarray | None = None,
    min_beach_area: int = 2,
) -> DataFrame:
    """Per-scene pixel classification (R6) over the pixel-aggregate table.

    The model is a tiny ndarray captured in the UDF closure (broadcast by
    Spark's task serialization — the analog of J8's model lookup).
    """
    s = s or ShorelineSettings()
    model = DEFAULT_MODEL if model is None else model
    g = 1 << s.grid_log2

    schema = _classify_schema(pixels)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        tile = int(pdf["tile"].iloc[0])
        month = pdf["scene_month"].iloc[0]
        grids = {b: np.full((g, g), np.nan) for b in BANDS}
        cloudm = np.zeros((g, g), dtype=bool)
        r = pdf["px_row"].to_numpy(int)
        c = pdf["px_col"].to_numpy(int)
        ok = pdf["n_docs"].to_numpy() >= s.min_docs_per_px
        for b in BANDS:
            grids[b][r[ok], c[ok]] = pdf[b].to_numpy()[ok]
        cl = ok & (pdf["cloud_frac"].to_numpy() > s.cloud_mask_frac)
        cloudm[r[cl], c[cl]] = True
        lab = classify_grid(grids, cloudm, model, min_beach_area)
        rr, cc = np.nonzero(lab >= 0)
        return pd.DataFrame(
            {
                "tile": tile,
                "scene_month": month,
                "px_row": rr.astype(np.int32),
                "px_col": cc.astype(np.int32),
                "label": lab[rr, cc].astype(np.int32),
            }
        )

    return pixels.groupBy("tile", "scene_month").applyInPandas(fn, schema=schema)


def refined_otsu_threshold(
    mndwi: np.ndarray, labels: np.ndarray, key_seed: int = 42
) -> float:
    """A5/R9: class-refined Otsu — threshold computed on the union of
    water and sand pixels after deterministic class balancing
    (find_wl_contours2, SDS_shoreline.py:470-519; unseeded sampling
    replaced per SURVEY.md §4.3)."""
    v = mndwi.ravel()
    lv = labels.ravel()
    water = np.flatnonzero((lv == CLASS_WATER) & np.isfinite(v))
    sand = np.flatnonzero((lv == CLASS_SAND) & np.isfinite(v))
    if len(water) == 0 or len(sand) == 0:
        return float("nan")
    kw = hash_stream(water.astype(np.uint64), 931, key_seed)
    ks = hash_stream(sand.astype(np.uint64), 932, key_seed)
    iw, is_ = kernels.balanced_subsample_indices(len(water), len(sand), kw, ks)
    vals = np.concatenate([v[water[iw]], v[sand[is_]]])
    return kernels.otsu_threshold(vals)


def confusion_matrix(df: DataFrame, y_true: str, y_pred: str) -> DataFrame:
    """A13: confusion counts (long form; pivot at export if needed)."""
    return df.groupBy(F.col(y_true).alias("label_true"), F.col(y_pred).alias("label_pred")).agg(
        F.count(F.lit(1)).alias("n")
    )


def classify_oracle_sql(px_cte: str, grid_log2: int, model: np.ndarray | None = None) -> str:
    """DuckDB mirror of `classify_scenes` over the relational pixel CTE
    (the same sensor-model mirror the pixel_aggregate oracle uses):
    20-feature cube (5 bands, 5 normalized differences, 10 reflect-padded
    3x3 windowed stds via per-offset neighbor joins — reflected duplicates
    counted exactly like the integral image), literal-weight linear scores
    (the broadcast model inlined as constants, mirroring R6's
    classify_image_NN, SDS_shoreline.py:326-387), first-max-wins argmax,
    cloud/nodata exclusion, and the min_beach_area=2 cleanup (a
    size-2 8-connected component exists iff a same-class neighbor does).

    Assumes ShorelineSettings defaults: min_docs_per_px=1 (every px row is
    data) and cloud_mask_frac=0.5.
    """
    model = DEFAULT_MODEL if model is None else model
    g = 1 << grid_log2
    hi, refl = g - 1, 2 * (g - 1)
    nd_exprs = [
        f"(({a} - {b}) / ({a} + {b}))" for a, b in _ND_PAIRS
    ]
    base_feats = list(BANDS) + [f"nd{i}" for i in range(5)]
    offs = ", ".join(
        f"({di}, {dj})" for di in (-1, 0, 1) for dj in (-1, 0, 1)
    )

    def reflect(expr: str) -> str:
        return (
            f"CASE WHEN {expr} < 0 THEN -({expr}) "
            f"WHEN {expr} > {hi} THEN {refl} - ({expr}) ELSE {expr} END"
        )

    std_cols = ", ".join(
        f"sqrt(greatest(sum(n_{f} * n_{f}) / count(n_{f})"
        f" - (sum(n_{f}) / count(n_{f})) * (sum(n_{f}) / count(n_{f})), 0.0)) AS s_{f}"
        for f in base_feats
    )
    feat_order = base_feats + [f"s_{f}" for f in base_feats]  # 20 features
    scores = []
    for k in range(model.shape[0]):
        # float() before repr: np.float64.__repr__ under numpy>=2.0 emits
        # "np.float64(...)", which is not parseable SQL
        terms = [f"{float(model[k, 0])!r}"] + [
            f"{float(model[k, j + 1])!r} * {f}" for j, f in enumerate(feat_order)
        ]
        scores.append(" + ".join(terms) + f" AS sc{k}")
    return f"""
        base AS (
          SELECT tile, scene_month, px_row, px_col,
                 {", ".join(BANDS)},
                 {", ".join(f'{e} AS nd{i}' for i, e in enumerate(nd_exprs))},
                 cloud_frac
          FROM {px_cte}
        ), off(di, dj) AS (VALUES {offs}),
        nb AS (
          SELECT o.tile, o.scene_month, o.px_row, o.px_col,
                 {", ".join(f'n.{f} AS n_{f}' for f in base_feats)}
          FROM base o CROSS JOIN off
          LEFT JOIN base n
            ON n.tile = o.tile AND n.scene_month = o.scene_month
           AND n.px_row = {reflect("o.px_row + off.di")}
           AND n.px_col = {reflect("o.px_col + off.dj")}
        ), stds AS (
          SELECT tile, scene_month, px_row, px_col, {std_cols}
          FROM nb GROUP BY 1, 2, 3, 4
        ), scored AS (
          SELECT b.tile, b.scene_month, b.px_row, b.px_col, b.cloud_frac,
                 {", ".join(scores)}
          FROM base b JOIN stds USING (tile, scene_month, px_row, px_col)
        ), lab AS (
          SELECT tile, scene_month,
                 CAST(px_row AS INTEGER) AS px_row,
                 CAST(px_col AS INTEGER) AS px_col,
                 CASE WHEN sc0 >= sc1 AND sc0 >= sc2 AND sc0 >= sc3 THEN 0
                      WHEN sc1 >= sc2 AND sc1 >= sc3 THEN 1
                      WHEN sc2 >= sc3 THEN 2
                      ELSE 3 END AS raw_label
          FROM scored WHERE cloud_frac <= 0.5
        ), cleaned AS (
          SELECT v.tile, v.scene_month, v.px_row, v.px_col,
                 CAST(CASE WHEN v.raw_label IN ({CLASS_SAND}, {CLASS_WATER})
                        AND NOT EXISTS (
                          SELECT 1 FROM lab w
                          WHERE w.tile = v.tile AND w.scene_month = v.scene_month
                            AND w.raw_label = v.raw_label
                            AND abs(w.px_row - v.px_row) <= 1
                            AND abs(w.px_col - v.px_col) <= 1
                            AND NOT (w.px_row = v.px_row AND w.px_col = v.px_col)
                        )
                      THEN {CLASS_OTHER} ELSE v.raw_label END AS INTEGER) AS label
          FROM lab v
        )
        SELECT tile, scene_month, px_row, px_col, label FROM cleaned
    """
