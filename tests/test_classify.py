"""Classification layer: feature cube, deterministic model, per-scene
inference, refined Otsu, confusion matrix."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from coastsat_spark.datagen import webpages_df
from coastsat_spark.operators import classify as C
from coastsat_spark.operators import raster, tiling


def test_feature_cube_shape_and_nd_indices():
    g = 8
    rng = np.random.default_rng(4)
    grids = {b: rng.uniform(50, 200, (g, g)) for b in tiling.BANDS}
    feats = C.grid_features(grids)
    assert feats.shape == (g, g, 20)
    nirg = (grids["nir"] - grids["green"]) / (grids["nir"] + grids["green"])
    assert np.allclose(feats[:, :, 5], nirg)


def test_model_separates_sensor_classes():
    bands, label = C._synthetic_training_pixels(2000)
    side = int(np.ceil(np.sqrt(2000)))
    grids = {}
    for b in tiling.BANDS:
        gr = np.full((side, side), np.nan)
        gr.ravel()[:2000] = bands[b]
        grids[b] = gr
    lab = C.classify_grid(grids, np.zeros((side, side), bool), C.DEFAULT_MODEL, min_beach_area=1)
    pred = lab.ravel()[:2000]
    acc = (pred == label).mean()
    assert acc > 0.9, acc


def test_classify_scenes_runs_and_is_deterministic(spark):
    docs = webpages_df(spark, 6000)
    prepared = tiling.prepare_documents(docs)
    px = raster.aggregate_pixels(prepared).persist()
    out1 = C.classify_scenes(px).toPandas().sort_values(
        ["tile", "scene_month", "px_row", "px_col"]
    ).reset_index(drop=True)
    out2 = C.classify_scenes(px.repartition(13)).toPandas().sort_values(
        ["tile", "scene_month", "px_row", "px_col"]
    ).reset_index(drop=True)
    assert len(out1) > 0
    assert out1.equals(out2)
    assert set(out1["label"].unique()) <= {0, 1, 2, 3}
    # water label dominant below the coast curve, sand above
    px.unpersist()


def test_water_sand_follow_coast(spark):
    from coastsat_spark.datagen import coast_lat
    from coastsat_spark.functions import cells

    docs = webpages_df(spark, 20000)
    prepared = tiling.prepare_documents(docs)
    px = raster.aggregate_pixels(prepared)
    lab = C.classify_scenes(px).toPandas()
    lon0, lat0, dlon, dlat = cells.np_cell_bounds(lab["tile"].to_numpy())
    g = 8
    lon = lon0 + (lab["px_col"].to_numpy() + 0.5) * dlon / g
    lat = lat0 - (lab["px_row"].to_numpy() + 0.5) * dlat / g
    below = lat < coast_lat(lon) - 0.5
    above = lat > coast_lat(lon) + 0.5
    water_rate_below = (lab["label"][below] == C.CLASS_WATER).mean()
    water_rate_above = (lab["label"][above] == C.CLASS_WATER).mean()
    assert water_rate_below > 0.7, water_rate_below
    assert water_rate_above < 0.3, water_rate_above


def test_refined_otsu_deterministic_and_sane():
    rng = np.random.default_rng(8)
    mndwi = np.concatenate([rng.normal(-0.5, 0.05, 300), rng.normal(0.3, 0.05, 80)])
    labels = np.concatenate(
        [np.full(300, C.CLASS_WATER), np.full(80, C.CLASS_SAND)]
    )
    t1 = C.refined_otsu_threshold(mndwi, labels)
    t2 = C.refined_otsu_threshold(mndwi, labels)
    assert t1 == t2
    assert -0.5 < t1 < 0.3


def test_refined_otsu_missing_class_nan():
    mndwi = np.full(10, 0.1)
    labels = np.full(10, C.CLASS_WATER)
    assert np.isnan(C.refined_otsu_threshold(mndwi, labels))


def test_confusion_matrix(spark):
    pdf = pd.DataFrame({"t": [1, 1, 3, 3, 3], "p": [1, 3, 3, 3, 1]})
    out = C.confusion_matrix(spark.createDataFrame(pdf), "t", "p").toPandas()
    m = {(r.label_true, r.label_pred): r.n for r in out.itertuples()}
    assert m[(1, 1)] == 1 and m[(1, 3)] == 1 and m[(3, 3)] == 2 and m[(3, 1)] == 1
