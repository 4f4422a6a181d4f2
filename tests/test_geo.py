"""Projection functions: round trips and known values."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from coastsat_spark.functions import geo


def test_haversine_known_value(spark):
    # London -> Paris ~ 343-344 km
    df = spark.createDataFrame(
        pd.DataFrame({"la1": [51.5074], "lo1": [-0.1278], "la2": [48.8566], "lo2": [2.3522]})
    )
    d = df.select(
        geo.haversine_m(F.col("la1"), F.col("lo1"), F.col("la2"), F.col("lo2")).alias("d")
    ).collect()[0]["d"]
    assert 340_000 < d < 348_000


def test_mercator_roundtrip(spark):
    pdf = pd.DataFrame({"lat": [-60.0, 0.0, 45.0, 70.0], "lon": [-170.0, 0.0, 13.5, 179.0]})
    df = spark.createDataFrame(pdf)
    x, y = geo.mercator_xy(F.col("lat"), F.col("lon"))
    lat2, lon2 = geo.mercator_inverse(x, y)
    out = df.select(lat2.alias("lat2"), lon2.alias("lon2")).toPandas()
    assert np.allclose(out["lat2"], pdf["lat"], atol=1e-9)
    assert np.allclose(out["lon2"], pdf["lon"], atol=1e-9)


def test_local_xy_scale(spark):
    # 0.01 deg north ~ 1111.9 m
    df = spark.createDataFrame(pd.DataFrame({"lat": [10.01], "lon": [20.0]}))
    x, y = geo.local_xy_m(F.col("lat"), F.col("lon"), 10.0, 20.0)
    r = df.select(x.alias("x"), y.alias("y")).collect()[0]
    assert abs(r["x"]) < 1e-6
    assert r["y"] == pytest.approx(1111.95, rel=1e-3)


def test_utm_forward_known_point():
    # UTM zone 31N for (lat 0, lon 3) is the central meridian: x=500000
    x, y = geo.np_utm_forward(np.array([0.0]), np.array([3.0]), 31)
    assert x[0] == pytest.approx(500000.0, abs=1e-6)
    assert y[0] == pytest.approx(0.0, abs=1e-6)
    # a published reference point: (50.0N, 7.0E) zone 32 -> ~ (356456, 5540884)
    x, y = geo.np_utm_forward(np.array([50.0]), np.array([7.0]), 32)
    assert x[0] == pytest.approx(356565, abs=2000)
    assert y[0] == pytest.approx(5543159, abs=4000)


def test_utm_zone():
    assert geo.utm_zone(7.0) == 32
    assert geo.utm_zone(-0.1278) == 30
