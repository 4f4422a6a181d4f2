"""Projection & distance functions (R13 pix<->world / EPSG-convert analog).

The reference shells out to GDAL/pyproj for affine + EPSG conversion
(SDS_tools.py:31-161). The engine's world frame is EPSG:4326 degrees; for
metric work it provides, all as *column expressions* (JVM, codegen):

- haversine great-circle distance,
- web-mercator (EPSG:3857-style) forward/inverse,
- local equirectangular tangent-plane meters around a reference point,

plus a NumPy transverse-Mercator (UTM-style) forward for batched UDF use,
implemented from the published series expansions (Snyder, Map
Projections — A Working Manual). The reference's `convert_world2pix`
list-branch bug (SDS_tools.py:106-110) is deliberately not reproduced.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_R = 6371008.8  # mean radius, meters
WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563


def haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters (column math)."""
    p1 = F.radians(lat1)
    p2 = F.radians(lat2)
    dp = F.radians(lat2 - lat1)
    dl = F.radians(lon2 - lon1)
    a = F.sin(dp / 2) ** 2 + F.cos(p1) * F.cos(p2) * F.sin(dl / 2) ** 2
    return F.lit(2.0 * EARTH_R) * F.asin(F.sqrt(a))


def mercator_xy(lat: Column, lon: Column) -> tuple[Column, Column]:
    """Web-mercator meters (spherical, EPSG:3857 convention)."""
    x = F.radians(lon) * F.lit(WGS84_A)
    y = F.log(F.tan(F.lit(math.pi / 4.0) + F.radians(lat) / 2)) * F.lit(WGS84_A)
    return x, y


def mercator_inverse(x: Column, y: Column) -> tuple[Column, Column]:
    lon = F.degrees(x / F.lit(WGS84_A))
    lat = F.degrees(F.lit(2.0) * F.atan(F.exp(y / F.lit(WGS84_A))) - F.lit(math.pi / 2.0))
    return lat, lon


def local_xy_m(lat: Column, lon: Column, lat0: float, lon0: float) -> tuple[Column, Column]:
    """Local equirectangular tangent plane (meters east/north of ref)."""
    x = F.radians(lon - F.lit(lon0)) * F.lit(EARTH_R * math.cos(math.radians(lat0)))
    y = F.radians(lat - F.lit(lat0)) * F.lit(EARTH_R)
    return x, y


def np_utm_forward(lat: np.ndarray, lon: np.ndarray, zone: int) -> tuple[np.ndarray, np.ndarray]:
    """Transverse-Mercator forward (UTM-style: k0=0.9996, 500 km false
    easting; northern hemisphere northing). Snyder eqs. 8-9..8-15."""
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lon0 = math.radians(zone * 6 - 183)
    a, f = WGS84_A, WGS84_F
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    k0 = 0.9996
    n = a / np.sqrt(1 - e2 * np.sin(lat) ** 2)
    t = np.tan(lat) ** 2
    c = ep2 * np.cos(lat) ** 2
    A = (lon - lon0) * np.cos(lat)
    m = a * (
        (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256) * lat
        - (3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024) * np.sin(2 * lat)
        + (15 * e2**2 / 256 + 45 * e2**3 / 1024) * np.sin(4 * lat)
        - (35 * e2**3 / 3072) * np.sin(6 * lat)
    )
    x = k0 * n * (
        A + (1 - t + c) * A**3 / 6 + (5 - 18 * t + t**2 + 72 * c - 58 * ep2) * A**5 / 120
    ) + 500000.0
    y = k0 * (
        m
        + n
        * np.tan(lat)
        * (
            A**2 / 2
            + (5 - t + 9 * c + 4 * c**2) * A**4 / 24
            + (61 - 58 * t + t**2 + 600 * c - 330 * ep2) * A**6 / 720
        )
    )
    return x, y


def utm_zone(lon: float) -> int:
    return int((lon + 180) // 6) + 1
