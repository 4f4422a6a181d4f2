"""Sinks + remaining kernels: GeoJSON export, wide pivot, pansharpen,
hist match, buffer mask, tidal range, containment dedup."""

import json
import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from coastsat_spark import kernels as K
from coastsat_spark.operators import sinks, timeseries as TS


def test_rescale_intensity():
    im = np.array([[0.0, 50.0], [100.0, np.nan]])
    out = K.rescale_intensity(im, prc_clip=100.0)
    assert out[0, 0] == 0.0 and out[1, 0] == 1.0 and abs(out[0, 1] - 0.5) < 1e-12
    assert np.isnan(out[1, 1])
    # lower bound pinned at 0 (reference prc_low=0, SDS_preprocess.py:539):
    # a constant-7 band stretches to 7/7 = 1, not to 0
    assert np.all(K.rescale_intensity(np.full((3, 3), 7.0)) == 1.0)
    assert np.all(K.rescale_intensity(np.full((2, 2), 0.0)) == 0.0)
    # negatives clamp to 0 like the reference's in_range=(0, hi)
    assert K.rescale_intensity(np.array([[-5.0, 10.0]]), 100.0)[0, 0] == 0.0


def test_hist_match_matches_distribution():
    rng = np.random.default_rng(6)
    src = rng.normal(0, 1, 5000)
    tmpl = rng.normal(10, 3, 4000)
    out = K.hist_match(src, tmpl)
    assert abs(out.mean() - tmpl.mean()) < 0.2
    assert abs(out.std() - tmpl.std()) < 0.2
    # order preserved
    assert (np.argsort(out) == np.argsort(src)).all()


def test_pansharpen_injects_pan_detail():
    rng = np.random.default_rng(7)
    base = rng.uniform(50, 150, (16, 16))
    ms = np.stack([base * 0.9, base * 1.0, base * 1.1], axis=-1) + rng.normal(
        0, 1, (16, 16, 3)
    )
    pan = base + np.sin(np.arange(16))[None, :] * 20  # extra detail
    out = K.pansharpen(ms, pan)
    assert out.shape == ms.shape
    # output correlates more with pan than input did on the injected detail
    c_in = np.corrcoef(ms[:, :, 0].ravel(), pan.ravel())[0, 1]
    c_out = np.corrcoef(out[:, :, 0].ravel(), pan.ravel())[0, 1]
    assert c_out >= c_in - 1e-9


def test_pansharpen_with_mask_and_degenerate():
    ms = np.full((4, 4, 3), 5.0)
    pan = np.full((4, 4), 7.0)
    mask = np.ones((4, 4), dtype=bool)
    out = K.pansharpen(ms, pan, mask)  # nothing unmasked -> unchanged
    assert np.allclose(out, ms)


def test_buffer_mask_radius():
    m = K.buffer_mask((8, 8), np.array([4]), np.array([4]), radius=1.5)
    assert m[4, 4] and m[4, 5] and m[5, 5]
    assert not m[4, 6] and not m[0, 0]
    assert K.buffer_mask((4, 4), np.array([]), np.array([]), 2.0).sum() == 0


def test_tidal_range_stats(spark):
    t = np.arange(0, 40 * 86400, 900)
    tide = 1.0 * np.sin(2 * np.pi * t / (12.42 * 3600))
    pdf = pd.DataFrame(
        {"ts": pd.Timestamp("2021-01-01") + pd.to_timedelta(t, unit="s"), "tide": tide}
    )
    out = TS.tidal_range_stats(spark.createDataFrame(pdf)).toPandas().iloc[0]
    assert out["mhw"] == pytest.approx(1.0, abs=0.01)
    assert out["mlw"] == pytest.approx(-1.0, abs=0.01)
    assert out["tidal_range"] == pytest.approx(2.0, abs=0.02)


def test_containment_dedup(spark):
    pdf = pd.DataFrame(
        {
            "id": [1, 2, 3, 4, 5],
            "bkt": ["a", "a", "a", "b", "b"],
            "x0": [0.0, 1.0, 10.0, 0.0, 0.0],
            "y0": [0.0, 1.0, 10.0, 0.0, 0.0],
            "x1": [5.0, 2.0, 12.0, 3.0, 3.0],
            "y1": [5.0, 2.0, 12.0, 3.0, 3.0],
        }
    )
    out = TS.containment_dedup(
        spark.createDataFrame(pdf), "bkt", ("x0", "y0", "x1", "y1"), "id"
    ).toPandas()
    kept = sorted(out["id"])
    # 2 is inside 1 (dropped); 3 disjoint (kept); 4==5 identical -> keep min id 4
    assert kept == [1, 3, 4]


def test_geojson_sink_roundtrip(spark, tmp_path):
    pts = pd.DataFrame(
        {
            "tile": [1, 1, 1, 1],
            "scene_month": pd.to_datetime(["2021-01-01"] * 4),
            "contour_id": [0, 0, 1, 1],
            "point_idx": [1, 0, 0, 1],
            "lon": [1.0, 0.0, 5.0, 6.0],
            "lat": [1.0, 0.0, 5.0, 6.0],
            "t_mndwi": [-0.2] * 4,
        }
    )
    feats = sinks.shoreline_features(spark.createDataFrame(pts))
    path = os.path.join(tmp_path, "out.geojson")
    n = sinks.write_geojson_file(feats, path)
    assert n == 2
    gj = json.load(open(path))
    assert gj["type"] == "FeatureCollection"
    geoms = {f["properties"]["contour_id"]: f["geometry"]["coordinates"] for f in gj["features"]}
    assert geoms[0] == [[0.0, 0.0], [1.0, 1.0]]  # point_idx ordering respected


def test_timeseries_wide_pivot(spark):
    pdf = pd.DataFrame(
        {
            "transect": ["A", "B", "A"],
            "scene_month": pd.to_datetime(["2021-01-01", "2021-01-01", "2021-04-01"]),
            "chainage": [1.0, 2.0, 3.0],
        }
    )
    wide = sinks.timeseries_wide(spark.createDataFrame(pdf)).toPandas()
    assert list(wide.columns) == ["scene_month", "A", "B"]
    assert wide["A"].tolist() == [1.0, 3.0]


def test_mask_rewrite_in_place(spark, tmp_path):
    """S11: mask_columns + dynamic partition overwrite rewrites only the
    targeted partition; other partitions' files stay byte-identical."""
    import os

    path = str(tmp_path / "tiles")
    df = spark.range(300).select(
        (F.col("id") % 3).alias("tile"),
        F.col("id").alias("px"),
        (F.col("id") * 1.5).alias("swir"),
        (F.col("id") * 2.0).alias("green"),
    )
    df.write.partitionBy("tile").parquet(path)

    def file_set(t):
        d = f"{path}/tile={t}"
        return {(f, os.path.getmtime(os.path.join(d, f)))
                for f in os.listdir(d) if f.endswith(".parquet")}

    before = {t: file_set(t) for t in range(3)}
    tile1 = spark.read.parquet(path).filter("tile = 1")
    masked = sinks.mask_columns(tile1, F.col("px") % 2 == 0, ["swir", "green"], fill=None)
    sinks.overwrite_partitions(masked, path, ["tile"])

    back = spark.read.parquet(path)
    # tile 1: even px masked to null, odd kept
    t1 = back.filter("tile = 1").toPandas()
    assert t1.loc[t1["px"] % 2 == 0, "swir"].isna().all()
    assert t1.loc[t1["px"] % 2 == 1, "swir"].notna().all()
    # tiles 0 and 2 untouched on disk (same files, same mtimes)
    assert file_set(0) == before[0] and file_set(2) == before[2]
    assert file_set(1) != before[1]
    assert back.count() == 300


def test_polygon_readers(spark, tmp_path):
    """S8: GeoJSON + KML polygon readers match the reference's contract."""
    ring = [[151.0, -33.0], [151.1, -33.0], [151.1, -33.1], [151.0, -33.1], [151.0, -33.0]]
    gj = {"type": "FeatureCollection", "features": [
        {"type": "Feature", "properties": {},
         "geometry": {"type": "Polygon", "coordinates": [ring]}}]}
    gj_path = str(tmp_path / "roi.geojson")
    json.dump(gj, open(gj_path, "w"))
    assert sinks.polygon_from_geojson(gj_path) == [ring]

    kml_path = str(tmp_path / "roi.kml")
    coords = "\n".join(f"{x},{y},0" for x, y in ring)
    open(kml_path, "w").write(
        "<kml><Placemark><Polygon><outerBoundaryIs><LinearRing>"
        f"<coordinates>\n{coords}\n</coordinates>"
        "</LinearRing></outerBoundaryIs></Polygon></Placemark></kml>"
    )
    assert sinks.polygon_from_kml(kml_path) == [ring]

    df = sinks.polygons_df(spark, [gj_path, kml_path]).toPandas()
    assert len(df) == 2 and all(len(r) == 5 for r in df["ring"])


def test_compact_partitions_preserves_rows_and_cuts_files(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from coastsat_spark.operators import sinks

    # build a deliberately fragmented table: 8 producer partitions x
    # every month -> ~8 files per month dir
    src = str(tmp_path / "frag")
    df = (
        spark.range(0, 20000, 1, 8)
        .withColumn("m", F.concat(F.lit("2024-"), F.lpad((F.col("id") % 12 + 1).cast("string"), 2, "0")))
        .withColumn("payload", F.sha2(F.col("id").cast("string"), 256))
    )
    df.write.partitionBy("m").parquet(src)
    before = sinks.partition_file_stats(src, "m")
    assert sum(n for n, _ in before.values()) >= 8 * 12
    rows_before = spark.read.parquet(src).toPandas()

    plan = sinks.compact_partitions(spark, src, partition_col="m", target_mb=128)
    assert set(plan) == set(before) and all(n == 1 for n in plan.values())
    live, manifest = sinks._live_dir(src)
    assert manifest is not None and manifest["version"] == 1
    after = sinks.partition_file_stats(live, "m")
    assert sum(n for n, _ in after.values()) == 12  # one file per month
    rows_after = sinks.read_table(spark, src).toPandas()
    key = ["id"]
    a = rows_before.sort_values(key).reset_index(drop=True)
    b = rows_after.sort_values(key).reset_index(drop=True)
    assert a[["id", "payload"]].equals(b[["id", "payload"]])
    assert sorted(a["m"]) == sorted(b["m"])


def test_compact_partitions_kill_never_hides_table(spark, tmp_path):
    """Snapshot-isolated commit: kill the process at the injection point
    AFTER staging but BEFORE the manifest replace — readers resolving
    through read_table still see the previous snapshot, complete and
    row-identical; the aborted staging is swept on the next run and a
    clean re-run commits normally. There is no crash window in which the
    table is missing (the round-3/4 rename swap had one)."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from coastsat_spark.operators import sinks

    src = str(tmp_path / "tbl")
    df = (
        spark.range(0, 5000, 1, 4)
        .withColumn("m", F.concat(F.lit("2024-"), F.lpad((F.col("id") % 3 + 1).cast("string"), 2, "0")))
        .withColumn("payload", F.sha2(F.col("id").cast("string"), 256))
    )
    df.write.partitionBy("m").parquet(src)
    rows = spark.read.parquet(src).count()

    class Kill(RuntimeError):
        pass

    def _boom():
        raise Kill("simulated kill between stage and commit")

    # migration run killed pre-commit: no manifest, loose files intact,
    # plain AND manifest-resolved reads both still see the full table
    with _pytest.raises(Kill):
        sinks.compact_partitions(
            spark, src, partition_col="m", _crash_before_commit=_boom
        )
    assert not os.path.exists(os.path.join(src, sinks.MANIFEST_NAME))
    assert sinks.read_table(spark, src).count() == rows
    assert spark.read.parquet(src).count() == rows  # _data is underscore-hidden

    # clean run: sweeps the aborted staging, commits v2 of the dir space
    plan = sinks.compact_partitions(spark, src, partition_col="m", target_mb=128)
    assert set(plan) == {"2024-01", "2024-02", "2024-03"}
    assert sinks.read_table(spark, src).count() == rows
    live1, m1 = sinks._live_dir(src)
    assert m1 is not None

    # second-generation kill: manifest still points at the v1 snapshot,
    # which is untouched — readers never see a missing table
    with _pytest.raises(Kill):
        sinks.compact_partitions(
            spark, src, partition_col="m", _crash_before_commit=_boom
        )
    live2, m2 = sinks._live_dir(src)
    assert m2["version"] == m1["version"] and live2 == live1
    assert sinks.read_table(spark, src).count() == rows

    # and the next clean run recovers + commits a new version
    sinks.compact_partitions(spark, src, partition_col="m", target_mb=128)
    _, m3 = sinks._live_dir(src)
    assert m3["version"] == m1["version"] + 1
    assert sinks.read_table(spark, src).count() == rows


def test_compact_partitions_grace_snapshot_and_sweep(spark, tmp_path):
    """A reader that resolved the manifest BEFORE a compaction keeps
    reading its (grace) snapshot afterwards; the grace copy is swept only
    by the NEXT compaction, and repeated compactions keep row counts
    exact."""
    import os

    from pyspark.sql import functions as F

    from coastsat_spark.operators import sinks

    src = str(tmp_path / "tbl")
    df = (
        spark.range(0, 3000, 1, 4)
        .withColumn("m", F.lit("2024-01"))
        .withColumn("payload", F.sha2(F.col("id").cast("string"), 256))
    )
    df.write.partitionBy("m").parquet(src)
    rows = spark.read.parquet(src).count()

    sinks.compact_partitions(spark, src, partition_col="m")  # v1
    live_v1, _ = sinks._live_dir(src)
    stale_reader = spark.read.parquet(live_v1)  # resolved pre-compaction

    sinks.compact_partitions(spark, src, partition_col="m")  # v2; v1 = grace
    assert os.path.exists(live_v1)  # grace copy retained for the reader
    assert stale_reader.count() == rows  # in-flight reader unharmed
    assert sinks.read_table(spark, src).count() == rows

    sinks.compact_partitions(spark, src, partition_col="m")  # v3 sweeps v1
    assert not os.path.exists(live_v1)
    assert sinks.read_table(spark, src).count() == rows


def test_snapshot_time_travel_history_and_expiry(spark, tmp_path):
    """Iceberg-analog snapshot surface: read_table(version=N) resolves a
    retained snapshot byte-for-byte, table_history() lists retained
    versions with the live flag, expiry (automatic via retain_versions
    and explicit via expire_snapshots) removes data + manifest together,
    and a time-travel read of an expired version fails loudly naming
    what IS retained."""
    import pytest
    from pyspark.sql import functions as F

    from coastsat_spark.operators import sinks

    src = str(tmp_path / "tbl")
    df = (
        spark.range(0, 2000, 1, 4)
        .withColumn("m", F.lit("2024-02"))
        .withColumn("payload", F.sha2(F.col("id").cast("string"), 256))
    )
    df.write.partitionBy("m").parquet(src)
    rows = spark.read.parquet(src).count()

    # three commits with a generous retention window
    for _ in range(3):
        sinks.compact_partitions(spark, src, partition_col="m", retain_versions=3)

    hist = sinks.table_history(src)
    assert [h["version"] for h in hist] == [1, 2, 3]
    assert [h["live"] for h in hist] == [False, False, True]
    assert all(h["rows"] == rows for h in hist)

    # time travel: every retained version replays the same rows, and the
    # non-live snapshot is a real independent directory
    for v in (1, 2, 3):
        assert sinks.read_table(spark, src, version=v).count() == rows
    assert (
        sinks.read_table(spark, src, version=1)
        .agg(F.sum("id").alias("s"))
        .collect()[0]["s"]
        == sinks.read_table(spark, src).agg(F.sum("id").alias("s")).collect()[0]["s"]
    )

    # explicit expiry keeps the newest keep_last (live always survives)
    expired = sinks.expire_snapshots(src, keep_last=1)
    assert expired == [1, 2]
    assert [h["version"] for h in sinks.table_history(src)] == [3]
    with pytest.raises(ValueError, match="not retained"):
        sinks.read_table(spark, src, version=1)
    assert sinks.read_table(spark, src).count() == rows  # live unharmed

    # automatic retention on the next commit: default retain_versions=2
    sinks.compact_partitions(spark, src, partition_col="m")  # v4
    assert [h["version"] for h in sinks.table_history(src)] == [3, 4]
    assert sinks.read_table(spark, src, version=3).count() == rows


def test_rollback_table_atomic_pointer_and_monotonic_versions(spark, tmp_path):
    """rollback_table repoints live to a retained snapshot (Iceberg
    rollback_to_snapshot): plain read_table follows the rollback, rolled-
    past versions stay time-travelable, and the NEXT compaction commit
    numbers itself past the highest retained version instead of
    restaging over a rolled-past snapshot's directory."""
    import pytest
    from pyspark.sql import functions as F

    from coastsat_spark.operators import sinks

    src = str(tmp_path / "tbl")
    (
        spark.range(0, 1500, 1, 4)
        .withColumn("m", F.lit("2024-03"))
        .withColumn("payload", F.sha2(F.col("id").cast("string"), 256))
        .write.partitionBy("m")
        .parquet(src)
    )
    rows = spark.read.parquet(src).count()
    for _ in range(3):
        sinks.compact_partitions(spark, src, partition_col="m", retain_versions=4)

    prev = sinks.rollback_table(src, 2)
    assert prev == 3
    hist = {h["version"]: h["live"] for h in sinks.table_history(src)}
    assert hist == {1: False, 2: True, 3: False}
    assert sinks.read_table(spark, src).count() == rows
    # rolled-past snapshot still time-travelable until expiry
    assert sinks.read_table(spark, src, version=3).count() == rows

    # next commit continues from the highest retained version (4); its
    # post-commit expiry keeps the newest retain_versions AND the
    # OUTGOING live snapshot (v2, numerically old after the rollback) as
    # the in-flight-reader grace copy — only v1 expires
    sinks.compact_partitions(spark, src, partition_col="m", retain_versions=2)
    hist = {h["version"]: h["live"] for h in sinks.table_history(src)}
    assert hist == {2: False, 3: False, 4: True}
    assert sinks.read_table(spark, src).count() == rows
    assert sinks.read_table(spark, src, version=2).count() == rows

    with pytest.raises(ValueError, match="not retained"):
        sinks.rollback_table(src, 99)
    # never-compacted table: nothing to roll back to
    plain = str(tmp_path / "plain")
    spark.range(10).withColumn("m", F.lit("x")).write.partitionBy("m").parquet(plain)
    with pytest.raises(ValueError, match="never compacted"):
        sinks.rollback_table(plain, 1)


def test_overwrite_partitions_on_manifest_table_commits_snapshot(spark, tmp_path):
    """On a compacted (manifest-governed) table, overwrite_partitions must
    commit a NEW snapshot rather than writing invisibly at the root:
    read_table sees the rewrite, the previous version time-travels to the
    pre-overwrite rows (snapshot isolation), untouched partitions are
    hard-linked (no data copy), and a later compaction still works."""
    import os

    from pyspark.sql import functions as F

    from coastsat_spark.operators import sinks

    src = str(tmp_path / "tbl")
    base = (
        spark.range(0, 1000, 1, 4)
        .withColumn("m", F.when(F.col("id") % 2 == 0, "2024-01").otherwise("2024-02"))
        .withColumn("v", F.col("id").cast("double"))
    )
    base.write.partitionBy("m").parquet(src)
    sinks.compact_partitions(spark, src, partition_col="m", retain_versions=3)
    v_before = sinks.table_history(src)[-1]["version"]
    sum_before = (
        sinks.read_table(spark, src).agg(F.sum("v").alias("s")).collect()[0]["s"]
    )

    # mask one partition's values and rewrite only that partition
    jan = sinks.read_table(spark, src).filter(F.col("m") == "2024-01")
    masked = sinks.mask_columns(jan, F.col("v") >= 0, ["v"], fill=0.0)
    sinks.overwrite_partitions(masked, src, ["m"])

    hist = sinks.table_history(src)
    assert hist[-1]["version"] == v_before + 1 and hist[-1]["live"]
    out = sinks.read_table(spark, src)
    assert out.count() == 1000
    assert out.filter(F.col("m") == "2024-01").agg(F.sum("v")).collect()[0][0] == 0.0
    # untouched partition unchanged, and its files are hard links into
    # the previous snapshot (copy-on-write, not a data copy)
    feb_sum = out.filter(F.col("m") == "2024-02").agg(F.sum("v")).collect()[0][0]
    assert feb_sum == sum((i for i in range(1000) if i % 2 == 1))
    live_dir, live_mf = sinks._live_dir(src)
    feb_files = [
        os.path.join(live_dir, "m=2024-02", f)
        for f in os.listdir(os.path.join(live_dir, "m=2024-02"))
        if f.endswith(".parquet")
    ]
    assert feb_files and all(os.stat(f).st_nlink >= 2 for f in feb_files)

    # snapshot isolation: the pre-overwrite version still reads the
    # original january values
    old = sinks.read_table(spark, src, version=v_before)
    assert old.filter(F.col("m") == "2024-01").agg(F.sum("v")).collect()[0][0] == sum(
        i for i in range(1000) if i % 2 == 0
    )
    assert old.agg(F.sum("v").alias("s")).collect()[0]["s"] == sum_before

    # the table stays maintainable: a later compaction commits on top
    sinks.compact_partitions(spark, src, partition_col="m")
    assert sinks.read_table(spark, src).count() == 1000
    assert (
        sinks.read_table(spark, src)
        .filter(F.col("m") == "2024-01")
        .agg(F.sum("v"))
        .collect()[0][0]
        == 0.0
    )


def test_orphan_manifest_sweep_after_crashed_expiry(spark, tmp_path):
    """A crash between expire_snapshots' two deletes (data dir gone,
    version manifest still present) must fail loudly on a time-travel
    read and be swept — history restored to truth — by the next
    compaction, with the live table unaffected throughout."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from coastsat_spark.operators import sinks

    src = str(tmp_path / "tbl")
    (
        spark.range(0, 800, 1, 4)
        .withColumn("m", F.lit("2024-04"))
        .write.partitionBy("m")
        .parquet(src)
    )
    rows = spark.read.parquet(src).count()
    for _ in range(2):
        sinks.compact_partitions(spark, src, partition_col="m", retain_versions=3)

    # simulate the crash: delete v1's data directory but leave its
    # per-version manifest behind
    v1 = sinks._version_manifests(src)[1]
    shutil.rmtree(os.path.join(src, v1["data_dir"]))
    assert os.path.exists(os.path.join(src, "_manifest_v1.json"))

    # loud failure, not a silent empty read
    try:
        sinks.read_table(spark, src, version=1).count()
        raise AssertionError("expected a read failure on the orphaned snapshot")
    except Exception as e:
        assert not isinstance(e, AssertionError)
    # and rollback refuses to make the orphan live
    import pytest

    with pytest.raises(ValueError, match="orphaned"):
        sinks.rollback_table(src, 1)
    assert sinks.read_table(spark, src).count() == rows  # live unaffected

    # next compaction sweeps the orphan manifest; history is truthful again
    sinks.compact_partitions(spark, src, partition_col="m", retain_versions=3)
    assert 1 not in {h["version"] for h in sinks.table_history(src)}
    assert sinks.read_table(spark, src).count() == rows


def test_glob_under_escapes_metacharacter_paths(tmp_path):
    """_glob_under must treat the directory prefix literally: a table
    path containing glob metacharacters ('[', '?', '*') silently matches
    nothing under plain glob, and several callers (the hard-link loop,
    the entry sweep, _version_manifests) use the result to decide what
    to link or delete — an empty match there loses data."""
    import glob as g
    import os

    from coastsat_spark.operators.sinks import _glob_under

    root = tmp_path / "run[2024]" / "tbl"
    (root / "m=01").mkdir(parents=True)
    (root / "m=01" / "part-0.parquet").write_bytes(b"x")
    (root / "_manifest_v1.json").write_text("{}")

    # plain glob sees nothing (the bracket is a character class)
    assert g.glob(os.path.join(str(root), "**", "*.parquet"), recursive=True) == []
    hits = _glob_under(str(root), "**/*.parquet")
    assert [os.path.basename(h) for h in hits] == ["part-0.parquet"]
    assert [os.path.basename(h) for h in _glob_under(str(root), "_manifest_v*.json")] == [
        "_manifest_v1.json"
    ]


def test_crash_between_manifest_writes_is_benign(spark, tmp_path):
    """Kill injection in the window BETWEEN the per-version manifest
    write and the live-pointer swap: readers stay on the old version
    (pointer untouched), the never-live snapshot appears in history as
    valid data (documented semantics), and the next commit numbers past
    it and eventually expires it under normal retention."""
    from pyspark.sql import functions as F

    from coastsat_spark.operators import sinks

    src = str(tmp_path / "tbl")
    (
        spark.range(0, 600, 1, 4)
        .withColumn("m", F.lit("2024-05"))
        .write.partitionBy("m")
        .parquet(src)
    )
    rows = spark.read.parquet(src).count()
    sinks.compact_partitions(spark, src, partition_col="m", retain_versions=3)

    class Boom(RuntimeError):
        pass

    def crash():
        raise Boom()

    try:
        sinks.compact_partitions(
            spark, src, partition_col="m", retain_versions=3,
            _crash_between_writes=crash,
        )
        raise AssertionError("injected crash did not fire")
    except Boom:
        pass

    # live pointer untouched: readers still see v1
    _, live_mf = sinks._live_dir(src)
    assert int(live_mf["version"]) == 1
    assert sinks.read_table(spark, src).count() == rows
    # the never-live v2 is retained with fully staged, valid data
    hist = {h["version"]: h["live"] for h in sinks.table_history(src)}
    assert hist == {1: True, 2: False}
    assert sinks.read_table(spark, src, version=2).count() == rows

    # the next commit numbers PAST the never-live snapshot (v3) and the
    # table keeps working; v2 expires under normal retention later
    sinks.compact_partitions(spark, src, partition_col="m", retain_versions=3)
    hist = {h["version"]: h["live"] for h in sinks.table_history(src)}
    assert hist == {1: False, 2: False, 3: True}
    assert sinks.read_table(spark, src).count() == rows
    sinks.compact_partitions(spark, src, partition_col="m", retain_versions=1)
    hist = {h["version"]: h["live"] for h in sinks.table_history(src)}
    # keep_last=1 keeps the newest (4=live); the outgoing live (3) is the
    # protected grace copy; 1 and the never-live 2 are expired
    assert hist == {3: False, 4: True}
