"""Vector / tabular sinks (S9/S10).

The reference exports shorelines as GeoJSON lines/points via GeoPandas
(`output_to_gdf` SDS_tools.py:766-816, `transects_to_gdf` :818-849) and
the transect time-series matrix as CSV (example.py:332-341). Here:

- GeoJSON features are assembled *distributed* (one JSON text row per
  feature via to_json on a struct — no driver-side geometry work), then
  written as a text part-file set; `write_geojson_file` offers the
  collect-to-driver single-file form for small outputs (the reference's
  actual regime: thousands of features).
- The time-series export pivots the long table to the reference's wide
  (date x transect) CSV shape at the very end — pivot only at export
  (SURVEY.md §1.2).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shoreline_features(points: DataFrame) -> DataFrame:
    """One GeoJSON LineString feature per (tile, scene, contour):
    (feature string) rows, built with collect_list over an ordered window.
    """
    w_cols = ["tile", "scene_month", "contour_id"]
    pts = points.select(
        *w_cols,
        "point_idx",
        F.array(F.round("lon", 6), F.round("lat", 6)).alias("coord"),
        "t_mndwi",
    )
    grouped = (
        pts.groupBy(*w_cols)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("point_idx"), F.col("coord")))
            ).alias("ordered"),
            F.first("t_mndwi").alias("t_mndwi"),
        )
        .withColumn("coords", F.col("ordered.coord"))
        .drop("ordered")
    )
    feature = F.to_json(
        F.struct(
            F.lit("Feature").alias("type"),
            F.struct(
                F.lit("LineString").alias("type"), F.col("coords").alias("coordinates")
            ).alias("geometry"),
            F.struct(
                F.col("tile"),
                F.date_format("scene_month", "yyyy-MM-dd").alias("date"),
                F.col("contour_id"),
                F.round("t_mndwi", 6).alias("t_mndwi"),
            ).alias("properties"),
        )
    )
    return grouped.select(feature.alias("feature"))


def write_geojson_file(features: DataFrame, path: str) -> int:
    """Small-output sink: assemble one FeatureCollection file on the
    driver (the reference's regime). Returns the feature count."""
    rows = [r["feature"] for r in features.collect()]
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        fh.write('{"type": "FeatureCollection", "features": [\n')
        fh.write(",\n".join(rows))
        fh.write("\n]}\n")
    return len(rows)


def transects_to_geojson(transects_pdf, path: str) -> int:
    """Transect dimension table -> GeoJSON LineStrings (driver-side; the
    table is tiny by construction)."""
    feats = []
    for _, t in transects_pdf.iterrows():
        feats.append(
            {
                "type": "Feature",
                "geometry": {
                    "type": "LineString",
                    "coordinates": [[t.x0, t.y0], [t.x1, t.y1]],
                },
                "properties": {"name": t.transect},
            }
        )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        json.dump({"type": "FeatureCollection", "features": feats}, fh)
    return len(feats)


def timeseries_wide(ts: DataFrame, time_col: str = "scene_month") -> DataFrame:
    """Long (transect, ts, chainage) -> wide (date x transect) matrix —
    the NARRA_time_series CSV shape; pivot only at export."""
    return (
        ts.groupBy(time_col)
        .pivot("transect")
        .agg(F.first("chainage"))
        .orderBy(time_col)
    )


def write_timeseries_csv(ts: DataFrame, path: str, time_col: str = "scene_month") -> None:
    wide = timeseries_wide(ts, time_col)
    wide.coalesce(1).write.mode("overwrite").option("header", True).csv(path)


# ------------------------------------------------ S11 mask-in-place rewrite

def mask_columns(df: DataFrame, predicate, cols: list[str], fill=None) -> DataFrame:
    """S11: the reference's mask_raster (SDS_tools.py:243-271) overwrites
    pixel values under a mask inside the file. The engine's analog is an
    immutable column update: rows matching `predicate` get every column
    in `cols` replaced by `fill` (default null = nodata)."""
    out = df
    for c in cols:
        out = out.withColumn(c, F.when(predicate, F.lit(fill)).otherwise(F.col(c)))
    return out


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    retain_versions: int = 2,
) -> None:
    """The in-place half of S11 at table scope: dynamic partition
    overwrite rewrites ONLY the partitions present in `df`, leaving every
    other partition's files untouched — the Spark-native equivalent of
    rewriting one raster file in place (no full-table rewrite at 100 TB).

    On a plain parquet table this is Spark's native dynamic overwrite.
    On a MANIFEST-GOVERNED table (one that has been through
    compact_partitions) writing at the root would be silently invisible —
    read_table resolves through the pointer and the next compaction
    sweeps root-level partition dirs — so the overwrite instead commits a
    NEW SNAPSHOT: the replaced partitions are written fresh into a staged
    version directory, every untouched live file is HARD-LINKED into it
    (copy-on-write: O(changed data + file count), no data copied), and
    the same atomic pointer swap as compaction makes it live. Readers on
    the previous version — including time-travel reads — keep seeing the
    pre-overwrite rows; Iceberg's `overwrite` snapshot semantics.
    `retain_versions` bounds post-commit history exactly as on
    compact_partitions — pass the table's usual retention so a rewrite
    doesn't silently expire history a compaction would have kept. The
    row count recorded in the manifest is derived from parquet footer
    metadata of the changed partitions only (O(changed files) driver
    reads), keeping the whole path copy-on-write-cheap."""
    mf = os.path.join(path, MANIFEST_NAME)
    if not os.path.exists(mf):
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_cols)
            .parquet(path)
        )
        return

    live, live_mf = _live_dir(path)
    version = _next_version(path, live_mf)
    new_rel = os.path.join("_data", f"v{version}")
    new_dir = os.path.join(path, new_rel)
    if os.path.isdir(new_dir):
        # aborted staging from a crashed overwrite (same number is only
        # reusable because no manifest ever referenced it)
        import shutil

        shutil.rmtree(new_dir)
    # stage the REPLACED partitions (plain append-shaped write into the
    # empty staging dir; the dirs it creates define the replacement set)
    df.write.mode("errorifexists").partitionBy(*partition_cols).parquet(new_dir)
    replaced = {
        os.path.relpath(os.path.dirname(f), new_dir)
        for f in _glob_under(new_dir, "**/*.parquet")
    }
    # hard-link every untouched live file (same filesystem by
    # construction: staging lives under the table root)
    n_untouched_rows = None
    prev_rows = int(live_mf.get("rows", -1))
    replaced_old_rows = 0
    for f in _glob_under(live, "**/*.parquet"):
        rel = os.path.relpath(f, live)
        if os.path.dirname(rel) in replaced:
            replaced_old_rows += _parquet_footer_rows(f)
            continue
        dst = os.path.join(new_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.link(f, dst)
    staged_rows = sum(
        _parquet_footer_rows(f)
        for f in _glob_under(new_dir, "**/*.parquet")
        if os.path.relpath(os.path.dirname(f), new_dir) in replaced
    )
    if prev_rows >= 0:
        n_untouched_rows = prev_rows - replaced_old_rows
    if n_untouched_rows is None or n_untouched_rows < 0:
        # manifest predates row tracking — one full count as fallback
        n_untouched_rows = (
            df.sparkSession.read.parquet(new_dir).count() - staged_rows
        )
    _commit_snapshot(
        path,
        version=version,
        new_rel=new_rel,
        rows=int(n_untouched_rows + staged_rows),
        retain_versions=retain_versions,
    )


def _parquet_footer_rows(f: str) -> int:
    """Row count from a parquet file's footer metadata — a driver-side
    metadata read, no data pages touched."""
    import pyarrow.parquet as pq

    return int(pq.ParquetFile(f).metadata.num_rows)


# ------------------------------------------------- S8 polygon readers

def polygon_from_geojson(path: str) -> list[list[list[float]]]:
    """S8: read the first feature's exterior ring from a GeoJSON file
    (polygon_from_geojson, SDS_tools.py:684-707) — stdlib json, no
    geopandas. Accepts FeatureCollection / Feature / bare geometry;
    Polygon and MultiPolygon (first polygon)."""
    with open(path) as f:
        doc = json.load(f)
    if doc.get("type") == "FeatureCollection":
        geom = doc["features"][0]["geometry"]
    elif doc.get("type") == "Feature":
        geom = doc["geometry"]
    else:
        geom = doc
    if geom["type"] == "Polygon":
        ring = geom["coordinates"][0]
    elif geom["type"] == "MultiPolygon":
        ring = geom["coordinates"][0][0]
    else:
        raise ValueError(f"unsupported geometry type {geom['type']!r}")
    return [[[float(x), float(y)] for x, y, *_ in ring]]


def polygon_from_kml(path: str) -> list[list[list[float]]]:
    """S8: extract the first <coordinates> block from a KML file
    (polygon_from_kml, SDS_tools.py:709-739). Same parsing contract as
    the reference: newline-separated "lon,lat[,alt]" tuples between the
    first coordinate tags; whitespace-separated tuples also accepted."""
    with open(path) as f:
        doc = f.read()
    a = doc.find("<coordinates>")
    b = doc.find("</coordinates>")
    if a < 0 or b < 0:
        raise ValueError("no <coordinates> element found")
    sub = doc[a + len("<coordinates>") : b]
    polygon = []
    for tok in sub.split():
        parts = tok.split(",")
        if len(parts) >= 2:
            polygon.append([float(parts[0]), float(parts[1])])
    return [polygon]


def polygons_df(spark, paths: list[str]) -> "DataFrame":
    """Polygon table from reader outputs: (polygon_id, ring array<array<double>>)
    — the broadcastable dimension the PIP/containment joins consume."""
    rows = []
    for i, p in enumerate(paths):
        ring = (polygon_from_kml(p) if p.lower().endswith(".kml") else polygon_from_geojson(p))[0]
        rows.append((i, os.path.basename(p), [[float(x), float(y)] for x, y in ring]))
    return spark.createDataFrame(rows, "polygon_id int, source string, ring array<array<double>>")


# ------------------------------------------------- small-file compaction

def partition_file_stats(path: str, partition_col: str) -> dict[str, tuple[int, int]]:
    """{partition_value: (n_files, total_bytes)} for a hive-layout parquet
    table — driver-side directory metadata only (no data read)."""
    stats: dict[str, tuple[int, int]] = {}
    prefix = f"{partition_col}="
    for entry in os.listdir(path):
        if not entry.startswith(prefix):
            continue
        pdir = os.path.join(path, entry)
        files = [
            os.path.join(pdir, f)
            for f in os.listdir(pdir)
            if f.endswith(".parquet")
        ]
        stats[entry[len(prefix):]] = (
            len(files),
            sum(os.path.getsize(f) for f in files),
        )
    return stats


MANIFEST_NAME = "_manifest.json"


def _live_dir(path: str) -> tuple[str, dict | None]:
    """Resolve a table root to its live data directory: through the
    `_manifest.json` snapshot pointer when one exists, else the root
    itself (a plain parquet table that has never been compacted)."""
    mf = os.path.join(path, MANIFEST_NAME)
    if os.path.exists(mf):
        with open(mf) as f:
            m = json.load(f)
        return os.path.join(path, m["data_dir"]), m
    return path, None


def _glob_under(dirpath: str, pattern: str) -> list[str]:
    """glob with the DIRECTORY prefix escaped: a table path containing
    glob metacharacters ('[', '?', '*') must not be treated as a
    pattern — several callers use the result to decide what to link or
    delete, where a silently-empty match would lose data."""
    import glob as _g

    return _g.glob(
        os.path.join(_g.escape(dirpath), pattern), recursive="**" in pattern
    )


def _next_version(path: str, live_mf: dict | None) -> int:
    """Version number for the next snapshot commit: one past the highest
    of the live version and every retained version — after a rollback
    the live version is older than the newest retained one, and reusing
    a rolled-past number would restage over its directory."""
    live_v = int((live_mf or {}).get("version", 0))
    return max([live_v] + list(_version_manifests(path))) + 1


def _version_manifests(path: str) -> dict[int, dict]:
    """Retained per-version manifests (`_manifest_v{N}.json`), sorted by
    version. Each commit writes one alongside the live pointer; expiry
    deletes it together with its snapshot directory, so this map IS the
    set of time-travelable versions."""
    out: dict[int, dict] = {}
    for f in _glob_under(path, "_manifest_v*.json"):
        with open(f) as fh:
            m = json.load(fh)
        out[int(m["version"])] = m
    return dict(sorted(out.items()))


def table_history(path: str) -> list[dict]:
    """Snapshot history of a compacted table, oldest first — the
    Iceberg `table.history()` analog. One entry per retained version:
    {version, data_dir, rows, n_files, live}."""
    _, live_mf = _live_dir(path)
    live_v = int(live_mf["version"]) if live_mf else None
    return [
        {
            "version": v,
            "data_dir": m["data_dir"],
            "rows": int(m.get("rows", -1)),
            "n_files": len(m.get("files", [])),
            "live": v == live_v,
        }
        for v, m in _version_manifests(path).items()
    ]


def read_table(spark, path: str, version: int | None = None) -> "DataFrame":
    """Reader half of the snapshot contract: resolve the manifest pointer
    (if any) and read the live snapshot. A reader holding a plan built
    from the previous manifest keeps working through one compaction
    cycle — the superseded snapshot directory is retained until expiry
    (`retain_versions` on compact_partitions / `expire_snapshots`).

    `version=` time-travels to a retained snapshot (Iceberg
    `VERSION AS OF`): the read resolves `_manifest_v{N}.json` instead of
    the live pointer and raises a ValueError naming the retained
    versions when N has been expired — never a silent wrong answer."""
    if version is None:
        live, _ = _live_dir(path)
        return spark.read.parquet(live)
    retained = _version_manifests(path)
    if version not in retained:
        raise ValueError(
            f"read_table: snapshot v{version} of {path} is not retained "
            f"(available: {sorted(retained) or 'none — table never compacted'}); "
            "raise retain_versions on compact_partitions to keep more history"
        )
    return spark.read.parquet(os.path.join(path, retained[version]["data_dir"]))


def rollback_table(path: str, version: int) -> int:
    """Atomically repoint the live table to a RETAINED older snapshot —
    Iceberg's `rollback_to_snapshot`. Pure pointer swap (same
    write-tmp + os.replace commit as compact_partitions), so a kill at
    any moment leaves readers on a complete snapshot, and the versions
    rolled past stay time-travelable until expiry. The next compaction
    commit continues from the HIGHEST retained version (never reuses a
    rolled-past number), so history stays strictly monotonic. Returns
    the previously-live version."""
    retained = _version_manifests(path)
    if version not in retained:
        raise ValueError(
            f"rollback_table: snapshot v{version} of {path} is not retained "
            f"(available: {sorted(retained) or 'none — table never compacted'})"
        )
    if not os.path.isdir(os.path.join(path, retained[version]["data_dir"])):
        raise ValueError(
            f"rollback_table: snapshot v{version} of {path} is orphaned "
            "(its data directory is gone — crashed expiry); refusing to "
            "make it live"
        )
    _, live_mf = _live_dir(path)
    prev = int(live_mf["version"]) if live_mf else 0
    mf_path = os.path.join(path, MANIFEST_NAME)
    tmp_mf = mf_path + ".tmp"
    with open(tmp_mf, "w") as f:
        json.dump(retained[version], f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp_mf, mf_path)
    return prev


def expire_snapshots(
    path: str, keep_last: int = 2, keep_also: set[int] | None = None
) -> list[int]:
    """Drop all but the newest `keep_last` retained snapshots (the live
    one is always kept; `keep_also` versions too — the commit path uses
    it to protect the OUTGOING live snapshot, so a reader that resolved
    the pointer just before a commit never loses its files regardless
    of where that version sits in the numbering, e.g. after a rollback)
    — Iceberg's `expire_snapshots` maintenance action. Deletes each
    expired version's data directory AND its version manifest in that
    order (a crash between the two leaves an orphan manifest whose dir
    is gone; read_table/rollback on it fail loudly and the next
    compaction's sweep removes it). Returns the expired versions."""
    import shutil

    _, live_mf = _live_dir(path)
    live_v = int(live_mf["version"]) if live_mf else -1
    retained = _version_manifests(path)
    versions = sorted(retained)
    keep = set(versions[-max(1, keep_last):]) | {live_v} | (keep_also or set())
    expired = []
    for v in versions:
        if v in keep:
            continue
        d = os.path.join(path, retained[v]["data_dir"])
        if os.path.isdir(d):
            shutil.rmtree(d)
        os.remove(os.path.join(path, f"_manifest_v{v}.json"))
        expired.append(v)
    return expired


def compact_partitions(
    spark,
    path: str,
    partition_col: str = "warc_month",
    target_mb: int = 128,
    retain_versions: int = 2,
    _crash_before_commit=None,
    _crash_between_writes=None,
) -> dict[str, int]:
    """Bin-pack each hive partition of a parquet table into
    ceil(bytes / target_mb) files — the maintenance operator that keeps a
    continuously-ingested table scannable (per-file open/footer/listing
    overhead dominates once files shrink below a few MB; at 100 TB the
    same rule holds with 128 MB-1 GB targets, and this is what Iceberg's
    rewrite_data_files action does).

    One shuffle keyed by (partition, salt) where salt < the partition's
    target file count (literal map expression, so skewed partitions get
    more files). The commit is a MANIFEST-POINTER SWAP, the same shape
    as Iceberg's snapshot commit: the rewrite stages into a fresh
    versioned directory `_data/v{N}` under the table root, is validated
    against the source row count, and becomes live via one atomic
    `os.replace` of `_manifest.json` — there is NO window in which a
    reader resolving through `read_table` sees a missing or partial
    table (a kill at ANY point leaves the manifest bytes either entirely
    old or entirely new; asserted by the kill-injection test in
    tests/test_sinks_misc.py). Each commit also writes a per-version
    manifest `_manifest_v{N}.json`; the newest `retain_versions`
    snapshots are retained (default 2 = live + one grace copy for
    in-flight readers), older ones expired post-commit — Iceberg's
    snapshot retention, with `read_table(version=N)` /
    `table_history()` / `expire_snapshots()` providing the time-travel
    surface. Underscore-prefixed `_data` is invisible to
    Spark's file index, so a not-yet-migrated table still plain-reads
    correctly mid-staging. Returns the planned
    {partition_value: n_files} map.
    """
    import shutil

    live, manifest = _live_dir(path)

    # entry sweep: version dirs referenced by neither the live pointer
    # nor a retained per-version manifest are aborted stagings (crash
    # mid-write) — delete them; retained snapshots stay until expiry
    retained = _version_manifests(path)
    keep_dirs = {
        os.path.abspath(os.path.join(path, m["data_dir"]))
        for m in retained.values()
    }
    if manifest is not None:
        keep_dirs.add(os.path.abspath(live))
    for d in _glob_under(path, os.path.join("_data", "v*")):
        if os.path.abspath(d) not in keep_dirs:
            shutil.rmtree(d)
    # orphan version manifests (dir deleted by a crashed expiry) fail
    # loudly in read_table; sweep them here so history stays truthful
    for v, m in retained.items():
        if not os.path.isdir(os.path.join(path, m["data_dir"])):
            os.remove(os.path.join(path, f"_manifest_v{v}.json"))
    version = _next_version(path, manifest)
    if manifest is not None:
        # pre-migration loose files, superseded by the first snapshot
        # commit, are swept once a manifest governs the table
        for entry in os.listdir(path):
            p = os.path.join(path, entry)
            if entry.startswith(f"{partition_col}="):
                shutil.rmtree(p)
            elif entry.endswith(".parquet") and os.path.isfile(p):
                os.remove(p)
        live, manifest = _live_dir(path)  # unchanged, re-read for safety

    stats = partition_file_stats(live, partition_col)
    target = max(1, target_mb) * 1024 * 1024
    plan = {
        pv: max(1, -(-size // target)) for pv, (_n, size) in stats.items()
    }
    df = spark.read.parquet(live)
    src_rows = df.count()
    nf = F.create_map(
        *[x for pv, n in sorted(plan.items()) for x in (F.lit(pv), F.lit(int(n)))]
    )
    salted = df.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), nf[F.col(partition_col)]),
    )
    new_rel = os.path.join("_data", f"v{version}")
    new_dir = os.path.join(path, new_rel)
    (
        salted.repartition(F.col(partition_col), F.col("_salt"))
        .drop("_salt")
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(new_dir)
    )
    # validate the staged rewrite BEFORE the commit becomes visible
    staged_rows = spark.read.parquet(new_dir).count()
    if staged_rows != src_rows:
        shutil.rmtree(new_dir)
        raise RuntimeError(
            f"compact_partitions: staged rewrite has {staged_rows} rows, "
            f"source has {src_rows}; aborting commit (manifest untouched)"
        )
    if _crash_before_commit is not None:
        _crash_before_commit()  # test-only kill injection point
    _commit_snapshot(
        path,
        version=version,
        new_rel=new_rel,
        rows=int(src_rows),
        plan={pv: int(n) for pv, n in plan.items()},
        retain_versions=retain_versions,
        _crash_between_writes=_crash_between_writes,
    )
    return {pv: int(n) for pv, n in plan.items()}


def _commit_snapshot(
    path: str,
    version: int,
    new_rel: str,
    rows: int,
    plan: dict | None = None,
    retain_versions: int = 2,
    _crash_between_writes=None,
) -> dict:
    """Shared commit tail for snapshot writers (compaction, snapshot-
    aware partition overwrite): write the per-version manifest (the
    time-travel target), atomically swap the live pointer, then expire
    history past `retain_versions` — always protecting the OUTGOING
    live version as the in-flight-reader grace copy, even when a
    rollback has left it numerically old. Both manifest writes are
    tmp + os.replace, so a kill at ANY point leaves each file either
    entirely old or entirely new — never truncated JSON that would
    brick _version_manifests. A crash between the per-version write and
    the pointer swap leaves a retained-but-never-live snapshot in the
    history: benign (its data was fully staged and validated) and
    indistinguishable on disk from a rolled-past version, it simply
    expires under normal retention."""
    new_dir = os.path.join(path, new_rel)
    files = sorted(
        os.path.relpath(f, path) for f in _glob_under(new_dir, "**/*.parquet")
    )
    mf = {
        "version": version,
        "data_dir": new_rel,
        "files": files,
        "rows": int(rows),
        "plan": plan or {},
    }
    _, prev_mf = _live_dir(path)
    prev_live = {int(prev_mf["version"])} if prev_mf else set()
    vmf_path = os.path.join(path, f"_manifest_v{version}.json")
    with open(vmf_path + ".tmp", "w") as f:
        json.dump(mf, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(vmf_path + ".tmp", vmf_path)
    if _crash_between_writes is not None:
        _crash_between_writes()  # test-only kill injection point
    mf_path = os.path.join(path, MANIFEST_NAME)
    tmp_mf = mf_path + ".tmp"
    with open(tmp_mf, "w") as f:
        json.dump(mf, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp_mf, mf_path)  # THE commit: atomic pointer swap
    expire_snapshots(path, keep_last=max(1, retain_versions), keep_also=prev_live)
    return mf


# --------------------------------------------------- bucketed tables

def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """Persist as a bucketed (optionally sorted) parquet table.

    Bucketing pre-shuffles ONCE at write time: any later equi-join or
    aggregate keyed on `bucket_col` between tables with the same bucket
    count plans with ZERO exchanges on the bucketed sides (asserted in
    tests/test_plans.py) — the 100 TB pattern for repeatedly-joined fact
    tables (dedup assignments, per-doc metrics) where one shuffle is
    amortized over every downstream query. Requires the session catalog
    (bucket metadata lives there, exactly like Iceberg/Hive bucketing).
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)
