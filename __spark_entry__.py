"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship shoreline pipeline on the deterministic
sf0.001 webpages table. `queries()` exposes one callable per implemented
operator family from SURVEY.md §2 (plus the training-data-pipeline ops);
`oracle_sql()` gives the DuckDB-equivalent SQL for every relationally
expressible one — including the sequential despike fixpoint (recursive
CTE), the Lomb-Scargle slope search (trig-moment aggregates), and the
xxhash64-dependent dedup trio (minhash_assign / neardup_pairs /
fingerprints: Spark's XXH64 replayed bit-for-bit in SQL via HUGEINT
split arithmetic, hashing.xxh64_string_steps), and the class-refined
shoreline extraction (per-owner-tile buffered marching squares,
refined_crossings_oracle_sql), PCA pansharpening (top eigenvector via a
power-iteration recursive CTE), and the approximate-ANN trio (ann_approx:
sign-LSH hyperplanes replayed from splitmix64 bits, IVF spherical
k-means and per-subspace PQ codebook training UNROLLED as materialized
CTE stages, then the same probe/ADC/exact-rerank algebra —
similarity.ann_approx_oracle_sql). Every registered query is
oracle-checked; NumPy-parity tests under tests/ cover the kernels
besides.

Column-name/rounding discipline: every computed column is aliased
identically in both engines and doubles are rounded (2-6 dp) on BOTH
sides so order-insensitive value hashes match.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.01


def _parquet_rows(path: str) -> int:
    """Row count from parquet footer metadata only — a constant-cost
    driver-side read (no Spark job, no data scan), the same metadata
    DuckDB's count(*) answers from; at 100 TB this is what an
    Iceberg/parquet catalog count is."""
    import glob as _glob
    import os as _os

    from coastsat_spark.operators.sinks import _parquet_footer_rows

    files = (
        sorted(_glob.glob(_os.path.join(path, "*.parquet")))
        if _os.path.isdir(path)
        else [path]
    )
    return sum(_parquet_footer_rows(f) for f in files)


def _epoch(col):
    # NTZ-safe epoch seconds (driver tables use TIMESTAMP_NTZ)
    return col.cast("timestamp").cast("double")


def _webpages(spark: SparkSession, sf_dir: str) -> DataFrame:
    from coastsat_spark.datagen import SF_ROWS, webpages_df

    n = SF_ROWS.get(_sf_of(sf_dir), 60_000)
    return webpages_df(spark, n)


# --------------------------------------------------------------- entry

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: webpages -> tiles -> raster -> Otsu -> marching squares ->
    shoreline points -> broadcast transect join -> median chainage series."""
    from coastsat_spark.datagen import webpages_df
    from coastsat_spark.plans import pipeline

    docs = webpages_df(spark, 6_000)
    res = pipeline.run_flagship(spark, docs)
    return res.timeseries


# ---------------------------------------------------------- query defs
# Derived lat/lon used by the SQL-oracle-checked spatial queries: a pure
# arithmetic function of doc_id so Spark and DuckDB compute bit-identical
# coordinates (no randomness crosses the engine boundary).
_LAT_SQL = "(cast((doc_id * 2654435761) % 1700000 as double) / 10000.0) - 85.0"
_LON_SQL = "(cast((doc_id * 104729) % 3600000 as double) / 10000.0) - 180.0"

_TOKEN_RE_SQL = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(_t(sf_dir, "lineitem"))
    return (
        li.filter(F.col("l_shipdate") <= "1995-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_catalog_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S2 availability check: counts per group + incremental skip shape
    o = spark.read.parquet(_t(sf_dir, "orders"))
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


def q_filter_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F2/F3/F4 cascade: cheap predicates + date-epoch filter
    li = spark.read.parquet(_t(sf_dir, "lineitem"))
    return (
        li.filter(
            (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
            & ~((F.col("l_returnflag") == "R") & (F.year("l_shipdate") >= 1995))
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
        )
    )


def q_union_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F5 union-typed georef filter: numeric threshold OR flag pass
    o = spark.read.parquet(_t(sf_dir, "orders"))
    acc_flag = F.when(F.col("o_orderstatus") != "O", F.col("o_orderstatus"))
    keep = F.when(acc_flag.isNotNull(), acc_flag == "F").otherwise(
        F.col("o_totalprice") <= 150000.0
    )
    return (
        o.withColumn("keep", keep)
        .filter("keep")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


def q_equi_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J5/J8: broadcast equi-join + aggregate
    o = spark.read.parquet(_t(sf_dir, "orders"))
    c = spark.read.parquet(_t(sf_dir, "customer"))
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # U3: available minus processed (customers with no orders)
    o = spark.read.parquet(_t(sf_dir, "orders"))
    c = spark.read.parquet(_t(sf_dir, "customer"))
    done = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        c.join(done, c["c_custkey"] == done["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_without_orders"))
    )


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F6 count-rule semi-join: lineitems of high-value orders
    o = spark.read.parquet(_t(sf_dir, "orders"))
    li = spark.read.parquet(_t(sf_dir, "lineitem"))
    big = o.filter(F.col("o_totalprice") > 200000).select("o_orderkey")
    return (
        li.join(big, li["l_orderkey"] == big["o_orderkey"], "left_semi")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # O3 top-k per group via window rank
    li = spark.read.parquet(_t(sf_dir, "lineitem"))
    w = W.partitionBy("l_returnflag").orderBy(
        F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    return (
        li.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "l_returnflag", "rank", "l_orderkey", "l_linenumber",
            F.round("l_extendedprice", 2).alias("price"),
        )
    )


def q_argmax_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    # O4 argmax: most common order priority per status (count desc, name asc)
    o = spark.read.parquet(_t(sf_dir, "orders"))
    g = o.groupBy("o_orderstatus", "o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("o_orderstatus").orderBy(F.desc("n"), F.asc("o_orderpriority"))
    return (
        g.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("o_orderstatus", F.col("o_orderpriority").alias("top_priority"), "n")
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization over the events table (30-min gap), BOTH
    engines in one driver row: the batch operator (one user-keyed shuffle
    + lag/running-sum windows) unioned with the streaming operator's
    batch evaluation (native session_window). Both break a session only
    when the gap STRICTLY exceeds g — session_window merges adjacent
    windows, measured and pinned by the planted exact-boundary test in
    tests/test_streaming.py — and each engine is mirrored separately in
    the DuckDB oracle, so the streaming operator gets a
    value-hash-checked driver row too."""
    from coastsat_spark.operators.timeseries import sessionize
    from coastsat_spark.streaming.ingest import streaming_sessions

    ev = spark.read.parquet(_t(sf_dir, "events"))
    b = sessionize(ev, gap_seconds=1800.0).select(
        F.lit("batch").alias("engine"),
        "user_id",
        F.col("start_ts").cast("timestamp").alias("session_start"),
        "n_events",
        "total_value",
    )
    s = streaming_sessions(ev, gap="30 minutes").select(
        F.lit("session_window").alias("engine"),
        "user_id",
        F.col("session_start").cast("timestamp").alias("session_start"),
        "n_events",
        "total_value",
    )
    return b.unionByName(s)


def q_dedup_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W1: close-timestamp session dedup keep-best
    from coastsat_spark.operators.timeseries import dedup_close_timestamps

    ev = spark.read.parquet(_t(sf_dir, "events"))
    kept = dedup_close_timestamps(
        ev,
        ts_col="ts",
        gap_seconds=3600.0,
        priority=[F.desc("value"), F.asc("event_id")],
        partition_cols=["user_id"],
        tiebreakers=[F.asc("event_id")],
    )
    return kept.select("user_id", "event_id")


def q_timestep_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W6: distribution of consecutive timestamp gaps per user
    ev = spark.read.parquet(_t(sf_dir, "events"))
    w = W.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    gap = _epoch(F.col("ts")) - F.lag(_epoch(F.col("ts"))).over(w)
    return (
        ev.withColumn("gap_s", gap)
        .filter(F.col("gap_s").isNotNull())
        .groupBy(F.floor(F.col("gap_s") / 600).cast("long").alias("gap_bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_seasonal_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A6 (DJF year-shift seasonal buckets) + A7 (trailing-month cutoff)
    # merged under one `period_kind` column — one registry row, both
    # operators oracle-checked (frees a slot under the 50-row cap)
    from coastsat_spark.operators.timeseries import season_bucket

    ev = spark.read.parquet(_t(sf_dir, "events"))
    seasonal = ev.groupBy(
        "event_type", season_bucket(F.col("ts")).alias("period")
    ).agg(F.round(F.avg("value"), 4).alias("mean_value"), F.count(F.lit(1)).alias("n"))
    seasonal = seasonal.select(
        F.lit("season").alias("period_kind"), "event_type", "period", "mean_value", "n"
    )
    labeled = ev.withColumn(
        "period", F.make_date(F.year("ts"), F.month("ts"), F.lit(15))
    )
    # 5-day trailing cutoff (the operator default is the reference's 30
    # days, SDS_transects.py:660-661; events span one month so the query
    # uses a band that keeps the check non-degenerate). The cutoff scalar
    # stays in the plan (broadcast 1-row cross join) — no driver action.
    cutoff = labeled.agg(F.date_sub(F.max(F.col("ts").cast("date")), 5).alias("_cut"))
    monthly = (
        labeled.crossJoin(F.broadcast(cutoff))
        .filter(F.col("period") <= F.col("_cut"))
        .groupBy("event_type", "period")
        .agg(F.round(F.avg("value"), 4).alias("mean_value"), F.count(F.lit(1)).alias("n"))
        .select(F.lit("month").alias("period_kind"), "event_type", "period", "mean_value", "n")
    )
    return seasonal.unionByName(monthly)


def q_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A8: per-group linear regression via built-in aggregates
    ev = spark.read.parquet(_t(sf_dir, "events"))
    w = W.partitionBy("event_type")
    x = (_epoch(F.col("ts")) - F.min(_epoch(F.col("ts"))).over(w)) / (365.25 * 86400.0)
    return (
        ev.withColumn("x_years", x)
        .groupBy("event_type")
        .agg(
            F.round(F.regr_slope(F.col("value"), F.col("x_years")), 4).alias("trend"),
            F.round(F.regr_intercept(F.col("value"), F.col("x_years")), 4).alias("intercept"),
            F.round(F.corr(F.col("value"), F.col("x_years")), 4).alias("rvalue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def q_error_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A9: rmse / mean / std / q90 per group
    ev = spark.read.parquet(_t(sf_dir, "events"))
    e = F.col("value") - 50.0
    return (
        ev.withColumn("err", e)
        .groupBy("event_type")
        .agg(
            F.round(F.sqrt(F.avg(F.col("err") * F.col("err"))), 4).alias("rmse"),
            F.round(F.avg("err"), 4).alias("mean_err"),
            F.round(F.stddev_pop("err"), 4).alias("std_err"),
            F.round(F.expr("percentile(abs(err), 0.9)"), 4).alias("q90"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J3: forward as-of join of click events to the view-event stream
    from coastsat_spark.operators.timeseries import asof_join

    ev = spark.read.parquet(_t(sf_dir, "events"))
    left = ev.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    right = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.min("value").alias("view_value"))
    )
    out = asof_join(
        left,
        right,
        left_ts="ts",
        right_ts="ts",
        value_cols=["view_value"],
        direction="forward",
        partition_cols=["user_id"],
    )
    return out.select(
        "user_id", "event_id", F.round("view_value", 4).alias("view_value")
    )


def q_validation_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J4: interpolating temporal join (3/10-day bands)
    from coastsat_spark.operators.timeseries import validation_join

    ev = spark.read.parquet(_t(sf_dir, "events"))
    sat = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").cast("string").alias("transect"),
        F.col("ts").alias("scene_month"),
        F.col("event_id"),
        F.col("value").alias("chainage"),
    )
    survey = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").cast("string").alias("transect"), "ts")
        .agg(F.min("value").alias("chainage"))
    )
    out = validation_join(sat.drop("event_id"), survey, min_days=3, max_days=10)
    # floor(x*1e4 + 0.5)/1e4 instead of round(x, 4): the interpolated
    # value lands EXACTLY on .xxxx5 ties (2-decimal inputs x day-ratio
    # weights like 3/8), where Spark's round (BigDecimal HALF_UP on the
    # shortest decimal repr) and DuckDB's (binary multiply) disagree by
    # 1e-4; the floor form is the same IEEE mul/add/floor in both
    # engines, so ties break bit-identically (caught by the sf0.1 sweep)
    def r4(c):
        return F.floor(F.col(c) * 10000 + F.lit(0.5)) / 10000

    return out.select(
        "transect",
        "scene_month",
        r4("chainage").alias("sat_value"),
        r4("survey_chainage").alias("survey_value"),
    )


def q_cell_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S5/EP1 + north-star skew defense: deterministic lat/lon ->
    # ADAPTIVE quad-cell assignment (hot tiles with > cap docs re-key a
    # resolution finer, up to 2 extra levels) -> per-tile counts. The
    # DuckDB oracle replays the identical peel-off chain, so both the
    # base cell arithmetic and the split logic are hash-checked.
    from coastsat_spark.operators.tiling import adaptive_tiles

    d = spark.read.parquet(_t(sf_dir, "documents"))
    at = adaptive_tiles(
        d,
        lat=F.expr(_LAT_SQL),
        lon=F.expr(_LON_SQL),
        base_res=2,
        cap=20,
        max_levels=2,
    )
    return at.groupBy("atile").agg(F.count(F.lit(1)).alias("n_docs"))


_PIP_POLY = [(-30.0, -10.0), (10.0, -25.0), (40.0, 5.0), (0.0, 20.0)]  # convex, ccw


def _pip_inside_sql(lat_expr: str, lon_expr: str) -> str:
    """Convex-polygon containment as half-plane sign tests (pure SQL)."""
    terms = []
    n = len(_PIP_POLY)
    for i in range(n):
        x0, y0 = _PIP_POLY[i]
        x1, y1 = _PIP_POLY[(i + 1) % n]
        terms.append(
            f"(({x1} - {x0}) * (({lat_expr}) - {y0}) - ({y1} - {y0}) * (({lon_expr}) - {x0}) >= 0)"
        )
    return " AND ".join(terms)


def q_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J6/PIP: point-in-polygon containment counts per language
    d = spark.read.parquet(_t(sf_dir, "documents"))
    inside = F.expr(_pip_inside_sql(_LAT_SQL, _LON_SQL))
    return (
        d.withColumn("inside", inside)
        .groupBy("lang")
        .agg(
            F.sum(F.col("inside").cast("int")).alias("n_inside"),
            F.count(F.lit(1)).alias("n_total"),
        )
    )


_KNN_QUERIES = [(1, 10.0, -40.0), (2, -5.0, 20.0), (3, 60.0, 120.0)]


def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # kNN join: 5 nearest docs to each literal query point (planar degrees)
    d = spark.read.parquet(_t(sf_dir, "documents"))
    qs = spark.createDataFrame(_KNN_QUERIES, "q_id int, q_lat double, q_lon double")
    pts = d.select(
        "doc_id", F.expr(_LAT_SQL).alias("lat"), F.expr(_LON_SQL).alias("lon")
    )
    j = pts.crossJoin(F.broadcast(qs))
    dist = F.sqrt(
        (F.col("lat") - F.col("q_lat")) ** 2 + (F.col("lon") - F.col("q_lon")) ** 2
    )
    w = W.partitionBy("q_id").orderBy(F.asc("dist"), F.asc("doc_id"))
    return (
        j.withColumn("dist", dist)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("q_id", "rank", "doc_id", F.round("dist", 6).alias("dist"))
    )


_BBOX_SQL = {
    "x0": "cast((doc_id * 7919) % 300 as double) / 10.0",
    "y0": "cast((doc_id * 104729) % 300 as double) / 10.0",
    "w": "cast(2 + doc_id % 60 as double)",
    "h": "cast(2 + doc_id % 55 as double)",
}


def q_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J6: drop bboxes contained in a same-bucket bbox (container kept)
    from coastsat_spark.operators.timeseries import containment_dedup

    d = spark.read.parquet(_t(sf_dir, "documents"))
    boxes = d.select(
        F.col("doc_id").alias("id"),
        (F.col("doc_id") % 20).alias("bkt"),
        F.expr(_BBOX_SQL["x0"]).alias("x0"),
        F.expr(_BBOX_SQL["y0"]).alias("y0"),
        (F.expr(_BBOX_SQL["x0"]) + F.expr(_BBOX_SQL["w"])).alias("x1"),
        (F.expr(_BBOX_SQL["y0"]) + F.expr(_BBOX_SQL["h"])).alias("y1"),
    )
    return containment_dedup(boxes, "bkt", ("x0", "y0", "x1", "y1"), "id")


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # token counting via the shared BPE-ish regex (SQL-expressible form)
    d = spark.read.parquet(_t(sf_dir, "documents"))
    # NB: pattern passed as a lit (not an SQL literal) — Spark SQL string
    # escaping would eat the backslash in \s, DuckDB's would not.
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_measured"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_TOKEN_RE_SQL), F.lit(0))).alias(
            "n_tokens"
        ),
    )


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from coastsat_spark.operators.dedup import exact_dedup

    d = spark.read.parquet(_t(sf_dir, "documents"))
    return exact_dedup(d)


def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from coastsat_spark.operators.dedup import jaccard_pairs

    d = spark.read.parquet(_t(sf_dir, "documents"))
    out = jaccard_pairs(d, n=5, threshold=0.7, max_doc_freq=None)
    return out.select("id_a", "id_b", "n_common", "n_a", "n_b", F.round("jaccard", 6).alias("jaccard"))


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rollup across (returnflag, linestatus) — free Spark SQL surface
    li = spark.read.parquet(_t(sf_dir, "lineitem"))
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
    )


def q_union_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    # U1/U2/A14: tagged union of per-source subsets + chronological order
    ev = spark.read.parquet(_t(sf_dir, "events"))
    a = ev.filter(F.col("event_type") == "click").withColumn("src", F.lit("a"))
    b = ev.filter(F.col("event_type") == "purchase").withColumn("src", F.lit("b"))
    u = a.unionByName(b)
    return u.groupBy("src", F.date_trunc("month", "ts").alias("month")).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total")
    )


# ---------------------- sensor-model / raster oracle queries (EP1/EP2)
# The band model, tile/pixel assignment and the transect theta-join are
# bit-identical column arithmetic by design (operators/tiling.py), so the
# *real operators* run here over documents with derived lat/lon and are
# checked against an independent DuckDB reimplementation — the flagship's
# ingest+aggregate math no longer rests solely on the NumPy self-oracle.

# coastal band (lat in [-16,16), lon in [-44,44)) so the theta-join is
# non-degenerate at sf0.01: points concentrate around the synthetic coast.
_CLAT_SQL = "(cast((doc_id * 2654435761) % 320000 as double) / 10000.0) - 16.0"
_CLON_SQL = "(cast((doc_id * 104729) % 880000 as double) / 10000.0) - 44.0"

# grid tuned so the sf0.01 documents table (500 rows) fills scenes densely
# enough that the scene_quality gates exercise BOTH keep branches (48
# false / 16 true at sf0.01): 16x16 world tiles of 4x4 px over the
# coastal band.
_OR_TILE_RES = 4
_OR_GRID_LOG2 = 2
# theta-join widened so medians aggregate >1 point (129 pairs / 75 groups)
_TI_ALONG = 1.5
_TI_MAXD = 6.0


def _doc_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(_t(sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.expr(_CLAT_SQL).alias("lat"),
        F.expr(_CLON_SQL).alias("lon"),
        (F.col("doc_id") % 4).alias("scene_month"),
    )


def _doc_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from coastsat_spark.operators import raster, tiling

    geo = _doc_geo(spark, sf_dir)
    prepared = tiling.with_tiles(
        tiling.with_bands(geo), tile_res=_OR_TILE_RES, grid_log2=_OR_GRID_LOG2
    )
    return raster.aggregate_pixels(prepared)


def q_pixel_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S12/A3: per-(tile, scene, pixel) band means + cloud fraction, the
    # flagship's shuffle-1 aggregate, over deterministic derived geo.
    px = _doc_pixels(spark, sf_dir)
    from coastsat_spark.operators.tiling import BANDS

    return px.select(
        "tile", "scene_month", "px_row", "px_col",
        *[F.round(b, 4).alias(b) for b in BANDS],
        "n_docs",
        F.round("cloud_frac", 4).alias("cloud_frac"),
    )


def q_scene_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # F2/F3/F7 + two-class presence gates as one relational aggregate.
    from coastsat_spark.operators import raster

    px = _doc_pixels(spark, sf_dir)
    q = raster.scene_quality(px, raster.ShorelineSettings(grid_log2=_OR_GRID_LOG2))
    return q.select(
        "tile", "scene_month", "filled_px", "cloud_px", "n_docs",
        "water_px", "land_px",
        F.round("filled_frac", 6).alias("filled_frac"),
        F.round("cloud_frac", 6).alias("cloud_frac"),
        F.round("combined_bad_frac", 6).alias("combined_bad_frac"),
        F.col("keep").cast("int").alias("keep"),
    )


def q_transect_intersections(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J1+A1: the real transect_join (d_line/d_origin/bearing predicates)
    # + exact interpolated median, DuckDB-checked.
    from coastsat_spark.operators import transects as TR

    d = spark.read.parquet(_t(sf_dir, "documents"))
    pts = d.select(
        "doc_id",
        F.expr(_CLAT_SQL).alias("lat"),
        F.expr(_CLON_SQL).alias("lon"),
        (F.col("doc_id") % 2).alias("scene"),
    )
    pairs = TR.transect_join(
        pts, TR.transects_df(spark, 41), along_dist=_TI_ALONG, max_dist_origin=_TI_MAXD
    )
    med = TR.median_intersections(pairs, time_col="scene")
    return med.select(
        "transect", "scene",
        F.round("chainage", 6).alias("med_chainage"),
        "n_points",
    )


def q_same_day_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W2: same-day majority-zone dedup + cap (filter_S2_collection)
    from coastsat_spark.operators.timeseries import same_day_mode_dedup

    ev = spark.read.parquet(_t(sf_dir, "events"))
    scenes = ev.select(
        "event_type", "event_id", "ts", (F.col("user_id") % 5).alias("zone")
    )
    out = same_day_mode_dedup(
        scenes,
        ts_col="ts",
        zone_col="zone",
        cap=2,
        partition_cols=["event_type"],
        tiebreakers=[F.asc("event_id")],
    )
    return out.select("event_type", "event_id", "zone")


def q_rescale_stretch(spark: SparkSession, sf_dir: str) -> DataFrame:
    # R14/A10: per-scene percentile clip + [0,1] stretch, relational form
    from coastsat_spark.operators.raster import rescale_pixels

    px = _doc_pixels(spark, sf_dir)
    out = rescale_pixels(px, cols=["green", "swir"], prc_clip=99.0)
    return out.select(
        "tile", "scene_month", "px_row", "px_col",
        F.round("green_adj", 6).alias("green_adj"),
        F.round("swir_adj", 6).alias("swir_adj"),
    )


def q_class_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A11: per-class MNDWI histogram (SDS_shoreline.py:1000-1005 analog):
    # classes from the relational water/land cuts, 0.1-wide value bins.
    px = _doc_pixels(spark, sf_dir)
    mndwi = (F.col("swir") - F.col("green")) / (F.col("swir") + F.col("green"))
    label = (
        F.when(F.col("cloud_frac") > 0.5, "cloud")
        .when(mndwi < -0.2, "water")
        .when(mndwi > 0.1, "land")
        .otherwise("mixed")
    )
    return (
        px.withColumn("label", label)
        .withColumn("bin", F.floor(mndwi * 10).cast("long"))
        .groupBy("label", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # embedding-cosine near-dup pairs (training-data op family): exact
    # all-pairs baseline, DuckDB-checked; embedding_dup_pairs_lsh is the
    # bucketed scale path (recall test in tests/test_similarity.py)
    from coastsat_spark.operators.similarity import embedding_dup_pairs

    emb = spark.read.parquet(_t(sf_dir, "embeddings"))
    out = embedding_dup_pairs(emb, threshold=0.3)
    return out.select("id_a", "id_b", F.round("cosine", 5).alias("cosine"))


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    # §2.8 JSON family: serialize a struct per row, parse it back with
    # get_json_object / from_json, aggregate the extracted fields. The
    # oracle is the plain relational equivalent, so any defect in the
    # round-trip (quoting, typing, path eval) breaks the value hash.
    d = spark.read.parquet(_t(sf_dir, "documents"))
    j = d.select(
        "doc_id",
        F.to_json(
            F.struct(F.col("lang"), F.col("doc_id").alias("id"), F.length("text").alias("n"))
        ).alias("js"),
    )
    parsed = j.select(
        F.get_json_object("js", "$.lang").alias("lang"),
        F.from_json(
            F.col("js"), "lang string, id long, n long"
        )["n"].alias("n_chars"),
    )
    return parsed.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


# ------------------------------- rows-only queries (no SQL equivalent)

def q_shoreline_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    # R7 + find_wl_contours2: extraction gated by the buffer around the
    # previous round's shoreline, thresholding via the class-refined
    # branch where sand pixels exist (SDS_shoreline.py:195-202, 525-584).
    # DuckDB-value-hash-checked end to end (refined_crossings_oracle_sql):
    # like shoreline_crossings, the query projects the DISTINCT sub-pixel
    # crossing set (min_contour_len_px=0 so polyline structure — covered
    # by shoreline_extract tests/bench — drops out), over the relational
    # pixel mirror so SQL can replay the base pass, the per-tile buffer
    # dilation, the classify+balanced-subsample refined Otsu, and the
    # fallback, with the refined threshold exposed as t_mndwi.
    from coastsat_spark.operators import raster

    px = _doc_pixels(spark, sf_dir).persist()
    s0 = raster.ShorelineSettings(grid_log2=_OR_GRID_LOG2, min_contour_len_px=0.0)
    base = raster.extract_shorelines(px, s0)
    # rasterize the prior shoreline onto the tile grids — the
    # reference_shoreline input, a BOUNDED dimension (one polyline set
    # per world tile, like the reference's single reference_shoreline,
    # SDS_shoreline.py:525). Collected once on the driver and shipped
    # via sparkContext.broadcast inside extract_shorelines (executors
    # receive it once, not per task).
    ref = (
        base.select(
            "tile",
            F.round("px_y").cast("int").alias("px_row"),
            F.round("px_x").cast("int").alias("px_col"),
        )
        .distinct()
        .toPandas()
    )
    s1 = raster.ShorelineSettings(
        grid_log2=_OR_GRID_LOG2, min_contour_len_px=0.0,
        min_sand_px=2, max_dist_ref=1.5,
    )
    pts = raster.extract_shorelines(px, s1, reference=ref)
    return pts.select(
        "tile", "scene_month",
        F.round("px_x", 6).alias("px_x"),
        F.round("px_y", 6).alias("px_y"),
        F.round("t_mndwi", 6).alias("t_mndwi"),
    ).distinct()


def q_pansharpen(spark: SparkSession, sf_dir: str) -> DataFrame:
    # R4 S6-analog: per-scene PCA pansharpening (SDS_preprocess.py:466-514)
    # over the same relational pixel mirror the pixel_aggregate oracle
    # replays, so DuckDB can value-hash-check the whole kernel: covariance
    # -> top eigenvector (power-iteration CTE) -> hist-match rank swap ->
    # inverse transform (see raster.pansharpen_oracle_tail_sql).
    from coastsat_spark.operators import raster

    px = _doc_pixels(spark, sf_dir)
    out = raster.pansharpen_scenes(
        px, raster.ShorelineSettings(grid_log2=_OR_GRID_LOG2)
    )
    from coastsat_spark.operators.tiling import BANDS

    return out.select(
        "tile", "scene_month", "px_row", "px_col",
        *[F.round(b, 4).alias(b) for b in BANDS],
    )


def q_qc_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    # J2/A2: the QC-variant transect join (no bearing predicate) + the
    # full nan/max/auto policy cascade (multiple_inter='auto' exercises
    # the per-transect prc_over window too), over the same derived point
    # table the transect_intersections oracle replays — the whole cascade
    # is relational, so DuckDB value-hash-checks it end to end
    # (SDS_transects.py:318-381).
    from coastsat_spark.operators import transects as TR

    d = spark.read.parquet(_t(sf_dir, "documents"))
    pts = d.select(
        "doc_id",
        F.expr(_CLAT_SQL).alias("lat"),
        F.expr(_CLON_SQL).alias("lon"),
        (F.col("doc_id") % 2).alias("scene"),
    )
    pairs = TR.transect_join(
        pts, TR.transects_df(spark, 41),
        along_dist=_TI_ALONG, max_dist_origin=_TI_MAXD, use_bearing=False,
    )
    qc = TR.qc_intersections(
        pairs, n_scenes=2, time_col="scene", multiple_inter="auto", auto_prc=0.1
    )
    return qc.select(
        "transect", "scene",
        F.round("chainage", 6).alias("chainage"),
        F.round("med_chainage", 6).alias("med_chainage"),
        F.round("std", 6).alias("std"),
        F.round("max_chainage", 6).alias("max_chainage"),
        F.round("min_chainage", 6).alias("min_chainage"),
        "n",
    )


def q_despike_tide(spark: SparkSession, sf_dir: str) -> DataFrame:
    # W3 iterative despike + tide correction, DuckDB-value-checked: the
    # sequential pop-and-restart fixpoint (SDS_transects.py:484-594) is
    # mirrored as a recursive CTE (timeseries.despike_sql, one recursion
    # level per pop, early-exit quirk included), so the input must be
    # bit-identical in both engines — a deterministic integer-arithmetic
    # spiky series derived from `documents` (margins >> 1 ulp, so keep
    # decisions can never diverge). The real operators run on the Spark
    # side: despike via groupBy(transect).applyInPandas over the numpy
    # kernel, then the forward as-of tide join + horizontal correction
    # (example.py:324-330). The flagship-chained variant of this pair
    # stays exercised in tests/test_timeseries.py.
    from coastsat_spark.datagen import TS_SPAN_S, TS_START_S
    from coastsat_spark.operators.timeseries import despike_timeseries
    from coastsat_spark.plans import pipeline

    d = spark.read.parquet(_t(sf_dir, "documents"))
    # step scales with the table so the longest per-transect series stays
    # INSIDE the 4-year tide span (beyond it the forward as-of join finds
    # no tide row and yields NULL, which the oracle's closed-form tide
    # cannot mirror — observed at sf0.1 before this guard), and stays a
    # multiple of the 900 s tide grid so the as-of match is exact. The
    # row count comes from parquet FOOTER metadata (no Spark action in
    # the query body); the oracle derives the identical value from
    # count(documents), which DuckDB also answers from metadata.
    n_docs = _parquet_rows(_t(sf_dir, "documents"))
    rows_per = -(-n_docs // 40)
    if rows_per + 1 > TS_SPAN_S // 900:
        # beyond ~5.6M docs the 900 s step floor would wrap the series
        # past the tide span and the as-of join yields NULL tide, which
        # the oracle's closed-form tide cannot mirror — fail loudly on
        # BOTH sides (the oracle raises via error()) instead of as a
        # confusing hash mismatch
        raise ValueError(
            f"despike_tide: {n_docs} documents -> {rows_per + 1} rows per "
            f"transect exceeds the {TS_SPAN_S} s tide span at the 900 s "
            "step floor; the synthetic-series envelope tops out at "
            f"{(TS_SPAN_S // 900 - 1) * 40} documents"
        )
    step_s = max(((TS_SPAN_S // (rows_per + 1)) // 900) * 900, 900)
    w = W.partitionBy(F.col("doc_id") % 40).orderBy("doc_id")
    ts = d.select(
        F.concat(F.lit("T"), (F.col("doc_id") % 40).cast("string")).alias("transect"),
        F.timestamp_seconds(
            F.lit(TS_START_S)
            + (F.row_number().over(w) - 1).cast("long") * F.lit(step_s)
        ).alias("scene_month"),
        (
            ((F.col("doc_id") * 37) % 13).cast("double") / F.lit(10.0)
            + F.when((F.col("doc_id") * 7) % 23 == 0, F.lit(15.0)).otherwise(F.lit(0.0))
        ).alias("chainage"),
    )
    despiked = despike_timeseries(ts, max_cross_change=5.0)
    corrected = pipeline.tidally_corrected(spark, despiked)
    return corrected.select(
        "transect",
        "scene_month",
        F.round("chainage", 4).alias("chainage"),
        F.round("tide", 4).alias("tide"),
        F.round("chainage_corrected", 4).alias("chainage_corrected"),
    )


def q_text_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S4 byte-identity invariant surface, DuckDB-value-hash-checked: html
    # is synthesized deterministically from the documents table in BOTH
    # engines (same trick as text_metrics' pii suffix), Spark runs the
    # real Arrow-batched byte-regex extractor over the binary column, and
    # the oracle replays the extraction with regexp_extract(..., 's');
    # md5 over the UTF-8 bytes makes any single-byte divergence a hash
    # mismatch, and `roundtrip` pins extracted == original text per row.
    from coastsat_spark.functions.text import extract_text

    d = spark.read.parquet(_t(sf_dir, "documents"))
    html = F.concat(
        F.lit('<html><head><meta name="lang" content="'), F.col("lang"),
        F.lit('"></head><body><nav>menu '), F.col("doc_id").cast("string"),
        F.lit("</nav><article>"), F.col("text"),
        F.lit("</article><footer>f</footer></body></html>"),
    )
    ext = extract_text(html.cast("binary"))
    return d.select(
        "doc_id",
        F.md5(ext.cast("binary")).alias("text_md5"),
        (ext == F.col("text")).cast("int").alias("roundtrip"),
    )


def q_text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    # language-ID + composite quality score + PII redaction as pure JVM
    # expressions over the documents table, DuckDB-checked against the
    # identical SQL forms (no per-row Python — this IS the 100 TB path).
    # The documents corpus carries no PII, so a deterministic pii-bearing
    # suffix (email + IPv4 + E.164 phone derived from doc_id) is
    # synthesized identically in both engines; the oracle then verifies
    # the full detect+redact regex pipeline on every row.
    from coastsat_spark.functions.text import (
        langid_col,
        pii_count_col,
        quality_score_col,
        redact_pii_col,
    )

    d = spark.read.parquet(_t(sf_dir, "documents"))
    pii_src = F.concat(
        F.col("text"),
        F.lit(" contact"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com +15551234"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit(" from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7"),
    )
    return d.select(
        "doc_id",
        langid_col("text").alias("pred_lang"),
        quality_score_col("text").alias("quality"),
        pii_count_col(pii_src).alias("n_pii"),
        F.length(redact_pii_col(pii_src)).cast("bigint").alias("redacted_len"),
    )


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rolling document fingerprint: JVM tokenize+xxhash64, vectorized
    # numpy Horner fold (no per-byte/per-token Python); DuckDB-oracled
    # via the SQL XXH64 mirror (functions.text.fingerprint_oracle_sql)
    from coastsat_spark.functions.text import fingerprint_col

    d = spark.read.parquet(_t(sf_dir, "documents"))
    return d.select("doc_id", fingerprint_col("text").alias("fp"))


def q_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH and SimHash near-dup pair enumeration, one result with
    a `method` discriminator (merged so both operators keep a driver row
    within the 50-query record cap; score = est_jaccard for minhash,
    hamming distance for simhash)."""
    from coastsat_spark.operators.dedup import minhash_dedup_pairs, simhash_dup_pairs

    d = spark.read.parquet(_t(sf_dir, "documents"))
    mh = minhash_dedup_pairs(d, threshold=0.7).select(
        F.lit("minhash").alias("method"),
        "id_a",
        "id_b",
        F.round("est_jaccard", 6).alias("score"),
    )
    sh = simhash_dup_pairs(d, max_hamming=3).select(
        F.lit("simhash").alias("method"),
        "id_a",
        "id_b",
        F.col("hamming").cast("double").alias("score"),
    )
    return mh.unionByName(sh)


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-family intra-document repetition metrics (mode-word
    fraction, distinct-word fraction, duplicate word-bigram fraction,
    word entropy) — DuckDB-oracled; one (doc, word) exchange with
    map-side combine, bigram stats as per-row JVM array expressions."""
    from coastsat_spark.functions.text import repetition_stats

    d = spark.read.parquet(_t(sf_dir, "documents"))
    return repetition_stats(d)


def q_minhash_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from coastsat_spark.operators.dedup import minhash_dedup_assign

    d = spark.read.parquet(_t(sf_dir, "documents"))
    return minhash_dedup_assign(d, k=128, bands=32)


def q_shoreline_crossings(spark: SparkSession, sf_dir: str) -> DataFrame:
    # R10/R12 + J7 + the global-Otsu path, DuckDB-value-hash-checked: the
    # DISTINCT sub-pixel crossing-point set of the full extraction
    # (halo on, min_contour_len_px=0 so the polyline-structure-only parts
    # of the kernel drop out) equals the SQL-computable set of
    # sign-change grid-edge interpolations under the same per-scene
    # 256-bin NumPy-faithful Otsu threshold, NaN-cell suppression,
    # cloud-proximity anti-join and ownership rule.
    from coastsat_spark.operators import raster

    # persist: extract_shorelines' halo ghost branch scans the pixel
    # aggregate a second time (see its docstring) — same pattern as
    # q_shoreline_refined and bench.py
    px = _doc_pixels(spark, sf_dir).persist()
    s = raster.ShorelineSettings(grid_log2=_OR_GRID_LOG2, min_contour_len_px=0.0)
    pts = raster.extract_shorelines(px, s)
    return pts.select(
        "tile", "scene_month",
        F.round("px_x", 6).alias("px_x"),
        F.round("px_y", 6).alias("px_y"),
        F.round("t_mndwi", 6).alias("t_mndwi"),
    ).distinct()


def q_classify_scenes(spark: SparkSession, sf_dir: str) -> DataFrame:
    # R6/J8 over the relational pixel mirror so DuckDB can replay the
    # whole chain — 20-feature cube, literal-weight linear inference,
    # argmax, min-area cleanup — as SQL (the model weights are inlined as
    # constants in the oracle, exactly like the sensor model).
    from coastsat_spark.operators import classify, raster

    px = _doc_pixels(spark, sf_dir)
    return classify.classify_scenes(
        px, raster.ShorelineSettings(grid_log2=_OR_GRID_LOG2)
    )


def q_slope_estimation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # deterministic synthetic 8-day series per transect (the flagship's
    # quarterly cadence cannot resolve tidal frequencies; the reference
    # subsamples to n_days for the same reason, SDS_slope.py:453-464)
    import math

    from coastsat_spark.operators.slope import SlopeSettings, estimate_slopes

    n = 150
    rows = spark.range(n * 2)
    tr = F.when(F.col("id") < n, F.lit("T_A")).otherwise(F.lit("T_B"))
    slope_true = F.when(F.col("id") < n, F.lit(0.08)).otherwise(F.lit(0.15))
    i = F.col("id") % n
    t = i * F.lit(8.0 * 86400.0)
    tide = F.lit(0.5) * F.sin(t * F.lit(2 * math.pi / (12.4206 * 3600))) + F.lit(0.2) * F.sin(
        t * F.lit(2 * math.pi / (14.77 * 86400))
    )
    seasonal = F.lit(5.0) * F.sin(t * F.lit(2 * math.pi / (365.25 * 86400)))
    chain = F.lit(50.0) + seasonal - tide / slope_true
    df = rows.select(
        tr.alias("transect"),
        F.timestamp_seconds(F.lit(1577836800) + t.cast("long")).alias("scene_month"),
        chain.alias("chainage"),
        tide.alias("tide"),
    )
    out = estimate_slopes(df, SlopeSettings())
    return out.select(
        "transect", F.round("slope", 4).alias("slope"),
        F.round("ci_low", 4).alias("ci_low"), F.round("ci_high", 4).alias("ci_high"), "n",
    )


def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from coastsat_spark.operators.similarity import cosine_topk_bruteforce

    emb = spark.read.parquet(_t(sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < 20)
    out = cosine_topk_bruteforce(q, emb, k=5)
    return out.select("q_id", "rank", "c_id", F.round("cosine", 4).alias("cosine"))


def q_ann_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three approximate-ANN scale paths in one driver row (method
    column): sign-LSH multi-table bucketing, IVF centroid-probe, and
    PQ/ADC with exact candidate rerank — each returns per-query top-5
    with an exact cosine on the surviving candidates, so rows are
    deterministic and comparable across methods."""
    from coastsat_spark.operators.similarity import (
        cosine_topk_lsh,
        ivf_topk,
        pq_codebooks,
        pq_encode,
        pq_topk,
    )

    emb = spark.read.parquet(_t(sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < 20)
    lsh = cosine_topk_lsh(q, emb, k=5, n_bits=6, n_tables=12)
    ivf = ivf_topk(q, emb, k=5)
    books = pq_codebooks(emb, m=8, n_codes=64)
    pq = pq_topk(q, pq_encode(emb, books), books, k=5, rerank=emb)
    sel = lambda df, name: df.select(  # noqa: E731
        F.lit(name).alias("method"),
        "q_id",
        "rank",
        "c_id",
        F.round("cosine", 4).alias("cosine"),
    )
    return sel(lsh, "lsh").unionByName(sel(ivf, "ivf")).unionByName(sel(pq, "pq"))


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # image decode/feature-extract + audio frame-sampling over binary
    # media columns, unioned into one driver row; payloads are REAL file
    # formats (24-bit BMP; WAV cycling PCM / G.711 mu-law / A-law /
    # IMA ADPCM by media_id%8) decoded by the engine's own pure-NumPy
    # codecs — the oracle replays every decoded stream exactly
    # (G.711 integer segment algebra, ADPCM recursive-CTE state walk)
    from coastsat_spark.operators.multimodal import (
        GEOTIFF_BANDS,
        audio_frame_samples,
        geotiff_pixels,
        geotiff_scene_table,
        image_features,
        media_table,
        video_frame_features,
        video_table,
    )

    media = media_table(spark, 500)
    img = image_features(media).select(
        "media_id",
        F.lit("image").alias("kind"),
        F.lit(0).alias("idx"),
        F.round("brightness", 4).alias("v1"),
        F.round("mean_r", 4).alias("v2"),
    )
    aud = audio_frame_samples(media).select(
        "media_id",
        F.lit("audio").alias("kind"),
        F.col("frame_idx").alias("idx"),
        F.round("rms", 4).alias("v1"),
        F.lit(None).cast("double").alias("v2"),
    )
    # geotiff leg: REAL GeoTIFF band stacks (strips/tiles, all four
    # compressions, predictor, UTM transform) through the pure-NumPy
    # TIFF codec and the band-stack ingest (preprocess_single analog);
    # band rows carry a position-weighted value fingerprint, the idx=99
    # row pins the affine corners + EPSG
    px = geotiff_pixels(geotiff_scene_table(spark, 64))
    stack_expr = "stack(%d, %s) as (idx, val)" % (
        len(GEOTIFF_BANDS),
        ", ".join(f"{i}, {b}" for i, b in enumerate(GEOTIFF_BANDS)),
    )
    # one aggregate pass over the decoded pixels carries BOTH the band
    # fingerprints and the coord/epsg extrema; the idx=99 coord row then
    # derives from the tiny (scenes x bands)-row aggregate, persisted so
    # the two union legs decode the 64 scenes ONCE (exchange reuse does
    # not fire across mapInPandas branches — PythonUDF subtrees don't
    # canonicalize equal, verified on the executed AQE plan)
    gt_base = (
        px.select(
            F.col("scene_id").alias("media_id"), "px_row", "px_col", "x", "y", "epsg",
            F.expr(stack_expr),
        )
        .groupBy("media_id", "idx")
        .agg(
            F.sum("val").cast("double").alias("v1"),
            F.sum(F.col("val") * (F.col("px_row") * 16 + F.col("px_col") + 1))
            .cast("double")
            .alias("v2"),
            F.min("x").alias("mnx"),
            F.max("y").alias("mxy"),
            F.max("epsg").alias("ep"),
        )
        .persist()
    )
    gt_bands = gt_base.select("media_id", F.lit("geotiff").alias("kind"), "idx", "v1", "v2")
    gt_coords = (
        gt_base.groupBy("media_id")
        .agg(
            (F.min("mnx") + F.max("mxy")).alias("v1"),
            F.max("ep").cast("double").alias("v2"),
        )
        .select("media_id", F.lit("geotiff").alias("kind"), F.lit(99).alias("idx"), "v1", "v2")
    )
    # video leg: REAL uncompressed-DIB RIFF AVI payloads, frame-sampled
    # (every 2nd frame) to per-frame channel means — the video analog of
    # the audio frame rows, decoded by the engine's own container parser
    vid = video_frame_features(video_table(spark, 48), every=2).select(
        "media_id",
        F.lit("video").alias("kind"),
        F.col("frame_idx").alias("idx"),
        F.round("brightness", 4).alias("v1"),
        F.round("mean_r", 4).alias("v2"),
    )
    return (
        img.unionByName(aud)
        .unionByName(gt_bands)
        .unionByName(gt_coords)
        .unionByName(vid)
    )


# ------------------------------------------------------------ registries

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # relational / SQL-checked
        "pricing_summary": q_pricing_summary,
        "catalog_counts": q_catalog_counts,
        "filter_gates": q_filter_gates,
        "union_filter": q_union_filter,
        "equi_join_agg": q_equi_join_agg,
        "anti_join": q_anti_join,
        "semi_join": q_semi_join,
        "topk_per_group": q_topk_per_group,
        "argmax_mode": q_argmax_mode,
        "dedup_sessions": q_dedup_sessions,
        "sessionize": q_sessionize,
        "timestep_hist": q_timestep_hist,
        "seasonal_avg": q_seasonal_avg,
        "trend": q_trend,
        "error_stats": q_error_stats,
        "asof_join": q_asof_join,
        "validation_join": q_validation_join,
        "cell_assign": q_cell_assign,
        "pip_join": q_pip_join,
        "containment_dedup": q_containment_dedup,
        "knn_join": q_knn_join,
        "token_stats": q_token_stats,
        "exact_dedup": q_exact_dedup,
        "jaccard_pairs": q_jaccard_pairs,
        "grouping_sets": q_grouping_sets,
        "union_merge": q_union_merge,
        "pixel_aggregate": q_pixel_aggregate,
        "scene_quality": q_scene_quality,
        "transect_intersections": q_transect_intersections,
        "same_day_dedup": q_same_day_dedup,
        "rescale_stretch": q_rescale_stretch,
        "class_histogram": q_class_histogram,
        "json_extract": q_json_extract,
        "embedding_dedup": q_embedding_dedup,
        "text_metrics": q_text_metrics,
        "repetition_stats": q_repetition_stats,
        "ann_bruteforce": q_ann_bruteforce,
        # kernel / rows-only — the six queries the r2 driver run dropped
        # (registry was 56 > the ~50-row record cap) run FIRST here; the
        # registry is consolidated back to exactly 50 entries
        "slope_estimation": q_slope_estimation,
        "ann_approx": q_ann_approx,
        "multimodal_features": q_multimodal_features,
        "fingerprints": q_fingerprints,
        "minhash_assign": q_minhash_assign,
        "neardup_pairs": q_neardup_pairs,
        "classify_scenes": q_classify_scenes,
        "shoreline_crossings": q_shoreline_crossings,
        "shoreline_refined": q_shoreline_refined,
        "pansharpen_scenes": q_pansharpen,
        "qc_timeseries": q_qc_timeseries,
        "despike_tide": q_despike_tide,
        "text_extraction": q_text_extraction,
    }


def oracle_sql() -> dict[str, str]:
    from coastsat_spark.functions.cells import encode_cell_sql
    from coastsat_spark.functions.text import (
        langid_score_sql,
        pii_count_sql,
        quality_score_sql,
        redact_pii_sql,
    )
    from coastsat_spark.functions.text import repetition_stats_sql as _repetition_stats_sql
    import math as _math

    from coastsat_spark.datagen import TS_SPAN_S as _TS_SPAN_S
    from coastsat_spark.datagen import tide_value_sql as _tide_value_sql
    from coastsat_spark.operators.slope import (
        slope_oracle_tail_sql as _slope_oracle_tail_sql,
    )
    from coastsat_spark.operators.timeseries import despike_sql as _despike_sql
    from coastsat_spark.operators.timeseries import sessionize_sql as _sessionize_sql
    from coastsat_spark.operators.tiling import (
        adaptive_tile_counts_sql as _adaptive_tile_counts_sql,
    )
    from coastsat_spark.operators.raster import ShorelineSettings
    from coastsat_spark.operators.similarity import (
        ann_approx_oracle_sql as _ann_approx_oracle_sql,
    )
    from coastsat_spark.operators.tiling import BANDS, bands_sql, tiles_sql
    from coastsat_spark.operators.transects import make_transects_pdf

    pip_sql = _pip_inside_sql(_LAT_SQL, _LON_SQL)
    knn_values = ", ".join(f"({q}, {la}, {lo})" for q, la, lo in _KNN_QUERIES)

    # sensor-model + tiling mirror (same doubles, same operation order)
    b_sql = bands_sql()
    t_sql = tiles_sql(_OR_TILE_RES, _OR_GRID_LOG2)
    obs_ctes = f"""
      geo AS (
        SELECT doc_id, {_CLAT_SQL} AS lat, {_CLON_SQL} AS lon,
               doc_id % 4 AS scene_month
        FROM documents
      ), obs AS (
        SELECT {t_sql["tile"]} AS tile, scene_month,
               {t_sql["px_row"]} AS px_row, {t_sql["px_col"]} AS px_col,
               {", ".join(f'{b_sql[b]} AS {b}' for b in BANDS)},
               CASE WHEN {b_sql["cloud"]} THEN 1.0 ELSE 0.0 END AS cloud
        FROM geo
      ), px AS (
        SELECT tile, scene_month, px_row, px_col,
               {", ".join(f'avg({b}) AS {b}' for b in BANDS)},
               count(*) AS n_docs, avg(cloud) AS cloud_frac
        FROM obs GROUP BY 1, 2, 3, 4
      )"""
    pixel_aggregate_sql = f"""
        WITH {obs_ctes}
        SELECT tile, scene_month, px_row, px_col,
               {", ".join(f'round({b}, 4) AS {b}' for b in BANDS)},
               n_docs, round(cloud_frac, 4) AS cloud_frac
        FROM px
    """
    s = ShorelineSettings(grid_log2=_OR_GRID_LOG2)
    total_px = (1 << s.grid_log2) ** 2
    mndwi = "((swir - green) / (swir + green))"
    clear = f"(cloud_frac <= {s.cloud_mask_frac!r})"
    scene_quality_sql = f"""
        WITH {obs_ctes}, st AS (
          SELECT tile, scene_month,
                 count(*) AS filled_px,
                 CAST(sum(CASE WHEN cloud_frac > {s.cloud_mask_frac!r} THEN 1 ELSE 0 END) AS BIGINT) AS cloud_px,
                 CAST(sum(n_docs) AS BIGINT) AS n_docs,
                 CAST(sum(CASE WHEN {clear} AND {mndwi} < {s.water_cut!r} THEN 1 ELSE 0 END) AS BIGINT) AS water_px,
                 CAST(sum(CASE WHEN {clear} AND {mndwi} > {s.land_cut!r} THEN 1 ELSE 0 END) AS BIGINT) AS land_px
          FROM px GROUP BY 1, 2
        )
        SELECT tile, scene_month, filled_px, cloud_px, n_docs, water_px, land_px,
               round(filled_px / {float(total_px)!r}, 6) AS filled_frac,
               round(cloud_px / filled_px, 6) AS cloud_frac,
               round((cloud_px + {total_px} - filled_px) / {float(total_px)!r}, 6) AS combined_bad_frac,
               CAST(filled_px / {float(total_px)!r} >= {s.min_filled_frac!r}
                    AND cloud_px / filled_px <= {s.max_cloud_frac!r}
                    AND (cloud_px + {total_px} - filled_px) / {float(total_px)!r} <= {s.max_cloud_frac_combined!r}
                    AND water_px >= {s.min_water_px}
                    AND land_px >= {s.min_land_px} AS INT) AS keep
        FROM st
    """
    tpdf = make_transects_pdf(41)
    tvals = ", ".join(
        f"('{r.transect}', {r.x0!r}, {r.y0!r}, {r.x1!r}, {r.y1!r})"
        for r in tpdf.itertuples()
    )
    transect_intersections_sql = f"""
        WITH tr(transect, x0, y0, x1, y1) AS (VALUES {tvals}),
        pts AS (
          SELECT doc_id, {_CLAT_SQL} AS lat, {_CLON_SQL} AS lon,
                 doc_id % 2 AS scene
          FROM documents
        ), g AS (
          SELECT tr.transect, pts.scene,
                 abs((x1 - x0) * (lat - y0) - (y1 - y0) * (lon - x0))
                   / sqrt((x1 - x0) * (x1 - x0) + (y1 - y0) * (y1 - y0)) AS d_line,
                 sqrt((lon - x0) * (lon - x0) + (lat - y0) * (lat - y0)) AS d_origin,
                 ((lon - x0) * (x1 - x0) + (lat - y0) * (y1 - y0))
                   / sqrt((x1 - x0) * (x1 - x0) + (y1 - y0) * (y1 - y0)) AS chainage,
                 atan2(y1 - y0, x1 - x0) AS phi,
                 atan2(lat - y0, lon - x0) AS phi_sl
          FROM pts CROSS JOIN tr
        )
        SELECT transect, scene,
               round(quantile_cont(chainage, 0.5), 6) AS med_chainage,
               count(*) AS n_points
        FROM g
        WHERE d_line <= {_TI_ALONG!r} AND d_origin <= {_TI_MAXD!r}
          AND abs(phi - phi_sl) < pi() / 2
        GROUP BY transect, scene
    """
    # J2/A2 mirror: QC-variant predicates (no bearing), min-chainage
    # nulling, per-group dispersion stats, and the 'auto' policy's
    # per-transect prc_over window (SDS_transects.py:318-381)
    qc_timeseries_sql = f"""
        WITH tr(transect, x0, y0, x1, y1) AS (VALUES {tvals}),
        pts AS (
          SELECT doc_id, {_CLAT_SQL} AS lat, {_CLON_SQL} AS lon,
                 doc_id % 2 AS scene
          FROM documents
        ), g AS (
          SELECT tr.transect, pts.scene,
                 abs((x1 - x0) * (lat - y0) - (y1 - y0) * (lon - x0))
                   / sqrt((x1 - x0) * (x1 - x0) + (y1 - y0) * (y1 - y0)) AS d_line,
                 sqrt((lon - x0) * (lon - x0) + (lat - y0) * (lat - y0)) AS d_origin,
                 ((lon - x0) * (x1 - x0) + (lat - y0) * (y1 - y0))
                   / sqrt((x1 - x0) * (x1 - x0) + (y1 - y0) * (y1 - y0)) AS chainage
          FROM pts CROSS JOIN tr
        ), ch AS (
          SELECT transect, scene,
                 CASE WHEN chainage < -100.0 THEN NULL ELSE chainage END AS chain
          FROM g WHERE d_line <= {_TI_ALONG!r} AND d_origin <= {_TI_MAXD!r}
        ), st AS (
          SELECT transect, scene,
                 quantile_cont(chain, 0.5) AS med,
                 stddev_pop(chain) AS std,
                 max(chain) AS mx, min(chain) AS mn,
                 count(chain) AS n
          FROM ch GROUP BY 1, 2
        ), w AS (
          SELECT *,
                 sum(CASE WHEN std > 0.25 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY transect) / 2.0 AS prc_over
          FROM st
        )
        SELECT transect, scene,
               round(CASE WHEN std <= 0.25 AND (mx - mn) <= 0.6 AND n >= 3 THEN med
                          WHEN prc_over > 0.1 AND n >= 3 THEN mx
                          ELSE NULL END, 6) AS chainage,
               round(med, 6) AS med_chainage,
               round(std, 6) AS std,
               round(mx, 6) AS max_chainage,
               round(mn, 6) AS min_chainage,
               n
        FROM w
    """
    same_day_dedup_sql = """
        WITH sc AS (
          SELECT event_type, event_id, ts, user_id % 5 AS zone FROM events
        ), zc AS (
          SELECT event_type, zone, count(*) AS n FROM sc GROUP BY 1, 2
        ), md AS (
          SELECT event_type, zone AS mode_zone, n_z FROM (
            SELECT event_type, zone,
                   row_number() OVER (PARTITION BY event_type ORDER BY n DESC, zone) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n_z
            FROM zc) WHERE rn = 1
        ), k AS (
          SELECT sc.*, n_z FROM sc JOIN md USING (event_type)
          WHERE n_z = 1 OR zone = mode_zone
        ), r AS (
          SELECT *, row_number() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                       ORDER BY ts, event_id) AS rn
          FROM k
        )
        SELECT event_type, event_id, zone FROM r WHERE n_z = 1 OR rn <= 2
    """
    rescale_stretch_sql = f"""
        WITH {obs_ctes}, h AS (
          SELECT tile, scene_month, px_row, px_col, green, swir,
                 quantile_cont(green, 0.99) OVER (PARTITION BY tile, scene_month) AS hg,
                 quantile_cont(swir, 0.99) OVER (PARTITION BY tile, scene_month) AS hs
          FROM px
        )
        SELECT tile, scene_month, px_row, px_col,
               round(CASE WHEN hg <= 0.0 THEN 0.0
                          ELSE least(greatest(green, 0.0), hg) / hg END, 6) AS green_adj,
               round(CASE WHEN hs <= 0.0 THEN 0.0
                          ELSE least(greatest(swir, 0.0), hs) / hs END, 6) AS swir_adj
        FROM h
    """
    from coastsat_spark.operators.classify import classify_oracle_sql
    from coastsat_spark.operators.raster import (
        crossings_oracle_sql,
        refined_crossings_oracle_sql,
    )

    shoreline_crossings_sql = f"""
        WITH {obs_ctes},
        {crossings_oracle_sql(_OR_GRID_LOG2, tile_res=_OR_TILE_RES)}
    """
    shoreline_refined_sql = f"""
        WITH {obs_ctes},
        {refined_crossings_oracle_sql(_OR_GRID_LOG2, tile_res=_OR_TILE_RES)}
    """
    classify_scenes_sql = f"""
        WITH {obs_ctes},
        {classify_oracle_sql("px", _OR_GRID_LOG2)}
    """
    class_histogram_sql = f"""
        WITH {obs_ctes}
        SELECT CASE WHEN cloud_frac > 0.5 THEN 'cloud'
                    WHEN (swir - green) / (swir + green) < -0.2 THEN 'water'
                    WHEN (swir - green) / (swir + green) > 0.1 THEN 'land'
                    ELSE 'mixed' END AS label,
               CAST(floor((swir - green) / (swir + green) * 10) AS BIGINT) AS bin,
               count(*) AS n
        FROM px GROUP BY 1, 2
    """
    from coastsat_spark.operators.multimodal import (
        geotiff_oracle_sql,
        multimodal_oracle_sql,
        video_oracle_sql,
    )
    from coastsat_spark.functions.text import fingerprint_oracle_sql
    from coastsat_spark.operators.dedup import (
        minhash_assign_oracle_sql,
        neardup_oracle_sql,
    )

    from coastsat_spark.operators.raster import pansharpen_oracle_tail_sql

    pansharpen_sql = f"""
        WITH RECURSIVE {obs_ctes}, {pansharpen_oracle_tail_sql(ShorelineSettings())}
        SELECT tile, scene_month, px_row, px_col,
               {", ".join(f'round({b}, 4) AS {b}' for b in BANDS)}
        FROM pansharp_out
    """

    return {
        "pixel_aggregate": pixel_aggregate_sql,
        # R4 PCA pansharpen, mirrored end to end: the identity
        # Xs = X + (histmatch(pan, pc1) - pc1) * v1 (orthonormal Vt, only
        # PC1 replaced) means only the top covariance eigenvector is
        # needed — a converged power-iteration recursive CTE computes it,
        # hist_match collapses to an exact rank swap (see
        # raster.pansharpen_oracle_tail_sql).
        "pansharpen_scenes": pansharpen_sql,
        # the xxhash64-dependent trio, oracle-able after all: the SQL
        # replays Spark's XXH64 bit-for-bit (hashing.xxh64_string_steps,
        # HUGEINT split arithmetic) and the numpy shingle/slot/band/CC
        # algebra on top — see the *_oracle_sql docstrings for the
        # exactness arguments (dyadic est_jaccard, pigeonhole simhash,
        # recursive-CTE components)
        "fingerprints": fingerprint_oracle_sql(),
        "neardup_pairs": neardup_oracle_sql(),
        "minhash_assign": minhash_assign_oracle_sql(),
        "scene_quality": scene_quality_sql,
        # bmp/wav legs + the geotiff band-stack ingest leg + the AVI
        # frame-sampling leg, composed as WITH-subqueries (the
        # generators share no CTE names)
        "multimodal_features": (
            f"SELECT * FROM ({multimodal_oracle_sql(500)})\n"
            f"UNION ALL SELECT * FROM ({geotiff_oracle_sql(64)})\n"
            f"UNION ALL SELECT * FROM ({video_oracle_sql(48)})"
        ),
        "transect_intersections": transect_intersections_sql,
        "same_day_dedup": same_day_dedup_sql,
        "rescale_stretch": rescale_stretch_sql,
        "class_histogram": class_histogram_sql,
        "classify_scenes": classify_scenes_sql,
        "shoreline_crossings": shoreline_crossings_sql,
        "shoreline_refined": shoreline_refined_sql,
        "qc_timeseries": qc_timeseries_sql,
        "text_extraction": """
            WITH h AS (
              SELECT doc_id, text,
                     '<html><head><meta name="lang" content="' || lang ||
                     '"></head><body><nav>menu ' || CAST(doc_id AS VARCHAR) ||
                     '</nav><article>' || text ||
                     '</article><footer>f</footer></body></html>' AS html
              FROM documents
            ), e AS (
              SELECT doc_id, text,
                     regexp_extract(html, '<article>(.*?)</article>', 1, 's') AS ext
              FROM h
            )
            SELECT doc_id, md5(ext) AS text_md5,
                   CAST(ext = text AS INT) AS roundtrip
            FROM e
        """,
        "embedding_dedup": """
            WITH n AS (
              SELECT vec_id, embedding,
                     sqrt((SELECT sum(e * e)
                           FROM (SELECT unnest(embedding) AS e) z)) AS nrm
              FROM embeddings
            ), p AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     (SELECT sum(ea * eb)
                      FROM (SELECT unnest(a.embedding) AS ea,
                                   unnest(b.embedding) AS eb) z)
                       / (a.nrm * b.nrm) AS cosine
              FROM n a JOIN n b ON a.vec_id < b.vec_id
            )
            SELECT id_a, id_b, round(cosine, 5) AS cosine
            FROM p WHERE cosine >= 0.3
        """,
        "json_extract": """
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(length(text)) AS BIGINT) AS total_chars
            FROM documents GROUP BY lang
        """,
        "text_metrics": f"""
            WITH p AS (
              SELECT doc_id, text,
                     text || ' contact' || CAST(doc_id AS VARCHAR)
                          || '@example.com +15551234'
                          || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                          || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                          || '.7' AS pii_src
              FROM documents
            )
            SELECT doc_id,
                   {langid_score_sql("text")} AS pred_lang,
                   {quality_score_sql("text")} AS quality,
                   CAST({pii_count_sql("pii_src")} AS BIGINT) AS n_pii,
                   CAST(length({redact_pii_sql("pii_src")}) AS BIGINT)
                     AS redacted_len
            FROM p
        """,
        "repetition_stats": _repetition_stats_sql("documents"),
        "ann_approx": _ann_approx_oracle_sql(),
        "ann_bruteforce": """
            WITH n AS (
              SELECT vec_id, embedding,
                     sqrt((SELECT sum(e * e)
                           FROM (SELECT unnest(embedding) AS e) z)) AS nrm
              FROM embeddings
            ), p AS (
              SELECT q.vec_id AS q_id, c.vec_id AS c_id,
                     (SELECT sum(eq * ec)
                      FROM (SELECT unnest(q.embedding) AS eq,
                                   unnest(c.embedding) AS ec) z)
                       / (q.nrm * c.nrm) AS cosine
              FROM n q JOIN n c ON c.vec_id <> q.vec_id
              WHERE q.vec_id < 20
            ), r AS (
              SELECT q_id, c_id, cosine,
                     row_number() OVER (PARTITION BY q_id
                                        ORDER BY cosine DESC, c_id) AS rank
              FROM p
            )
            SELECT q_id, rank, c_id, round(cosine, 4) AS cosine
            FROM r WHERE rank <= 5
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1995-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "catalog_counts": """
            SELECT o_orderstatus, count(*) AS n,
                   min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
            FROM orders GROUP BY o_orderstatus
        """,
        "filter_gates": """
            SELECT l_returnflag, count(*) AS n,
                   round(sum(l_extendedprice * l_discount), 2) AS revenue
            FROM lineitem
            WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
              AND NOT (l_returnflag = 'R' AND year(l_shipdate) >= 1995)
            GROUP BY l_returnflag
        """,
        "union_filter": """
            SELECT o_orderpriority, count(*) AS n, round(sum(o_totalprice), 2) AS total
            FROM orders
            WHERE CASE WHEN o_orderstatus <> 'O' THEN o_orderstatus = 'F'
                       ELSE o_totalprice <= 150000.0 END
            GROUP BY o_orderpriority
        """,
        "equi_join_agg": """
            SELECT c_nationkey, count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS total_price
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_nationkey
        """,
        "anti_join": """
            SELECT c_nationkey, count(*) AS n_without_orders
            FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders
                              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
            GROUP BY c_nationkey
        """,
        "semi_join": """
            SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS qty
            FROM lineitem
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_orderkey = l_orderkey AND o_totalprice > 200000)
            GROUP BY l_returnflag
        """,
        "topk_per_group": """
            SELECT l_returnflag, rank, l_orderkey, l_linenumber, price FROM (
                SELECT l_returnflag, l_orderkey, l_linenumber,
                       round(l_extendedprice, 2) AS price,
                       row_number() OVER (PARTITION BY l_returnflag
                                          ORDER BY l_extendedprice DESC,
                                                   l_orderkey, l_linenumber) AS rank
                FROM lineitem) WHERE rank <= 3
        """,
        "argmax_mode": """
            SELECT o_orderstatus, o_orderpriority AS top_priority, n FROM (
                SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                       row_number() OVER (PARTITION BY o_orderstatus
                                          ORDER BY count(*) DESC, o_orderpriority) AS rn
                FROM orders GROUP BY o_orderstatus, o_orderpriority) WHERE rn = 1
        """,
        "sessionize": f"""
            -- both engines break only on gap STRICTLY > g:
            -- session_window merges adjacent windows (pinned by the
            -- planted exact-boundary test in tests/test_streaming.py)
            WITH b AS ({_sessionize_sql("events", gap_seconds=1800.0)}),
            sw AS ({_sessionize_sql("events", gap_seconds=1800.0, boundary=">")})
            SELECT 'batch' AS engine, user_id, start_ts AS session_start,
                   n_events, total_value
            FROM b
            UNION ALL
            SELECT 'session_window' AS engine, user_id, start_ts AS session_start,
                   n_events, total_value
            FROM sw
        """,
        "dedup_sessions": """
            WITH d AS (
              SELECT user_id, event_id, ts, value,
                     CASE WHEN lag(ts) OVER w IS NULL
                               OR epoch(ts) - epoch(lag(ts) OVER w) > 3600
                          THEN 1 ELSE 0 END AS new_s
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
              SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS sess
              FROM d
            )
            SELECT user_id, event_id FROM (
              SELECT user_id, event_id,
                     row_number() OVER (PARTITION BY user_id, sess
                                        ORDER BY value DESC, event_id) AS rn
              FROM s) WHERE rn = 1
        """,
        "timestep_hist": """
            SELECT cast(floor(gap_s / 600) AS bigint) AS gap_bucket, count(*) AS n FROM (
              SELECT epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id
                                                     ORDER BY ts, event_id)) AS gap_s
              FROM events) WHERE gap_s IS NOT NULL
            GROUP BY 1
        """,
        "seasonal_avg": """
            SELECT 'season' AS period_kind, event_type,
                   make_date(CAST(year(ts) + CASE WHEN month(ts) = 12 THEN 1 ELSE 0 END AS INT),
                             CASE WHEN month(ts) IN (12, 1, 2) THEN 1
                                  WHEN month(ts) IN (3, 4, 5) THEN 4
                                  WHEN month(ts) IN (6, 7, 8) THEN 7
                                  ELSE 10 END, 1) AS period,
                   round(avg(value), 4) AS mean_value, count(*) AS n
            FROM events GROUP BY event_type, period
            UNION ALL
            SELECT 'month', event_type, period, mean_value, n FROM (
              WITH labeled AS (
                SELECT event_type, value,
                       make_date(CAST(year(ts) AS INT), CAST(month(ts) AS INT), 15) AS period
                FROM events
              ), cutoff AS (SELECT max(ts::DATE) - INTERVAL 5 DAY AS c FROM events)
              SELECT event_type, period,
                     round(avg(value), 4) AS mean_value, count(*) AS n
              FROM labeled, cutoff WHERE period <= c
              GROUP BY event_type, period
            )
        """,
        "trend": """
            WITH d AS (
              SELECT event_type, value,
                     (epoch(ts) - min(epoch(ts)) OVER (PARTITION BY event_type))
                       / (365.25 * 86400.0) AS x_years
              FROM events)
            SELECT event_type,
                   round(regr_slope(value, x_years), 4) AS trend,
                   round(regr_intercept(value, x_years), 4) AS intercept,
                   round(corr(value, x_years), 4) AS rvalue,
                   count(*) AS n
            FROM d GROUP BY event_type
        """,
        "error_stats": """
            SELECT event_type,
                   round(sqrt(avg(err * err)), 4) AS rmse,
                   round(avg(err), 4) AS mean_err,
                   round(stddev_pop(err), 4) AS std_err,
                   round(quantile_cont(abs(err), 0.9), 4) AS q90,
                   count(*) AS n
            FROM (SELECT event_type, value - 50.0 AS err FROM events)
            GROUP BY event_type
        """,
        "asof_join": """
            WITH l AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
            r AS (SELECT user_id, ts, min(value) AS view_value FROM events
                  WHERE event_type = 'view' GROUP BY user_id, ts)
            SELECT l.user_id, l.event_id, round(m.view_value, 4) AS view_value
            FROM l LEFT JOIN LATERAL (
              SELECT view_value FROM r
              WHERE r.user_id = l.user_id AND r.ts >= l.ts
              ORDER BY r.ts LIMIT 1) m ON true
        """,
        # R16 Lomb-Scargle beach-slope estimation, fully relational: the
        # GLS periodogram is per-(transect, freq) trig-moment aggregates,
        # peak picking / slope-energy argmin / interpolated CI mirror the
        # numpy kernels (operators/slope.py slope_oracle_tail_sql). The
        # series mirrors q_slope_estimation exactly — note the kernel's
        # time axis is the EPOCH timestamp while tide/chainage are built
        # from the unshifted i*8d grid, replicated faithfully here.
        "slope_estimation": f"""
            WITH src AS (
              SELECT transect,
                     '{1577836800.0!r}'::DOUBLE + tr AS t,
                     tide,
                     {50.0!r} + {5.0!r} * sin(tr * {2 * _math.pi / (365.25 * 86400)!r})
                       - tide / sl_true AS chainage
              FROM (
                SELECT CASE WHEN id < 150 THEN 'T_A' ELSE 'T_B' END AS transect,
                       CASE WHEN id < 150 THEN {0.08!r} ELSE {0.15!r} END AS sl_true,
                       CAST(id % 150 AS DOUBLE) * {8.0 * 86400.0!r} AS tr,
                       {0.5!r} * sin(CAST(id % 150 AS DOUBLE) * {8.0 * 86400.0!r}
                                     * {2 * _math.pi / (12.4206 * 3600)!r})
                         + {0.2!r} * sin(CAST(id % 150 AS DOUBLE) * {8.0 * 86400.0!r}
                                         * {2 * _math.pi / (14.77 * 86400)!r}) AS tide
                FROM generate_series(0, 299) g(id)
              )
            ),
            {_slope_oracle_tail_sql()},
            cnt AS (
              SELECT transect, CAST(count(*) AS INTEGER) AS n FROM src GROUP BY 1
            )
            SELECT s.transect, round(s.slope, 4) AS slope,
                   round(s.ci_low, 4) AS ci_low, round(s.ci_high, 4) AS ci_high,
                   c.n
            FROM slope_out s JOIN cnt c USING (transect)
        """,
        # W3 sequential despike fixpoint as a recursive CTE (one level per
        # pop, early-exit quirk replicated; see timeseries.despike_sql) +
        # forward as-of tide join + horizontal correction. The step is
        # derived from count(documents) exactly like the Spark side, so
        # series timestamps land on the 900 s tide grid and inside its
        # 4-year span at EVERY sf — the forward match is then the scene
        # timestamp itself and the joined tide is tide_value_sql(t).
        "despike_tide": f"""
            WITH RECURSIVE stp AS (
              -- envelope guard mirrors the Spark side's ValueError: above
              -- ~5.6M docs the 900 s step floor wraps past the tide span
              SELECT CASE
                WHEN CAST(ceil(count(*) / 40.0) AS BIGINT) + 1 > {_TS_SPAN_S} // 900
                THEN CAST(error('despike_tide: document count exceeds the '
                                'synthetic-series tide-span envelope') AS BIGINT)
                ELSE greatest((({_TS_SPAN_S} // (CAST(ceil(count(*) / 40.0) AS BIGINT) + 1))
                              // 900) * 900, 900)
              END AS s
              FROM documents
            ),
            src AS (
              SELECT 'T' || CAST(doc_id % 40 AS VARCHAR) AS transect,
                     TIMESTAMP '2020-01-01 00:00:00'
                       + (CAST(row_number() OVER (PARTITION BY doc_id % 40
                                                  ORDER BY doc_id) AS BIGINT) - 1)
                         * stp.s * INTERVAL 1 SECOND AS t,
                     (CAST((doc_id * 37) % 13 AS DOUBLE) / 10.0
                      + CASE WHEN (doc_id * 7) % 23 = 0
                             THEN 15.0 ELSE 0.0 END) AS chainage
              FROM documents, stp
            ),
            {_despike_sql('src', 5.0)}
            SELECT transect, t AS scene_month,
                   round(chainage, 4) AS chainage,
                   round({_tide_value_sql('t')}, 4) AS tide,
                   round(chainage + (({_tide_value_sql('t')}) - 0.0) / 0.1, 4)
                     AS chainage_corrected
            FROM dsp_final
        """,
        "validation_join": """
            WITH sat AS (
              SELECT CAST(user_id AS VARCHAR) AS transect, ts AS scene_month,
                     value AS chainage
              FROM events WHERE event_type = 'click'
            ), survey AS (
              SELECT CAST(user_id AS VARCHAR) AS transect, ts, min(value) AS chainage
              FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
            ), j AS (
              SELECT s.transect, s.scene_month, s.chainage,
                     b.ts AS b_ts, b.chainage AS b_val,
                     a.ts AS a_ts, a.chainage AS a_val
              FROM sat s
              LEFT JOIN LATERAL (SELECT ts, chainage FROM survey
                                 WHERE transect = s.transect AND ts <= s.scene_month
                                 ORDER BY ts DESC LIMIT 1) b ON true
              LEFT JOIN LATERAL (SELECT ts, chainage FROM survey
                                 WHERE transect = s.transect AND ts >= s.scene_month
                                 ORDER BY ts LIMIT 1) a ON true
            )
            -- floor(x*1e4 + 0.5)/1e4 mirrors the Spark side's tie-stable
            -- rounding (see q_validation_join: round() tie-breaking
            -- diverges between engines on exact .xxxx5 interpolants)
            SELECT transect, scene_month,
                   floor(chainage * 10000 + 0.5) / 10000 AS sat_value,
                   floor((CASE
                     WHEN least(coalesce(date_diff('day', b_ts::DATE, scene_month::DATE), 1000000000),
                                coalesce(date_diff('day', scene_month::DATE, a_ts::DATE), 1000000000)) > 10
                       THEN NULL
                     WHEN least(coalesce(date_diff('day', b_ts::DATE, scene_month::DATE), 1000000000),
                                coalesce(date_diff('day', scene_month::DATE, a_ts::DATE), 1000000000)) < 3
                       THEN CASE WHEN date_diff('day', b_ts::DATE, scene_month::DATE)
                                      <= coalesce(date_diff('day', scene_month::DATE, a_ts::DATE), 1000000000)
                                 THEN b_val ELSE a_val END
                     WHEN b_ts IS NOT NULL AND a_ts IS NOT NULL
                       THEN b_val + (a_val - b_val)
                            * (epoch(scene_month::DATE::TIMESTAMP) - epoch(b_ts::DATE::TIMESTAMP))
                            / (epoch(a_ts::DATE::TIMESTAMP) - epoch(b_ts::DATE::TIMESTAMP))
                     ELSE NULL END) * 10000 + 0.5) / 10000 AS survey_value
            FROM j
        """,
        "containment_dedup": f"""
            WITH boxes AS (
              SELECT doc_id AS id, doc_id % 20 AS bkt,
                     {_BBOX_SQL["x0"]} AS x0, {_BBOX_SQL["y0"]} AS y0,
                     {_BBOX_SQL["x0"]} + {_BBOX_SQL["w"]} AS x1,
                     {_BBOX_SQL["y0"]} + {_BBOX_SQL["h"]} AS y1
              FROM documents
            ), contained AS (
              SELECT DISTINCT a.id FROM boxes a JOIN boxes b
                ON a.bkt = b.bkt AND a.id <> b.id
              WHERE b.x0 <= a.x0 AND b.y0 <= a.y0 AND b.x1 >= a.x1 AND b.y1 >= a.y1
                AND (b.x0 < a.x0 OR b.y0 < a.y0 OR b.x1 > a.x1 OR b.y1 > a.y1
                     OR (b.x0 = a.x0 AND b.y0 = a.y0 AND b.x1 = a.x1 AND b.y1 = a.y1
                         AND b.id < a.id))
            )
            SELECT id, bkt, x0, y0, x1, y1 FROM boxes
            WHERE id NOT IN (SELECT id FROM contained)
        """,
        "cell_assign": _adaptive_tile_counts_sql(
            _LAT_SQL, _LON_SQL, "documents", base_res=2, cap=20, max_levels=2
        ),
        "pip_join": f"""
            SELECT lang,
                   CAST(sum(CASE WHEN {pip_sql} THEN 1 ELSE 0 END) AS BIGINT) AS n_inside,
                   count(*) AS n_total
            FROM documents GROUP BY lang
        """,
        "knn_join": f"""
            WITH q(q_id, q_lat, q_lon) AS (VALUES {knn_values}),
            pts AS (SELECT doc_id, {_LAT_SQL} AS lat, {_LON_SQL} AS lon FROM documents),
            d AS (
              SELECT q.q_id, pts.doc_id,
                     sqrt((lat - q_lat) * (lat - q_lat) + (lon - q_lon) * (lon - q_lon)) AS dist
              FROM pts CROSS JOIN q)
            SELECT q_id, rank, doc_id, round(dist, 6) AS dist FROM (
              SELECT q_id, doc_id, dist,
                     row_number() OVER (PARTITION BY q_id ORDER BY dist, doc_id) AS rank
              FROM d) WHERE rank <= 5
        """,
        "token_stats": f"""
            SELECT doc_id, length(text) AS n_chars_measured,
                   length(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS n_tokens
            FROM documents
        """,
        "exact_dedup": """
            WITH g AS (SELECT text, min(doc_id) AS canonical_id, count(*) AS group_size
                       FROM documents GROUP BY text)
            SELECT d.doc_id, g.canonical_id, g.group_size
            FROM documents d JOIN g ON d.text = g.text
        """,
        "jaccard_pairs": """
            WITH sh AS (
              SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 5) AS shingle
              FROM (SELECT doc_id, text,
                           unnest(range(1, greatest(length(text) - 4, 1) + 1)) AS i
                    FROM documents)
              WHERE length(substr(text, CAST(i AS INT), 5)) = 5
            ), sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
            common AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT id_a, id_b, n_common, sa.n_sh AS n_a, sb.n_sh AS n_b,
                   round(CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
            FROM common
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.7
        """,
        "grouping_sets": """
            SELECT l_returnflag, l_linestatus, count(*) AS n,
                   round(sum(l_quantity), 2) AS qty
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "union_merge": """
            SELECT src, date_trunc('month', ts) AS month, count(*) AS n,
                   round(sum(value), 4) AS total
            FROM (
              SELECT 'a' AS src, ts, value FROM events WHERE event_type = 'click'
              UNION ALL
              SELECT 'b' AS src, ts, value FROM events WHERE event_type = 'purchase')
            GROUP BY src, month
        """,
    }
