"""Structured Streaming surface (optional scope — SURVEY.md §2.10).

The reference is pure batch; the engine offers the streaming analogs for
continuous ingestion of the webpages table:

- `stream_webpages(...)`: file-source stream of the webpages parquet
  with the same map-side transforms as the batch path (geotag parse,
  bands, tiles) — the batch/streaming plans share one transform fn;
- `streaming_pixel_counts(...)`: watermarked tumbling-window aggregate
  per (tile, window) — the streaming analog of A7 monthly buckets;
- `streaming_dedup(...)`: dropDuplicatesWithinWatermark on url — the
  streaming analog of W1's close-timestamp dedup.

Tests drive these with the memory sink + processAllAvailable().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..datagen import WEBPAGES_SCHEMA
from ..operators import tiling


def stream_webpages(spark: SparkSession, path: str) -> DataFrame:
    """readStream over the webpages parquet directory (file source)."""
    return (
        spark.readStream.schema(WEBPAGES_SCHEMA + ", warc_month string")
        .option("maxFilesPerTrigger", 512)
        .parquet(path)
    )


def streaming_pixel_counts(
    stream: DataFrame, window: str = "30 days", watermark: str = "45 days"
) -> DataFrame:
    """Watermarked windowed doc counts per tile (append-mode safe)."""
    prepared = tiling.with_tiles(tiling.with_bands(tiling.with_geo(stream)))
    return (
        prepared.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "tile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("cloud").cast("int")).alias("n_cloudy"),
        )
        .select(F.col("w.start").alias("window_start"), "tile", "n_docs", "n_cloudy")
    )


def streaming_dedup(stream: DataFrame, watermark: str = "45 days") -> DataFrame:
    """Streaming exact dedup on url within the watermark horizon."""
    return stream.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(["url"])


def streaming_tile_stats(stream: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState, §2.10): running
    per-tile observation count + cloud fraction, emitted every trigger in
    update mode. State = (n, cloud_sum); the final emission per tile must
    equal the batch groupBy aggregate — the test's exactness invariant.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    prepared = tiling.with_tiles(tiling.with_bands(tiling.with_geo(stream)))
    src = prepared.select("tile", F.col("cloud").cast("double").alias("cloud"))

    def fn(key, pdfs, state: GroupState):
        n, csum = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            csum += float(pdf["cloud"].sum())
        state.update((n, csum))
        yield pd.DataFrame(
            {"tile": [key[0]], "n_docs": [n], "cloud_frac": [csum / max(n, 1)]}
        )

    return src.groupBy("tile").applyInPandasWithState(
        fn,
        outputStructType="tile long, n_docs long, cloud_frac double",
        stateStructType="n long, csum double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def read_bloom_bitmap(
    spark: SparkSession, bloom_dir: str, exclude_epoch: int | None = None
) -> DataFrame:
    """The accumulated Bloom bitmap: OR of every epoch partition under
    `bloom_dir` (one per processed micro-batch), optionally excluding one
    epoch — the retry guard: a re-run batch must not see the bits its
    failed attempt already wrote, or every row of the retry would read
    as seen. Missing/empty dir -> empty bitmap (nothing seen yet)."""
    from pyspark.errors import AnalysisException

    try:
        epochs = spark.read.option("basePath", bloom_dir).parquet(bloom_dir)
    except AnalysisException:  # no epoch written yet (PATH_NOT_FOUND)
        return spark.createDataFrame([], "word long, bits long")
    if exclude_epoch is not None:
        epochs = epochs.filter(F.col("epoch") != int(exclude_epoch))
    return epochs.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_gate_batch(
    batch: DataFrame,
    batch_id: int,
    bloom_dir: str,
    out_dir: str,
    m_bits: int = 1 << 23,
    k_hashes: int = 5,
    key_col: str = "key",
    id_col: str = "doc_id",
) -> int:
    """One micro-batch of the Bloom-gated incremental-crawl ingest:
    probe the batch against the accumulated bitmap, keep the first row
    per unseen key (within-batch dedup by smallest id; NULL-keyed rows
    always pass — there is no key to deduplicate on), append the
    accepted rows to `out_dir/epoch=<batch_id>` and the accepted keys'
    bits to `bloom_dir/epoch=<batch_id>`. Returns the accepted count.

    Exactly-once without read-modify-write: each batch OVERWRITES only
    its own epoch partition (a deterministic function of its input), and
    the probe excludes that epoch, so a retried batch reproduces its
    output byte-identically whether or not the failed attempt got as far
    as writing bits. Seen keys never re-enter (no false negatives);
    a false positive drops a genuinely-new key at the standard
    (1 - e^{-kn/m})^k rate — size m_bits for the crawl horizon.
    """
    from ..operators.bloom import bloom_build, bloom_probe

    spark = batch.sparkSession
    bitmap = read_bloom_bitmap(spark, bloom_dir, exclude_epoch=batch_id)
    probed = bloom_probe(
        batch, bitmap, m_bits=m_bits, k_hashes=k_hashes,
        key_col=key_col, id_col=id_col,
    )
    rn = F.row_number().over(Window.partitionBy(key_col).orderBy(id_col))
    accepted_ids = (
        probed.filter(~F.col("maybe_seen"))
        .withColumn("_rn", rn)
        .filter(F.col(key_col).isNull() | (F.col("_rn") == 1))
        .select(id_col)
    )
    accepted = batch.join(accepted_ids, id_col, "left_semi")
    accepted.write.mode("overwrite").parquet(f"{out_dir}/epoch={int(batch_id)}")
    out = spark.read.parquet(f"{out_dir}/epoch={int(batch_id)}")
    bloom_build(
        out.select(F.col(key_col).cast("long").alias("key")),
        m_bits=m_bits, k_hashes=k_hashes,
    ).write.mode("overwrite").parquet(f"{bloom_dir}/epoch={int(batch_id)}")
    return out.count()


def bloom_gate_stream(
    stream: DataFrame,
    bloom_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    m_bits: int = 1 << 23,
    k_hashes: int = 5,
    key_col: str = "key",
    id_col: str = "doc_id",
    query_name: str = "bloom_gate",
):
    """Continuous incremental-crawl dedup: every micro-batch of `stream`
    is gated through `bloom_gate_batch` (probe accumulated bitmap ->
    accept unseen keys -> extend bitmap). The streaming composition of
    `operators/bloom.py`; state lives in the epoch-partitioned bitmap
    table, not the state store, so it survives query restarts, is
    readable by any batch job mid-stream, and is bounded by m/64 rows
    per epoch however many documents flow through."""

    def fn(batch: DataFrame, batch_id: int) -> None:
        bloom_gate_batch(
            batch, batch_id, bloom_dir, out_dir,
            m_bits=m_bits, k_hashes=k_hashes, key_col=key_col, id_col=id_col,
        )

    return (
        stream.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .start()
    )


def streaming_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Watermarked session-window aggregate — the streaming analog of
    `timeseries.sessionize` using Spark's native `session_window`
    (dynamic-gap merge inside the state store; append-mode safe: a
    session finalizes once the watermark passes its close).

    Works on a batch DataFrame too (session_window is a grouping
    expression), which is how the parity test pins it to the batch
    operator's output.

    Boundary semantics vs batch `timeseries.sessionize`: session_window
    MERGES adjacent windows (a next event at exactly prev_ts + gap keeps
    the session open), so it agrees bit-for-bit with the batch default
    `boundary='>'` even on inputs with exact-boundary gaps — pinned by
    the planted-boundary parity test in tests/test_streaming.py.
    (`sessionize(boundary=">=")` is the genuinely different half-open
    semantics, for callers that want a gap of exactly `gap` to break.)
    """
    # parquet timestamps read as TIMESTAMP_NTZ; event-time watermarks
    # need TimestampType — the UTC session TZ makes the cast offset-free
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    sw = F.session_window(F.col(ts_col), gap)
    agg = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        agg.groupBy(sw.alias("w"), user_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("total_value"),
        )
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
