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

from pyspark.sql import DataFrame, SparkSession
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
