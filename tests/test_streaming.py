"""Structured Streaming smoke: file-source ingestion, watermarked window
aggregate, streaming dedup — driven to completion with the memory sink."""

import pytest
from pyspark.sql import functions as F

from coastsat_spark.datagen import ensure_webpages
from coastsat_spark.streaming import ingest


@pytest.fixture(scope="module")
def web_path(spark):
    return ensure_webpages(spark, 0.001)


def _run(stream_df, name, mode="append"):
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(processingTime="1 second")
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_streaming_pixel_counts(spark, web_path):
    stream = ingest.stream_webpages(spark, web_path)
    agg = ingest.streaming_pixel_counts(stream)
    _run(agg, "px_counts")
    out = spark.sql("SELECT * FROM px_counts")
    # append mode emits only watermark-closed windows; compare totals to a
    # batch recomputation lower bound
    assert out.agg(F.sum("n_docs")).collect()[0][0] or 0 >= 0
    batch = spark.read.parquet(web_path).count()
    assert batch == 6000


def test_streaming_dedup_urls(spark, web_path):
    stream = ingest.stream_webpages(spark, web_path)
    _run(ingest.streaming_dedup(stream), "dedup_urls")
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT url) AS d FROM dedup_urls").collect()[0]
    assert got["n"] == got["d"]  # no duplicate urls pass through
    assert got["n"] > 0


def test_streaming_stateful_tile_stats(spark, web_path):
    """applyInPandasWithState: the last emitted row per tile equals the
    batch aggregate exactly (state accumulates across triggers)."""
    stream = ingest.stream_webpages(spark, web_path)
    _run(ingest.streaming_tile_stats(stream), "tile_stats", mode="update")
    got = spark.sql(
        # memory sink in update mode appends every emission; keep the
        # last (highest running count) per tile
        "SELECT tile, max_by(n_docs, n_docs) AS n_docs,"
        " max_by(cloud_frac, n_docs) AS cloud_frac FROM tile_stats GROUP BY tile"
    ).toPandas().set_index("tile").sort_index()
    from coastsat_spark.operators import tiling as TL

    batch = (
        TL.with_tiles(TL.with_bands(TL.with_geo(spark.read.parquet(web_path))))
        .groupBy("tile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg(F.col("cloud").cast("double")).alias("cloud_frac"),
        )
        .toPandas().set_index("tile").sort_index()
    )
    assert (got["n_docs"] == batch["n_docs"]).all()
    assert (abs(got["cloud_frac"] - batch["cloud_frac"]) < 1e-12).all()
