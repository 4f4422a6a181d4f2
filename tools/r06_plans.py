"""Dump .explain('formatted') for the bench queries to plans/r06/.

Usage: python tools/r06_plans.py <suffix> [query ...]
Writes plans/r06/<query>_<suffix>.txt for each named query (default all).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from coastsat_spark.datagen import ensure_webpages
from coastsat_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="r06_plans", cpus=cpus, shuffle_partitions=cpus,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(ensure_webpages(spark, 0.1))

    from coastsat_spark.functions.text import extract_text
    from coastsat_spark.operators import dedup, raster, similarity, tiling
    from coastsat_spark.plans import pipeline

    def flagship():
        return pipeline.run_flagship(spark, docs).timeseries

    def pixel_aggregate():
        return raster.aggregate_pixels(tiling.prepare_documents(docs))

    def shoreline_extract():
        px = raster.aggregate_pixels(tiling.prepare_documents(docs))
        q = raster.scene_quality(px, raster.ShorelineSettings())
        return raster.extract_shorelines(px, quality=q)

    def text_extract():
        return docs.select(F.length(extract_text(F.col("html"))).alias("n")).agg(F.sum("n"))

    def pricing_summary():
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        return (
            li.filter(F.col("l_shipdate") <= "1995-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity"), F.avg("l_extendedprice"), F.count(F.lit(1)))
        )

    def minhash_dedup_assign():
        sub = docs.select(F.xxhash64("url").alias("doc_id"), F.col("text"))
        return dedup.minhash_dedup_assign(sub, k=64, bands=16)

    def ann_bruteforce():
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        return similarity.cosine_topk_bruteforce(emb.limit(50), emb, k=10)

    queries = {
        "flagship_shoreline_ts": flagship,
        "pixel_aggregate": pixel_aggregate,
        "shoreline_extract": shoreline_extract,
        "text_extract": text_extract,
        "pricing_summary": pricing_summary,
        "minhash_dedup_assign": minhash_dedup_assign,
        "ann_bruteforce": ann_bruteforce,
    }
    for name, fn in queries.items():
        if only and name not in only:
            continue
        df = fn()
        blob = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = f"plans/r06/{name}_{suffix}.txt"
        with open(path, "w") as f:
            f.write(blob)
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
