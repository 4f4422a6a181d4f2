"""Phase-level profile of minhash_dedup_assign at the bench config.

Usage: python tools/profile_minhash.py [sf] [cpus]
Prints per-phase wall times so regressions can be attributed (UDF+hash,
bucket exchange, star edges, CC, final join) rather than guessed.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from coastsat_spark.datagen import ensure_webpages
from coastsat_spark.operators import dedup
from coastsat_spark.session import get_spark


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    k, bands = 64, 16
    spark = get_spark(
        app_name="minhash_profile", cpus=cpus, shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"}, tmpfs_local_dir=True,
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(ensure_webpages(spark, sf))
    n = docs.count()
    sub = docs.select(F.xxhash64("url").alias("doc_id"), F.col("text"))

    t0 = time.perf_counter()

    # phase 1: tokenize+hash+minhash UDF + band keys, forced without explode
    bkeys = dedup.minhash_band_keys(sub, k, bands)
    bkeys.agg(F.avg(F.element_at("bkeys", 1))).collect()
    t1 = time.perf_counter()
    print(f"phase1 udf+bandkeys      : {t1 - t0:7.2f}s  (n_docs={n})", flush=True)

    # phase 2: full pipeline as bench runs it
    t2 = time.perf_counter()
    out = dedup.minhash_dedup_assign(sub, k=k, bands=bands)
    n_dup = out.filter(F.col("canonical_id") != F.col("doc_id")).count()
    t3 = time.perf_counter()
    print(f"phase2 full assign       : {t3 - t2:7.2f}s  (n_dup={n_dup})", flush=True)

    spark.catalog.clearCache()
    # phase 3: repeat full pipeline (warm JVM) for variance
    t4 = time.perf_counter()
    out = dedup.minhash_dedup_assign(sub, k=k, bands=bands)
    out.filter(F.col("canonical_id") != F.col("doc_id")).count()
    t5 = time.perf_counter()
    print(f"phase3 full assign (warm): {t5 - t4:7.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
