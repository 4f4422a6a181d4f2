"""Stage-level decomposition of any scaling-study job (flagship /
text_extract / minhash) — the per-stage evidence for WHY a job's N->4N
efficiency lands where it does.

Reuses minhash_decomp's REST scaffolding: per-stage shuffle bytes,
input bytes, executorRunTime/CpuTime, stage wall, with ambient
DRAM-triad samples taken throughout. Shuffle/input BYTE counts are
deterministic (noise-immune); wall times carry the embedded ambient
context.

Usage: python tools/job_decomp.py <job> [sf] [cpus] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from coastsat_spark.datagen import ensure_webpages
from coastsat_spark.session import get_spark
from tools.minhash_decomp import AmbientSampler, rest_stages, stage_rows


def main() -> None:
    job = sys.argv[1]
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    out_path = sys.argv[4] if len(sys.argv) > 4 else None

    spark = get_spark(
        app_name=f"{job}_decomp", cpus=cpus, shuffle_partitions=cpus,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "true",  # REST stage metrics need the UI
        },
        tmpfs_local_dir=True,
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(ensure_webpages(spark, sf))
    n_docs = docs.count()

    if job == "flagship":
        from coastsat_spark.plans import pipeline

        def run():
            res = pipeline.run_flagship(spark, docs)
            try:
                return res.timeseries.count()
            finally:
                # run_flagship persists the pixel aggregate; without this
                # the warm-up's cached copy would stay resident through
                # the measured run
                res.pixels.unpersist()

    elif job == "text_extract":
        from coastsat_spark.functions.text import extract_text

        def run():
            return (
                docs.select(F.length(extract_text(F.col("html"))).alias("n"))
                .agg(F.sum("n"))
                .collect()[0][0]
            )

    elif job == "minhash":
        from coastsat_spark.operators import dedup

        sub = docs.select(F.xxhash64("url").alias("doc_id"), F.col("text"))

        def run():
            return (
                dedup.minhash_dedup_assign(sub, k=64, bands=8, max_iters=3)
                .filter(F.col("canonical_id") != F.col("doc_id"))
                .count()
            )

    else:
        raise SystemExit(f"unknown job {job!r}")

    run()  # warm-up: JIT, python workers, page cache
    before_ids = {s["stageId"] for s in rest_stages(spark)}

    amb = AmbientSampler()
    amb.start()
    t0 = time.perf_counter()
    result = run()
    wall = time.perf_counter() - t0
    amb.stop()

    rows = stage_rows(spark, before_ids)
    map_stages = [r for r in rows if r["shuffle_read_mb"] == 0.0]
    exch_stages = [r for r in rows if r["shuffle_read_mb"] > 0.0]
    out = {
        "job": job, "sf": sf, "cpus": cpus, "n_docs": n_docs, "result": result,
        "wall_s": round(wall, 3),
        "ambient_triad_gbps": {
            "min": min(amb.samples) if amb.samples else None,
            "median": round(float(np.median(amb.samples)), 3) if amb.samples else None,
            "max": max(amb.samples) if amb.samples else None,
            "n": len(amb.samples),
        },
        "totals": {
            "map_wall_s": round(sum(r["wall_s"] or 0 for r in map_stages), 3),
            "exchange_wall_s": round(sum(r["wall_s"] or 0 for r in exch_stages), 3),
            "input_mb": round(sum(r["input_mb"] for r in rows), 1),
            "shuffle_write_mb": round(sum(r["shuffle_write_mb"] for r in rows), 1),
            "shuffle_read_mb": round(sum(r["shuffle_read_mb"] for r in rows), 1),
            "map_cpu_over_run": round(
                sum(r["cpu_s"] for r in map_stages)
                / max(sum(r["run_s"] for r in map_stages), 1e-9), 3
            ),
            "exchange_cpu_over_run": round(
                sum(r["cpu_s"] for r in exch_stages)
                / max(sum(r["run_s"] for r in exch_stages), 1e-9), 3
            ),
        },
        "stages": rows,
    }
    blob = json.dumps(out, indent=1)
    print(blob)
    if out_path:
        with open(out_path, "w") as f:
            f.write(blob + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
