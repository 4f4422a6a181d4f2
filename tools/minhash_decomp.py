"""Stage-level decomposition of minhash_dedup_assign: WHERE the wall time
goes and WHAT each stage is bound by — so "shuffle-bandwidth-pinned" is
demonstrated from driver-recorded stage metrics, not asserted.

For each completed Spark stage the REST API exposes shuffle write/read
bytes, input bytes, executorRunTime and executorCpuTime. The
decomposition groups stages into:
  - map/UDF stages (no shuffle read; tokenize+minhash+bandkeys): expected
    CPU-bound -> cpu/run ratio near 1, scales like the CPU ceiling;
  - exchange stages (shuffle read > 0; the groupBy(bkey) aggregate +
    edge distinct): expected bandwidth-bound -> low cpu/run ratio,
    throughput (shuffled bytes / stage wall) saturating at the measured
    multi-process DRAM ceiling share.

Ambient DRAM bandwidth (single-thread triad) is sampled in a background
thread THROUGHOUT the measured run, so the artifact records whether the
co-tenant was bursting.

Usage: python tools/minhash_decomp.py [sf] [cpus] [out_json]
Writes one JSON blob (also printed) with per-stage rows + totals.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from coastsat_spark.datagen import ensure_webpages
from coastsat_spark.operators import dedup
from coastsat_spark.session import get_spark


from tools.noise_probe import triad_gbps


class AmbientSampler(threading.Thread):
    def __init__(self, interval: float = 3.0):
        super().__init__(daemon=True)
        self.samples: list[float] = []
        self.interval = interval
        self._stop = threading.Event()

    def run(self):
        while True:
            # 8M doubles (64 MB/array — DRAM-resident like the canonical
            # 20M probe, same GB/s scale) keep the sampler duty cycle low
            self.samples.append(round(triad_gbps(8_000_000), 3))
            if self._stop.wait(self.interval):
                return

    def stop(self):
        self._stop.set()


def rest_stages(spark) -> list[dict]:
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def stage_rows(spark, before_ids) -> list[dict]:
    """Per-stage metric rows for stages completed after `before_ids`
    (shared by minhash_decomp and job_decomp — one copy of the REST
    parsing so the artifacts stay methodologically identical)."""
    rows = []
    for s in rest_stages(spark):
        if s["stageId"] in before_ids:
            continue
        st_wall = None
        if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
            from datetime import datetime

            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            t_a = datetime.strptime(s["firstTaskLaunchedTime"], fmt)
            t_b = datetime.strptime(s["completionTime"], fmt)
            st_wall = (t_b - t_a).total_seconds()
        rows.append(
            {
                "stage": s["stageId"],
                "name": s.get("name", "")[:60],
                "tasks": s.get("numCompleteTasks"),
                "wall_s": round(st_wall, 3) if st_wall is not None else None,
                "run_s": round(s.get("executorRunTime", 0) / 1e3, 3),
                "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 3),
                "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                "shuffle_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                "shuffle_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
            }
        )
    rows.sort(key=lambda r: r["stage"])
    for r in rows:
        r["cpu_over_run"] = round(r["cpu_s"] / r["run_s"], 3) if r["run_s"] else None
        sh = r["shuffle_write_mb"] + r["shuffle_read_mb"]
        r["shuffle_mb_per_s"] = round(sh / r["wall_s"], 1) if r["wall_s"] and sh else None
    return rows


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    k, bands = 64, 8  # the scaling-study config

    conf = {
        "spark.ui.showConsoleProgress": "false",
        # the session default disables the UI; the REST stage metrics
        # need it (measurement-only sessions, no overhead concern)
        "spark.ui.enabled": "true",
    }
    codec = os.environ.get("SPARK_GRAFT_SHUFFLE_CODEC")
    if codec:  # A/B the shuffle codec (lz4 default vs zstd etc.)
        conf["spark.io.compression.codec"] = codec
    spark = get_spark(
        app_name="minhash_decomp", cpus=cpus, shuffle_partitions=cpus,
        extra_conf=conf, tmpfs_local_dir=True,
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(ensure_webpages(spark, sf))
    n_docs = docs.count()
    sub = docs.select(F.xxhash64("url").alias("doc_id"), F.col("text"))

    # warm-up (JIT, python workers, page cache)
    dedup.minhash_dedup_assign(sub, k=k, bands=bands, max_iters=3).filter(
        F.col("canonical_id") != F.col("doc_id")
    ).count()
    before_ids = {s["stageId"] for s in rest_stages(spark)}

    amb = AmbientSampler()
    amb.start()
    t0 = time.perf_counter()
    n_dup = (
        dedup.minhash_dedup_assign(sub, k=k, bands=bands, max_iters=3)
        .filter(F.col("canonical_id") != F.col("doc_id"))
        .count()
    )
    wall = time.perf_counter() - t0
    amb.stop()

    rows = stage_rows(spark, before_ids)
    map_stages = [r for r in rows if r["shuffle_read_mb"] == 0.0]
    exch_stages = [r for r in rows if r["shuffle_read_mb"] > 0.0]
    out = {
        "sf": sf, "cpus": cpus, "n_docs": n_docs, "n_dup": n_dup,
        "k": k, "bands": bands,
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
            "shuffle_write_mb": round(sum(r["shuffle_write_mb"] for r in rows), 1),
            "shuffle_read_mb": round(sum(r["shuffle_read_mb"] for r in rows), 1),
            "map_cpu_over_run": round(
                sum(r["cpu_s"] for r in map_stages) / max(sum(r["run_s"] for r in map_stages), 1e-9), 3
            ),
            "exchange_cpu_over_run": round(
                sum(r["cpu_s"] for r in exch_stages) / max(sum(r["run_s"] for r in exch_stages), 1e-9), 3
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
