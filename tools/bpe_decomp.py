"""Stage-level decomposition of the two bpe_encode strategies: show from
driver-recorded REST stage metrics — not assertion — that the default
`via='map'` path is ONE shuffle-free CPU-dense stage while `via='join'`
pays corpus exchanges, which is why map scales N->4N and join measured
0.43 (BENCH/pipeline_ops_scaling.json).

Shuffle bytes and stage counts are independent of co-tenant memory-bus
bursts, so this artifact stays valid in windows where wall-clock
scaling runs are contaminated.

Usage: python tools/bpe_decomp.py [sf] [cpus] [out_json]
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
from coastsat_spark.operators import bpe
from coastsat_spark.session import get_spark
from tools.minhash_decomp import AmbientSampler, rest_stages, stage_rows


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    out_path = sys.argv[3] if len(sys.argv) > 3 else None

    spark = get_spark(
        app_name="bpe_decomp", cpus=cpus, shuffle_partitions=cpus,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "true",  # REST metrics need it
        },
        tmpfs_local_dir=True,
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(ensure_webpages(spark, sf))
    n_docs = docs.count()
    d = docs.select(F.xxhash64("url").alias("doc_id"), "text")

    # fitted model: reuse the bench cache when present (training is
    # deterministic and outside everything measured here)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    model_path = os.path.join(repo, "BENCH", f".bpe_model_sf{sf}.json")
    if os.path.exists(model_path):
        with open(model_path) as fh:
            m = json.load(fh)
        merges = [tuple(p) for p in m["merges"]]
        vocab = spark.createDataFrame(
            [(t, i) for t, i in m["vocab"]], "token string, token_id long"
        )
    else:
        merges, vocab = bpe.bpe_train(
            d.where(F.pmod(F.xxhash64("doc_id"), F.lit(50)) == 0),
            n_merges=300, max_words=200_000,
        )
    vocab = vocab.cache(); vocab.count()

    out = {"sf": sf, "cpus": cpus, "n_docs": n_docs, "strategies": {}}
    for via in ("map", "join"):
        # warm-up (JIT, python workers, page cache)
        bpe.bpe_encode(d, merges, vocab, via=via).agg(F.sum("n_tokens")).collect()
        before = {s["stageId"] for s in rest_stages(spark)}
        amb = AmbientSampler()
        amb.start()
        t0 = time.perf_counter()
        tot = bpe.bpe_encode(d, merges, vocab, via=via).agg(
            F.sum("n_tokens")
        ).collect()[0][0]
        wall = time.perf_counter() - t0
        amb.stop()
        rows = stage_rows(spark, before)
        out["strategies"][via] = {
            "wall_s": round(wall, 3),
            "total_tokens": int(tot),
            "n_stages": len(rows),
            "shuffle_write_mb": round(sum(r["shuffle_write_mb"] for r in rows), 1),
            "shuffle_read_mb": round(sum(r["shuffle_read_mb"] for r in rows), 1),
            "cpu_over_run": round(
                sum(r["cpu_s"] for r in rows)
                / max(sum(r["run_s"] for r in rows), 1e-9),
                3,
            ),
            "ambient_triad_gbps": {
                "min": min(amb.samples) if amb.samples else None,
                "median": round(float(np.median(amb.samples)), 3)
                if amb.samples else None,
                "max": max(amb.samples) if amb.samples else None,
            },
            "stages": rows,
        }
    # the headline invariants the docstring claims
    m_, j_ = out["strategies"]["map"], out["strategies"]["join"]
    out["invariants"] = {
        "map_is_shuffle_free": m_["shuffle_write_mb"] == 0.0
        and m_["shuffle_read_mb"] == 0.0,
        "join_shuffles_mb": round(j_["shuffle_write_mb"] + j_["shuffle_read_mb"], 1),
        "tokens_identical": m_["total_tokens"] == j_["total_tokens"],
    }
    blob = json.dumps(out, indent=1)
    print(blob)
    if out_path:
        with open(out_path, "w") as f:
            f.write(blob + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
