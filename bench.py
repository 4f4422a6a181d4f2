"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...extras}

The flagship number is the end-to-end shoreline-extraction +
spatial-join pipeline over the deterministic webpages table at the
matching scale (BASELINE.json metric: docs/sec + tiles/sec). The
webpages parquet is materialized once (generation cost excluded; the
bench measures the engine, not the generator).

Each query is timed $SPARK_GRAFT_BENCH_TRIALS times (default 2) and the
MIN is reported: a co-tenant on this shared host saturates the DRAM bus
in multi-minute bursts (BENCH/BASELINE.md "shared-host honesty"), and
min-of-trials plus the embedded ambient-bandwidth samples keep the
artifact interpretable when a burst lands mid-run. A QUIET-WINDOW GATE
waits (bounded by $SPARK_GRAFT_BENCH_QUIET_WAIT_S, default 300 s) for
the ambient probe to recover above $SPARK_GRAFT_BENCH_QUIET_GBPS
(default 0.45, ~0.3x the calibrated quiet triad) before the run and
before any deep-burst query, so the official artifact can't record a
bus-contended number without saying so. When a query's trials disagree
by >30% or ANY per-trial ambient probe (full 192 MB triad — a smaller
one reads L3, not DRAM; probes re-sampled after every trial) says
<1 GB/s (deep burst), up to $SPARK_GRAFT_BENCH_MAX_TRIALS (default 4)
trials run, bounded by $SPARK_GRAFT_BENCH_BUDGET_S (default 900 s)
total — min is unbiased under noise that only ever adds wall-clock, so
extra trials are extra chances to sample the unloaded time, never a
fudge.

Run tools/scaling_study.py for the N-vs-4N parallelism measurement
recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def main() -> None:
    from pyspark.sql import functions as F

    from coastsat_spark.datagen import ensure_webpages
    from coastsat_spark.operators import dedup, raster, similarity, tiling, transects
    from coastsat_spark.plans import pipeline
    from coastsat_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = _sf_of(sf_dir)

    spark = get_spark(
        app_name="coastsat_spark_bench",
        cpus=cpus,
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
        tmpfs_local_dir=True,
    )
    spark.sparkContext.setLogLevel("ERROR")

    web_path = ensure_webpages(spark, sf)
    docs = spark.read.parquet(web_path)
    n_docs = docs.count()  # warms the scan / JVM

    def run_flagship():
        res = pipeline.run_flagship(spark, docs)
        return res.timeseries.count()

    def run_pixel_agg():
        prepared = tiling.prepare_documents(docs)
        return raster.aggregate_pixels(prepared).count()

    def run_shorelines():
        prepared = tiling.prepare_documents(docs)
        # persist at the pixel-aggregate boundary (same materialization
        # run_flagship uses): TWO consumers share it — the scene-quality
        # gate and the extraction (the halo itself is single-scan now)
        px = raster.aggregate_pixels(prepared).persist()
        q = raster.scene_quality(px, raster.ShorelineSettings())
        try:
            return raster.extract_shorelines(px, quality=q).count()
        finally:
            px.unpersist()

    def run_text_extract():
        from coastsat_spark.functions.text import extract_text

        return (
            docs.select(F.length(extract_text(F.col("html"))).alias("n"))
            .agg(F.sum("n"))
            .collect()[0][0]
        )

    def run_pricing():
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        return (
            li.filter(F.col("l_shipdate") <= "1995-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity"), F.avg("l_extendedprice"), F.count(F.lit(1)))
            .count()
        )

    def run_minhash_dedup():
        # canonical-assignment dedup (linear output — pair enumeration is
        # quadratic in near-dup cluster size and is not the scale path)
        sub = docs.select(F.xxhash64("url").alias("doc_id"), F.col("text"))
        out = dedup.minhash_dedup_assign(sub, k=64, bands=16)
        return out.filter(F.col("canonical_id") != F.col("doc_id")).count()

    def run_ann():
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        q = emb.limit(50)
        return similarity.cosine_topk_bruteforce(q, emb, k=10).count()

    bench_queries = {
        "flagship_shoreline_ts": run_flagship,
        "pixel_aggregate": run_pixel_agg,
        "shoreline_extract": run_shorelines,
        "text_extract": run_text_extract,
        "pricing_summary": run_pricing,
        "minhash_dedup_assign": run_minhash_dedup,
        "ann_bruteforce": run_ann,
    }

    def _triad_gbps(n: int = 8_000_000) -> float:
        # one-shot single-thread DRAM-triad sample: a co-tenant on this
        # shared host saturates the memory bus in bursts (observed 30x+
        # degradation, BENCH/noise_log.jsonl); recording the ambient
        # bandwidth alongside the timings makes the artifact interpretable
        from tools.noise_probe import triad_gbps

        return round(triad_gbps(n), 3)

    trials = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "2")))
    # Burst-adaptive retries: the co-tenant's DRAM-bus bursts last minutes
    # (BENCH/BASELINE.md), so BOTH baseline trials can land inside one and
    # min-of-2 still reports a 5-50x inflated number. When the trials of a
    # query disagree by >30% (a burst edge crossed mid-query) or ANY
    # ambient probe taken before/after each trial read <1 GB/s (the probe
    # is the full 8M-double / 192 MB-stream triad, ~0.1 s quiet — a
    # smaller one sits in L3 and reads cache, not DRAM bandwidth), re-run
    # up to max_trials, bounded by a total wall budget so the driver's
    # bench never runs away. Probes are RE-SAMPLED after every trial so a
    # burst that starts after the pre-query probe and covers all trials
    # uniformly is still detected. The aggregate stays MIN (bursts only
    # ever ADD wall-clock) and the artifact records trials actually used
    # + the per-query probe min/max.
    max_trials = max(trials, int(os.environ.get("SPARK_GRAFT_BENCH_MAX_TRIALS", "4")))
    budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "900"))
    # Quiet-window gate (round-4 VERDICT #1): an official number recorded
    # while the bus is saturated is worthless, so before the run — and
    # again before any query whose probe reads deep-burst levels — wait
    # for the ambient bandwidth to recover above `quiet_gbps` (~0.3x the
    # calibrated quiet single-thread triad of ~1.5 GB/s,
    # BENCH/membw_calibration.json + noise_log.jsonl), bounded by
    # `quiet_wait` so the bench always completes. The artifact records
    # how long it waited and whether the gate ever gave up.
    # 900 s default: the co-tenant's bursts last minutes (round-5 logs show
    # multi-minute 0.03-0.2 GB/s episodes), so a 300 s cap frequently gave
    # up mid-burst and recorded a contaminated headline (the r4 flagship
    # story). Waiting is cheap relative to publishing a wrong number.
    # The env value is a FLOOR, not the bar: the host's quiet level moves
    # between rounds (r4 calibration ~1.5 GB/s; r5 sessions observed idle
    # ~7-8 with bursts parked at 0.6-0.7 — ABOVE a fixed 0.45 bar, which
    # would bless a contended trial). So the gate learns the regime: the
    # bar is max(floor, 0.3 x the highest probe seen this run). Seeing one
    # genuinely idle probe raises the bar to reject the 0.6 GB/s burst
    # plateau; on a host whose true quiet IS ~1.5 the bar settles at
    # ~0.45-0.5 exactly as before.
    quiet_gbps = float(os.environ.get("SPARK_GRAFT_BENCH_QUIET_GBPS", "0.45"))
    quiet_wait = float(os.environ.get("SPARK_GRAFT_BENCH_QUIET_WAIT_S", "900"))
    bench_t0 = time.perf_counter()
    quiet_waited = 0.0
    quiet_gave_up = False
    peak_amb = 0.0

    def _quiet_bar() -> float:
        return max(quiet_gbps, 0.3 * peak_amb)

    def wait_for_quiet(max_wait_s: float, poll_s: float = 15.0) -> float:
        nonlocal quiet_waited, quiet_gave_up, peak_amb
        amb = _triad_gbps()
        peak_amb = max(peak_amb, amb)
        waited = 0.0
        while amb < _quiet_bar() and waited < max_wait_s:
            time.sleep(poll_s)
            waited += poll_s
            amb = _triad_gbps()
            peak_amb = max(peak_amb, amb)
        quiet_waited += waited
        if amb < _quiet_bar():
            quiet_gave_up = True
        return amb

    noise_before = wait_for_quiet(quiet_wait)
    times: dict[str, float] = {}
    rows: dict[str, int] = {}
    trials_used: dict[str, int] = {}
    ambient_q: dict[str, dict[str, float]] = {}
    for name, fn in bench_queries.items():
        probes = [wait_for_quiet(min(120.0, quiet_wait))]
        samples: list[float] = []
        while True:
            t0 = time.perf_counter()
            rows[name] = int(fn() or 0)
            samples.append(time.perf_counter() - t0)
            # drop caches each query leaves behind so later queries measure
            # the engine, not accumulated session state; the explicit driver
            # GC lets ContextCleaner reap shuffle files + any unreferenced
            # blocks NOW instead of when the 16 GiB heap eventually collects
            # (accumulated blocks pin storage memory and skew later queries)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            # re-sample the bus AFTER the trial: a burst beginning after
            # the pre-query probe (bursts last minutes, trials seconds)
            # must still mark the query noisy
            probes.append(_triad_gbps())
            peak_amb = max(peak_amb, probes[-1])
            if len(samples) < trials:
                continue
            if len(samples) >= max_trials:
                break
            # budget covers TRIAL time only: quiet-gate waiting is excluded,
            # otherwise a long initial wait (up to 900 s above) would starve
            # every query down to the minimum trial count — the exact
            # burst-vulnerable shape the adaptive retries exist to prevent
            if time.perf_counter() - bench_t0 - quiet_waited > budget_s:
                break
            noisy = min(probes) < 1.0 or (max(samples) / min(samples) > 1.3)
            if not noisy:
                break
        times[name] = round(min(samples), 3)
        trials_used[name] = len(samples)
        ambient_q[name] = {
            "min": round(min(probes), 3),
            "max": round(max(probes), 3),
        }
    noise_after = _triad_gbps()

    total = round(sum(times.values()), 3)
    flagship = times["flagship_shoreline_ts"]
    out = {
        "metric": "end-to-end shoreline-extraction + spatial-join + training-data ops",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / flagship, 1) if flagship else None,
        "cpus": cpus,
        "rows": rows,
        "trials_per_query": trials_used,
        "agg": "min",
        "ambient_dram_gbps": {
            "before": noise_before,
            "after": noise_after,
            "per_query": ambient_q,
        },
        "quiet_gate": {
            "threshold_gbps": quiet_gbps,
            "learned_bar_gbps": round(_quiet_bar(), 3),
            "peak_ambient_gbps": round(peak_amb, 3),
            "waited_s": round(quiet_waited, 1),
            "gave_up": quiet_gave_up,
        },
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
