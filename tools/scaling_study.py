"""Two-cluster-size scaling evidence (north rule): the identical job set
at local[N] and local[4N] on the same input, throughput at both plus
scaling efficiency:

    efficiency(q) = (T_N / T_4N) / 4      (1.0 = perfect linear)

Design notes for a fair measurement in a single-box sandbox:
- input is the sf1 webpages table (6M docs) so per-core work dominates
  fixed overhead (session startup, planning, Python worker spin-up);
- each (job, leg) runs `trials` times in one JVM; the MIN is reported
  (dampens cross-tenant noise on the shared host);
- legs run in separate subprocesses (clean JVM each).

Writes BENCH/scaling.json. Run with nothing else on the machine.

Usage: python tools/scaling_study.py [sf] [N] [trials]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_LEG_SCRIPT = """
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from coastsat_spark.session import get_spark
from coastsat_spark.datagen import ensure_webpages
from coastsat_spark.operators import dedup
from coastsat_spark.plans import pipeline

cpus = {cpus}
trials = {trials}
spark = get_spark(cpus=cpus, shuffle_partitions=cpus,
                  extra_conf={{"spark.ui.showConsoleProgress": "false"}},
                  tmpfs_local_dir=True)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(ensure_webpages(spark, {sf}))
n_docs = docs.count()
docs_mh = spark.read.parquet(ensure_webpages(spark, {sf_mh}))
docs_mh.count()

def flagship():
    # NOTE: each trial re-persists the pixel aggregate and leaves it
    # cached (small, bounded by tilesxmonthsxg^2; equal burden on both
    # legs). Unpersisting here would be cleaner but changes the measured
    # program -> flagship window lineage break; do it at the next one.
    return pipeline.run_flagship(spark, docs).timeseries.count()

def text_extract():
    from coastsat_spark.functions.text import extract_text
    return docs.select(F.length(extract_text(F.col("html"))).alias("n")).agg(F.sum("n")).collect()[0][0]

def minhash_assign():
    sub = docs_mh.select(F.xxhash64("url").alias("doc_id"), F.col("text"))
    out = dedup.minhash_dedup_assign(sub, k=64, bands=8, max_iters=3)
    return out.filter(F.col("canonical_id") != F.col("doc_id")).count()

def pack():
    from coastsat_spark.operators import packing
    sub = docs.select(F.xxhash64("url").alias("doc_id"), "text")
    return packing.pack_sequences(sub, ctx_len=2048, n_shards=64).count()

all_jobs = {{"flagship": (flagship, trials), "text_extract": (text_extract, trials),
             "minhash_assign": (minhash_assign, trials), "pack": (pack, trials)}}
only = {only!r}
jobs = {{k: v for k, v in all_jobs.items() if not only or k in only}}
times = {{}}
probes = {{}}
from tools.noise_probe import triad_gbps
for name, (fn, tr) in jobs.items():
    best = None
    # ambient DRAM probe around each job: the engine idles during the
    # sample, so a low reading here is the CO-TENANT, not self-load — a
    # leg whose probes read deep-burst levels is contaminated evidence
    ps = [round(triad_gbps(8_000_000), 3)]
    for _ in range(tr):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        spark.catalog.clearCache()
        ps.append(round(triad_gbps(8_000_000), 3))
    times[name] = round(best, 3)
    probes[name] = ps
print("LEG_RESULT " + json.dumps({{"cpus": cpus, "n_docs": n_docs, "times": times,
                                   "ambient_gbps": probes}}))
spark.stop()
"""


def run_leg(
    sf: float, cpus: int, trials: int, sf_mh: float = 1.0, only: tuple = ()
) -> dict:
    script = _LEG_SCRIPT.format(
        repo=REPO, cpus=cpus, sf=sf, trials=trials, sf_mh=sf_mh, only=tuple(only)
    )
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=5400
    )
    for line in out.stdout.splitlines():
        if line.startswith("LEG_RESULT "):
            return json.loads(line[len("LEG_RESULT "):])
    raise RuntimeError(f"leg failed: {out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    only = tuple(sys.argv[4].split(",")) if len(sys.argv) > 4 else ()
    # Amortization-sweep knobs (fixed-overhead evidence at larger inputs):
    # the minhash input sf and the artifact path are overridable so a
    # larger-sf window can't collide with the BENCH/scaling.json merge
    # lineage (per-(job,leg) minima are only meaningful at ONE input size).
    sf_mh = float(os.environ.get("SPARK_GRAFT_SF_MH", "1.0"))
    out_path = os.environ.get(
        "SPARK_GRAFT_SCALING_OUT", os.path.join(REPO, "BENCH", "scaling.json")
    )
    # INTERLEAVE the legs across trials (4,16,4,16,...) so slow host
    # drift (tenant bursts, thermal) hits both parallelism levels alike
    # instead of biasing whichever leg ran second; min-of-trials per
    # (job, leg) then drops the polluted rounds.
    # in-leg best-of-2 keeps the measurement WARM-JVM (codegen/JIT and
    # Python-worker spin-up hit the first run only — measured 29s cold vs
    # 18s warm for the same flagship leg); interleaving across outer
    # rounds still covers host-noise windows symmetrically.
    legs: dict = {}
    for t in range(trials):
        for cpus in (n, 4 * n):
            res = run_leg(sf, cpus, 2, sf_mh=sf_mh, only=only)
            print(f"trial {t} local[{cpus}]: {res['times']}", flush=True)
            if cpus not in legs:
                legs[cpus] = res
            else:
                for q, v in res["times"].items():
                    legs[cpus]["times"][q] = min(legs[cpus]["times"][q], v)
                for q, ps in res.get("ambient_gbps", {}).items():
                    legs[cpus].setdefault("ambient_gbps", {}).setdefault(q, []).extend(ps)
    small, big = legs[n], legs[4 * n]
    eff = {
        q: round((small["times"][q] / big["times"][q]) / 4.0, 3)
        for q in small["times"]
    }
    t_n = sum(small["times"].values())
    t_4n = sum(big["times"].values())
    summary = {
        "sf": sf,
        "sf_minhash": sf_mh,
        "n_docs": big["n_docs"],
        "N": n,
        "4N": 4 * n,
        "trials": trials,
        "times_N": small["times"],
        "times_4N": big["times"],
        **(
            {
                "docs_per_sec_flagship_N": round(big["n_docs"] / small["times"]["flagship"], 1),
                "docs_per_sec_flagship_4N": round(big["n_docs"] / big["times"]["flagship"], 1),
            }
            if "flagship" in small["times"]
            else {}
        ),
        "efficiency_per_query": eff,
        "efficiency_total": round((t_n / t_4n) / 4.0, 3),
        # idle-engine ambient probes around each job, per leg — a leg
        # whose min reads deep-burst (<~0.3 GB/s) is contaminated by the
        # co-tenant and the window should be re-run, not min-merged
        "ambient_gbps_N": small.get("ambient_gbps", {}),
        "ambient_gbps_4N": big.get("ambient_gbps", {}),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(out_path, "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
