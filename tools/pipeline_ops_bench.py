"""North-rule scaling evidence for the round-5 LLM-pipeline operators
(gopher_rules, lm_perplexity, bloom build+probe, bpe_encode): the same
jobs at local[N] and local[4N] on the same input, min-of-trials with
interleaved legs and per-job ambient DRAM probes — the methodology of
tools/scaling_study.py applied to the new operator family.

Writes BENCH/pipeline_ops_scaling.json.

Usage: python tools/pipeline_ops_bench.py [sf] [N] [trials] [only,csv]
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
from coastsat_spark.operators import bloom, bpe, selection

cpus = {cpus}
trials = {trials}
# scan splits must outnumber cores by enough waves for balance: the
# compacted tables are ~110 MB/file (sf4 = 48 files), so the default
# 128 MB maxPartitionBytes gives 32 cores only 1.5 waves — a ~0.75
# efficiency ceiling from the straggler wave alone, before the bus is
# even involved. 16 MB → ≥4 waves at every leg size used here.
spark = get_spark(cpus=cpus, shuffle_partitions=cpus,
                  extra_conf={{"spark.ui.showConsoleProgress": "false",
                               "spark.sql.files.maxPartitionBytes": "16m"}},
                  tmpfs_local_dir=True)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(ensure_webpages(spark, {sf}))
n_docs = docs.count()
d = docs.select(F.xxhash64("url").alias("doc_id"), "text")

def gopher():
    return selection.gopher_rules(d, min_words=20).agg(
        F.sum(F.col("keep").cast("int"))).collect()[0][0]

def lm_ppl():
    # model = 5% hash-bounded sample of the corpus (the CCNet shape:
    # reference corpus much smaller than the filtered one)
    model = d.where(F.pmod(F.xxhash64("doc_id"), F.lit(20)) == 0)
    return selection.lm_perplexity(d, model, order=3).agg(
        F.avg("ppl")).collect()[0][0]

def bloom_rt():
    keys = d.select(F.col("doc_id").alias("key"))
    half = keys.where(F.pmod(F.xxhash64("key"), F.lit(2)) == 0)
    bm = bloom.bloom_build(half, m_bits=1 << 26)
    probed = bloom.bloom_probe(
        d.select("doc_id", F.col("doc_id").alias("key")), bm, m_bits=1 << 26)
    return probed.agg(F.sum(F.col("maybe_seen").cast("int"))).collect()[0][0]

# merges are vocab-bounded and trained once outside the timed region —
# the corpus-sized op under test is the ENCODE pass. Training is
# deterministic, so cache the fitted model on disk: repeat legs /
# window hunts skip the ~10-min single-threaded driver merge loop.
import os
_model_path = os.path.join({repo!r}, "BENCH", f".bpe_model_sf{sf}.json")
if os.path.exists(_model_path):
    with open(_model_path) as fh:
        _m = json.load(fh)
    _MERGES = [tuple(p) for p in _m["merges"]]
    _VOCAB = spark.createDataFrame(
        [(t, i) for t, i in _m["vocab"]], "token string, token_id long")
else:
    _MERGES, _VOCAB = bpe.bpe_train(
        d.where(F.pmod(F.xxhash64("doc_id"), F.lit(50)) == 0),
        n_merges=300, max_words=200_000)
    with open(_model_path, "w") as fh:
        json.dump({{"merges": _MERGES,
                    "vocab": [(r["token"], r["token_id"]) for r in _VOCAB.collect()]}}, fh)
_VOCAB = _VOCAB.cache(); _VOCAB.count()

def bpe_encode():
    return bpe.bpe_encode(d, _MERGES, _VOCAB).agg(
        F.sum("n_tokens")).collect()[0][0]

all_jobs = {{"gopher_rules": (gopher, trials), "lm_perplexity": (lm_ppl, trials),
             "bloom_roundtrip": (bloom_rt, trials), "bpe_encode": (bpe_encode, trials)}}
only = {only!r}
jobs = {{k: v for k, v in all_jobs.items() if not only or k in only}}
times, probes = {{}}, {{}}
from tools.noise_probe import triad_gbps

def wait_quiet(max_wait=240.0, floor={quiet_gbps}):
    # same shared-host honesty as bench.py: don't start a timed trial
    # in a co-tenant burst window (burst ~0.1-0.7 GB/s vs quiet ~7-8);
    # give up after max_wait so the study always completes, and record
    # the probe either way
    amb, waited = round(triad_gbps(8_000_000), 3), 0.0
    while amb < floor and waited < max_wait:
        time.sleep(10.0); waited += 10.0
        amb = round(triad_gbps(8_000_000), 3)
    return amb

for name, (fn, tr) in jobs.items():
    best = None
    ps = [wait_quiet()]
    for _ in range(tr):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
        spark.catalog.clearCache(); _VOCAB.cache(); _VOCAB.count()
        ps.append(wait_quiet())
    times[name] = round(best, 3)
    probes[name] = ps
print("LEG_RESULT " + json.dumps({{"cpus": cpus, "n_docs": n_docs, "times": times,
                                   "ambient_gbps": probes}}))
spark.stop()
"""


def run_leg(sf: float, cpus: int, trials: int, only: tuple = ()) -> dict:
    quiet_gbps = float(os.environ.get("SPARK_GRAFT_PIPEOPS_QUIET_GBPS", "2.0"))
    script = _LEG_SCRIPT.format(
        repo=REPO, cpus=cpus, sf=sf, trials=trials, only=tuple(only), quiet_gbps=quiet_gbps
    )
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=10800
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
    out_path = os.environ.get(
        "SPARK_GRAFT_PIPEOPS_OUT", os.path.join(REPO, "BENCH", "pipeline_ops_scaling.json")
    )
    legs: dict = {}
    for t in range(trials):
        for cpus in (n, 4 * n):
            res = run_leg(sf, cpus, 2, only=only)
            print(f"trial {t} local[{cpus}]: {res['times']}", flush=True)
            if cpus not in legs:
                legs[cpus] = res
            else:
                for q, v in res["times"].items():
                    legs[cpus]["times"][q] = min(legs[cpus]["times"][q], v)
                for q, ps in res.get("ambient_gbps", {}).items():
                    legs[cpus].setdefault("ambient_gbps", {}).setdefault(q, []).extend(ps)
    small, big = legs[n], legs[4 * n]
    eff = {q: round((small["times"][q] / big["times"][q]) / 4.0, 3) for q in small["times"]}
    t_n, t_4n = sum(small["times"].values()), sum(big["times"].values())
    summary = {
        "sf": sf, "n_docs": big["n_docs"], "N": n, "4N": 4 * n, "trials": trials,
        "times_N": small["times"], "times_4N": big["times"],
        "efficiency_per_query": eff,
        "efficiency_total": round((t_n / t_4n) / 4.0, 3),
        "ambient_gbps_N": small.get("ambient_gbps", {}),
        "ambient_gbps_4N": big.get("ambient_gbps", {}),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(out_path, "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
