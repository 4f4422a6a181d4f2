"""Input-size amortization sweep — the second half of the north-rule
scaling evidence.

The merged sf4 study shows N->4N efficiency ~0.72 (flagship) with both
legs converged; the residual vs the hardware ceilings (0.92 CPU / 0.83
DRAM) is consistent with a FIXED per-job cost c (planning, Python-worker
spin-up, per-stage scheduling floors, driver-side finalization) that
does not shrink with threads:

    T_N(sf) = c + W(sf)/s_N          efficiency(sf) = T_4 / (4 * T_16)

i.e. efficiency is a function of work-per-fixed-overhead, rising toward
the hardware ceiling as the input grows. A 10^12-row production job
amortizes c to nothing; this sandbox can only afford sf<=16, so the
sweep measures the same job at several input sizes and fits/validates
the model instead: if the small-sf points match the c fitted from the
sf4/sf1 lineage, the residual is demonstrably fixed overhead, not a
scaling wall.

Each point is quiet-gated (same gate as every round-4 artifact) and
runs the interleaved N/4N legs once (warm best-of-2 within each leg).
Writes BENCH/amort_{tag}.json per point; skips points whose artifact
already exists (re-run by deleting the file).

Usage: python tools/amortization_sweep.py [threshold_gbps]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.noise_probe import ambient_quiet as quiet, triad_gbps  # noqa: E402
from tools.scaling_study import run_leg  # noqa: E402

# (tag, jobs, sf_docs, sf_minhash) — cheapest first so short quiet
# windows still bank points; the expensive confirmatory points last.
POINTS = [
    ("flagship_sf0.4", ("flagship", "text_extract"), 0.4, 0.001),
    ("minhash_sf0.1", ("minhash_assign",), 0.1, 0.1),
    ("minhash_sf0.25", ("minhash_assign",), 0.1, 0.25),
    ("flagship_sf1", ("flagship", "text_extract"), 1.0, 0.001),
    ("minhash_sf2", ("minhash_assign",), 0.1, 2.0),
    ("flagship_sf16", ("flagship", "text_extract"), 16.0, 0.001),
    # the model-anchor sizes re-measured under the SAME ambient window as
    # the sweep: the merged scaling.json minima were collected across
    # noisier windows and sit off the quiet-host fit line (stale-noise
    # residual), so the fit gets same-conditions points at every size
    ("flagship_sf4", ("flagship", "text_extract"), 4.0, 0.001),
    ("minhash_sf1", ("minhash_assign",), 0.1, 1.0),
]

N = 4


def ensure_inputs() -> None:
    """Materialize every needed sf BEFORE waiting for quiet (datagen is
    not a measurement). Runs in one throwaway session."""
    from coastsat_spark.datagen import ensure_webpages, webpages_path
    from coastsat_spark.session import get_spark

    def marker(sf):
        return os.path.join(webpages_path(sf, REPO + "/data"), "_SUCCESS")

    sfs = sorted({p[2] for p in POINTS} | {p[3] for p in POINTS})
    missing = []
    for sf in sfs:
        if os.path.exists(marker(sf)):
            continue
        # another generator may be mid-write (markerless dir with recent
        # mtime activity): wait for it rather than double-writing the dir
        d = webpages_path(sf, REPO + "/data")

        def activity(path):
            times = [os.path.getmtime(path)]
            for root, dirs, _files in os.walk(path):
                times += [os.path.getmtime(os.path.join(root, x)) for x in dirs]
            return max(times)

        while os.path.isdir(d) and time.time() - activity(d) < 300:
            if os.path.exists(marker(sf)):
                break
            print(f"sf{sf}: concurrent generator active; waiting", flush=True)
            time.sleep(60)
        if not os.path.exists(marker(sf)):
            missing.append(sf)
    if not missing:
        return
    spark = get_spark(cpus=16, shuffle_partitions=32)
    for sf in missing:
        print(f"datagen sf{sf}", flush=True)
        ensure_webpages(spark, sf)
    spark.stop()


def main() -> None:
    thr = float(sys.argv[1]) if len(sys.argv) > 1 else 0.8
    ensure_inputs()
    for tag, jobs, sf, sf_mh in POINTS:
        out = os.path.join(REPO, "BENCH", f"amort_{tag}.json")
        if os.path.exists(out):
            print(f"skip {tag} (exists)", flush=True)
            continue
        while not quiet(thr):
            print(f"{tag}: not quiet; sleeping", flush=True)
            time.sleep(120)
        print(f"== {tag} ==", flush=True)
        ambient0 = triad_gbps()
        legs = {}
        for cpus in (N, 4 * N):
            legs[cpus] = run_leg(sf, cpus, 2, sf_mh=sf_mh, only=jobs)
            print(f"local[{cpus}]: {legs[cpus]['times']}", flush=True)
        ambient1 = triad_gbps()
        small, big = legs[N], legs[4 * N]
        summary = {
            "tag": tag,
            "sf": sf,
            "sf_minhash": sf_mh,
            "n_docs": big["n_docs"],
            "N": N,
            "4N": 4 * N,
            "times_N": small["times"],
            "times_4N": big["times"],
            "efficiency_per_query": {
                q: round((small["times"][q] / big["times"][q]) / 4.0, 3)
                for q in small["times"]
            },
            "ambient_triad_gbps": {"before": round(ambient0, 3),
                                   "after": round(ambient1, 3)},
        }
        with open(out, "w") as fh:
            json.dump(summary, fh, indent=2)
        print(json.dumps(summary["efficiency_per_query"]), flush=True)
    print("sweep done", flush=True)


if __name__ == "__main__":
    main()
