"""Round-4 performance evidence suite, gated on a quiet ambient window.

Loops until the single-thread DRAM triad (median of 3) exceeds the
threshold, then runs back-to-back:
  1. minhash decomposition legs (N=4, N=16) -> BENCH/minhash_decomp_N{4,16}.json
  2. multi-process DRAM-bandwidth recalibration -> BENCH/membw_calibration.json
     (the r3 artifact was measured inside co-tenant bursts and is
     non-monotonic garbage: 0.07 -> 9.61 -> 1.79 GB/s)
  3. one fresh scaling window at the current code -> BENCH/scaling_r4w1.json
     (r3 minima are NOT merged in: the flagship changed — halo stitching)

Usage: python tools/r4_perf_suite.py [threshold_gbps]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


sys.path.insert(0, REPO)
from tools.noise_probe import ambient_quiet as quiet, run_logged as run  # noqa: E402


def main() -> None:
    thr = float(sys.argv[1]) if len(sys.argv) > 1 else 0.3
    while not quiet(thr):
        time.sleep(120)

    print("== decomposition legs ==", flush=True)
    for cpus in (4, 16):
        rc = run(["tools/minhash_decomp.py", "4", str(cpus),
                  f"BENCH/minhash_decomp_N{cpus}.json"], f"/tmp/decomp_n{cpus}.log")
        print(f"decomp N={cpus}: rc={rc}", flush=True)

    print("== membw recalibration ==", flush=True)
    rc = run(["tools/membw_calibration.py"], "/tmp/membw.log", timeout=1800)
    print(f"membw: rc={rc}", flush=True)

    print("== scaling window (r4 code) ==", flush=True)
    rc = run(["tools/scaling_study.py", "4", "4", "2"], "/tmp/scaling_r4.log")
    print(f"scaling: rc={rc}", flush=True)
    src = os.path.join(REPO, "BENCH", "scaling.json")
    if rc == 0 and os.path.exists(src):
        shutil.copy(src, os.path.join(REPO, "BENCH", "scaling_r4w1.json"))
        with open(src) as f:
            print(json.dumps(json.load(f).get("efficiency_per_query", {})), flush=True)

    print("== in-session bench (sf0.1, min-of-2) ==", flush=True)
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
               SPARK_GRAFT_CPUS="32", SPARK_GRAFT_BENCH_TRIALS="2")
    with open("/tmp/bench_r4_insession.log", "w") as f:
        subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       stdout=f, stderr=subprocess.STDOUT, timeout=3600,
                       cwd=REPO, env=env)
    print("suite done", flush=True)


if __name__ == "__main__":
    main()
