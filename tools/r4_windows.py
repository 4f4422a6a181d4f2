"""Collect round-4 scaling windows for the rest of the session.

Loop: wait for a quiet-ish ambient window; on the FIRST quiet window run
the sf1 minhash decomposition legs (N=4/N=16, matching the scaling
study's minhash job exactly: sf1 docs, k=64, bands=8) back-to-back;
then run one interleaved scaling window, save it as
BENCH/scaling_r4v2w{i}.json (the post-contour-kernel lineage; the old
r4w* windows measured a different flagship program and are excluded by
merge_scaling's LINEAGE_EXCLUDE), and min-merge all v2 windows into
BENCH/scaling.json. Repeat until max_windows.

Usage: python tools/r4_windows.py [threshold_gbps] [max_windows]
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from tools.noise_probe import ambient_quiet as quiet, run_logged as run  # noqa: E402


def _membw_done() -> bool:
    # the max-merge protocol field marks a post-fix (unbiased-triad) run
    import json

    p = os.path.join(REPO, "BENCH/membw_calibration.json")
    try:
        return "protocol" in json.load(open(p))
    except Exception:
        return False


def main() -> None:
    thr = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
    max_windows = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    done_decomp = os.path.exists(os.path.join(REPO, "BENCH/minhash_decomp_sf1_N4.json"))
    done_membw = _membw_done()
    w = len(glob.glob(os.path.join(REPO, "BENCH/scaling_r4v2w*.json")))
    while w < max_windows:
        if not quiet(thr):
            time.sleep(120)
            continue
        if not done_membw:
            print("== membw recalibration (quiet) ==", flush=True)
            rc = run(["tools/membw_calibration.py", "2"], "/tmp/membw_recal.log",
                     timeout=1800)
            print(f"membw: rc={rc}", flush=True)
            done_membw = True
            continue  # re-check quiet before burning a scaling window
        if not done_decomp:
            print("== sf1 decomposition legs (quiet) ==", flush=True)
            for cpus in (4, 16):
                rc = run(["tools/minhash_decomp.py", "1", str(cpus),
                          f"BENCH/minhash_decomp_sf1_N{cpus}.json"],
                         f"/tmp/decomp_sf1_n{cpus}.log")
                print(f"decomp sf1 N={cpus}: rc={rc}", flush=True)
            done_decomp = True
            continue  # re-check quiet before burning a scaling window
        # number the next window from what exists; only count a window
        # against max_windows once its artifact is actually on disk, so
        # a crashed scaling_study retries instead of burning the budget
        nxt = len(glob.glob(os.path.join(REPO, "BENCH/scaling_r4v2w*.json"))) + 1
        dst = os.path.join(REPO, "BENCH", f"scaling_r4v2w{nxt}.json")
        print(f"== scaling window r4v2w{nxt} ==", flush=True)
        os.environ["SPARK_GRAFT_SF_MH"] = "1.0"
        os.environ["SPARK_GRAFT_SCALING_OUT"] = dst
        rc = run(["tools/scaling_study.py", "4", "4", "1"], f"/tmp/scaling_r4v2w{nxt}.log")
        if rc == 0 and os.path.exists(dst):
            w += 1
            wins = sorted(glob.glob(os.path.join(REPO, "BENCH/scaling_r4v2w*.json")))
            run(["tools/merge_scaling.py"] + wins, "/tmp/merge_r4.log")
            print(f"merged {len(wins)} v2 windows", flush=True)
        else:
            print(f"window failed (rc={rc}); will retry", flush=True)
        # one extra membw round per window: the max-merge makes repeats
        # free (a polluted round never raises the max), and the 8>16
        # incoherence in the first artifact showed one quiet pass per
        # proc-count is not enough to converge
        run(["tools/membw_calibration.py", "1"], "/tmp/membw_recal.log", timeout=1800)
    print("window collection done", flush=True)


if __name__ == "__main__":
    main()
