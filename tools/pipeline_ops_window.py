"""Probe-gated pipeline-ops scaling windows (round 5).

Same accept/reject discipline as tools/pack_window.py, applied to the
LLM-pipeline operator bench (tools/pipeline_ops_bench.py): wait for a
quiet ambient window, run ONE N/4N study for the requested jobs, accept
it only if the probes embedded around every timed trial confirm the bus
stayed quiet (median per job-leg >= `accept` GB/s). Contaminated
windows stay on disk (pipeline_ops_w*.json) for the record; the first
clean one is copied to BENCH/pipeline_ops_<tag>_clean.json.

Usage: python tools/pipeline_ops_window.py [jobs_csv] [sf] [thr] [accept] [max_windows]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from tools.noise_probe import ambient_quiet, run_logged  # noqa: E402


def leg_medians(res: dict) -> list[float]:
    meds = []
    for key in ("ambient_gbps_N", "ambient_gbps_4N"):
        for ps in res.get(key, {}).values():
            s = sorted(ps)
            meds.append(s[len(s) // 2])
    return meds


def main() -> None:
    jobs = sys.argv[1] if len(sys.argv) > 1 else "bpe_encode"
    sf = sys.argv[2] if len(sys.argv) > 2 else "4.0"
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0
    accept = float(sys.argv[4]) if len(sys.argv) > 4 else 2.0
    max_windows = int(sys.argv[5]) if len(sys.argv) > 5 else 6
    tag = jobs.replace(",", "-") + f"_sf{sf}"
    for i in range(1, max_windows + 1):
        while not ambient_quiet(thr):
            time.sleep(60)
        out = os.path.join(REPO, f"BENCH/pipeline_ops_w{i}_{tag}.json")
        env_backup = os.environ.get("SPARK_GRAFT_PIPEOPS_OUT")
        os.environ["SPARK_GRAFT_PIPEOPS_OUT"] = out
        rc = run_logged(
            ["tools/pipeline_ops_bench.py", sf, "8", "1", jobs],
            os.path.join(REPO, f"BENCH/pipeline_ops_w{i}_{tag}.log"),
        )
        if env_backup is None:
            del os.environ["SPARK_GRAFT_PIPEOPS_OUT"]
        else:
            os.environ["SPARK_GRAFT_PIPEOPS_OUT"] = env_backup
        if rc != 0:
            print(f"window {i}: leg failed rc={rc}", flush=True)
            continue
        res = json.load(open(out))
        meds = leg_medians(res)
        print(
            f"window {i}: eff={res['efficiency_per_query']} probe medians={meds}",
            flush=True,
        )
        if meds and min(meds) >= accept:
            shutil.copy(out, os.path.join(REPO, f"BENCH/pipeline_ops_{tag}_clean.json"))
            print(f"window {i} ACCEPTED (probe-clean)", flush=True)
            return
    print("no probe-clean window captured", flush=True)


if __name__ == "__main__":
    main()
