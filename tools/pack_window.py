"""Probe-gated pack_sequences scaling windows (round 5).

Loop: wait for a quiet ambient window (median triad > thr), run ONE
interleaved N/4N scaling window for the `pack` job at sf4, then accept
it only if the probes EMBEDDED in the window (sampled around every
timed trial, engine idle) confirm the bus stayed quiet — median per
leg above `accept` GB/s. Contaminated windows are kept on disk
(scaling_pack_w*.json) for the record but the first clean one is
copied to BENCH/scaling_pack_sf4_clean.json and the loop stops.

Usage: python tools/pack_window.py [thr] [accept] [max_windows] [sf]
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


def _leg_medians(res: dict) -> list[float]:
    meds = []
    for key in ("ambient_gbps_N", "ambient_gbps_4N"):
        for ps in res.get(key, {}).values():
            s = sorted(ps)
            meds.append(s[len(s) // 2])
    return meds


def main() -> None:
    thr = float(sys.argv[1]) if len(sys.argv) > 1 else 3.0
    accept = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
    max_windows = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    sf = sys.argv[4] if len(sys.argv) > 4 else "4.0"
    for i in range(1, max_windows + 1):
        while not ambient_quiet(thr):
            time.sleep(60)
        out = os.path.join(REPO, f"BENCH/scaling_pack_w{i}.json")
        env_backup = os.environ.get("SPARK_GRAFT_SCALING_OUT")
        os.environ["SPARK_GRAFT_SCALING_OUT"] = out
        rc = run_logged(
            ["tools/scaling_study.py", sf, "8", "2", "pack"],
            os.path.join(REPO, f"BENCH/pack_w{i}.log"),
        )
        if env_backup is None:
            del os.environ["SPARK_GRAFT_SCALING_OUT"]
        else:
            os.environ["SPARK_GRAFT_SCALING_OUT"] = env_backup
        if rc != 0:
            print(f"window {i}: leg failed rc={rc}", flush=True)
            continue
        res = json.load(open(out))
        meds = _leg_medians(res)
        eff = res["efficiency_per_query"]["pack"]
        print(f"window {i}: eff={eff} leg probe medians={meds}", flush=True)
        if meds and min(meds) >= accept:
            shutil.copy(out, os.path.join(REPO, "BENCH/scaling_pack_sf4_clean.json"))
            print(f"window {i} ACCEPTED (probe-clean)", flush=True)
            return
    print("no probe-clean window captured", flush=True)


if __name__ == "__main__":
    main()
