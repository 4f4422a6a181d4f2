"""Memory-bandwidth ceiling calibration (companion to cpu_calibration).

STREAM-style triad over arrays far larger than LLC, at P concurrent
processes. Shuffle-heavy Spark stages are bandwidth-bound, not
compute-bound — their N->4N scaling is capped by THIS ratio, not by the
pure-CPU one. Writes BENCH/membw_calibration.json.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

import numpy as np

N = 64 * 1024 * 1024 // 8  # 64 MB per array, 3 arrays -> 192 MB >> LLC
REPS = 5


def _triad(_):
    a = np.ones(N)
    b = np.full(N, 2.0)
    c = np.empty(N)
    t0 = time.perf_counter()
    for _ in range(REPS):
        np.multiply(b, 0.5, out=c)
        c += a
    dt = time.perf_counter() - t0
    # bytes moved per rep: read b + write c + read a + read/write c
    return (REPS * 5 * N * 8) / dt


def bandwidth(procs: int) -> float:
    with mp.Pool(procs) as pool:
        t0 = time.perf_counter()
        per = pool.map(_triad, range(procs))
        wall = time.perf_counter() - t0
    total_bytes = REPS * 5 * N * 8 * procs
    return total_bytes / wall


def main() -> None:
    out = {}
    base = None
    for p in (1, 4, 8, 16):
        gbs = bandwidth(p) / 1e9
        base = base or gbs
        out[str(p)] = {"gb_per_sec": round(gbs, 2), "speedup_vs_1": round(gbs / base, 2)}
        print(p, out[str(p)])
    summary = {
        "per_procs": out,
        "bw_4x_ratios": {
            "4_to_16": round(out["16"]["gb_per_sec"] / out["4"]["gb_per_sec"], 3),
        },
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH", "membw_calibration.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
