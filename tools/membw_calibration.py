"""Memory-bandwidth ceiling calibration (companion to cpu_calibration).

STREAM-style triad over arrays far larger than LLC, at P concurrent
processes. Shuffle-heavy Spark stages are bandwidth-bound, not
compute-bound — their N->4N scaling is capped by THIS ratio, not by the
pure-CPU one. Writes BENCH/membw_calibration.json.

Shared-host protocol (same as the scaling study, dual form): co-tenant
bursts only ever REMOVE bandwidth, so the MAX over interleaved trials
per proc-count converges to the unloaded figure. Proc counts are
interleaved within each round so a burst cannot bias one count
systematically, and the artifact embeds ambient single-thread triad
samples so a fully-polluted run is recognizable. Re-runs merge with the
existing artifact by per-count max (a fresh lineage only matters if the
host hardware changes).

Usage: python tools/membw_calibration.py [rounds]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

N = 64 * 1024 * 1024 // 8  # 64 MB per array, 3 arrays -> 192 MB >> LLC
REPS = 5


_barrier = None


def _init_barrier(b):
    global _barrier
    _barrier = b


def _triad(_):
    a = np.ones(N)
    b = np.full(N, 2.0)
    c = np.empty(N)
    np.multiply(b, 0.5, out=c)  # touch every page before timing
    c += a
    if _barrier is not None:
        _barrier.wait()
    t0 = time.perf_counter()
    for _ in range(REPS):
        np.multiply(b, 0.5, out=c)
        c += a
    return time.perf_counter() - t0


def bandwidth(procs: int) -> float:
    """Aggregate triad bandwidth at `procs` concurrent workers.

    Workers allocate and first-touch their arrays, meet at a barrier,
    then time only the streaming loop; the aggregate is total counted
    bytes over the SLOWEST worker's timed span (all spans start
    together, so the max covers the fully-concurrent region). Timing in
    the workers keeps pool dispatch, fork, and 192 MB/worker init out
    of the denominator — the old outer-wall form deflated higher proc
    counts more (more init traffic per counted byte), which is how the
    artifact briefly recorded 8-proc bandwidth above 16-proc.
    """
    barrier = mp.Barrier(procs)
    with mp.Pool(procs, initializer=_init_barrier, initargs=(barrier,)) as pool:
        dts = pool.map(_triad, range(procs))
    # bytes moved per rep: read b + write c + read a + read/write c
    total_bytes = REPS * 5 * N * 8 * procs
    return total_bytes / max(dts)


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "BENCH", "membw_calibration.json")
    best: dict[str, float] = {}
    if os.path.exists(path):
        prior = json.load(open(path))
        best = {p: v["gb_per_sec"] for p, v in prior.get("per_procs", {}).items()}
    ambient = []
    for r in range(rounds):
        ambient.append(round(bandwidth(1) / 1e9, 3))
        for p in (1, 4, 8, 16):
            gbs = bandwidth(p) / 1e9
            best[str(p)] = max(best.get(str(p), 0.0), gbs)
            print(f"round {r} procs {p}: {gbs:.2f} GB/s (best {best[str(p)]:.2f})",
                  flush=True)
    out = {
        p: {"gb_per_sec": round(best[p], 2),
            "speedup_vs_1": round(best[p] / best["1"], 2)}
        for p in sorted(best, key=int)
    }
    summary = {
        "per_procs": out,
        "bw_4x_ratios": {
            "4_to_16": round(best["16"] / best["4"], 3),
        },
        "ambient_triad_gbps_per_round": ambient,
        "protocol": "barrier-synced worker-timed triad; max over trials, merged across runs",
    }
    with open(path, "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
