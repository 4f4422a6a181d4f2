"""Host parallel-capacity calibration for the scaling study.

Pure-CPU multiprocess throughput at P in {1,4,8,16,32} establishes the
ceiling any Spark job can reach on this box (shared hyperthreaded hosts
do NOT deliver 4x from 8->32 threads). Reported next to the Spark
efficiency numbers in BENCH/ so the N->4N criterion is judged against
the hardware's own scaling, not an idealized 4x.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

N_ITER = 20_000_000


def _burn(_):
    x = 0
    for i in range(N_ITER):
        x += i * i & 1023
    return x


def throughput(procs: int) -> float:
    with mp.Pool(procs) as pool:
        t0 = time.perf_counter()
        pool.map(_burn, range(procs))
        dt = time.perf_counter() - t0
    return procs * N_ITER / dt


def main() -> None:
    out = {}
    base = None
    for p in (1, 4, 8, 16, 32):
        tp = throughput(p)
        base = base or tp
        out[str(p)] = {"iters_per_sec": round(tp), "speedup_vs_1": round(tp / base, 2)}
        print(p, out[str(p)])
    ratios = {
        "4_to_16": round(out["16"]["speedup_vs_1"] / out["4"]["speedup_vs_1"], 3),
        "8_to_32": round(out["32"]["speedup_vs_1"] / out["8"]["speedup_vs_1"], 3),
    }
    summary = {"per_procs": out, "hardware_4x_ratios": ratios}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(repo, "BENCH"), exist_ok=True)
    with open(os.path.join(repo, "BENCH", "cpu_calibration.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps(ratios))


if __name__ == "__main__":
    main()
