"""Wait for a quiet ambient-bandwidth window, then run the minhash
decomposition legs (N=4 and N=16) back-to-back so both see comparable
host conditions. Retries every 2 minutes while the co-tenant bursts.

Usage: python tools/quiet_decomp_runner.py [sf] [threshold_gbps]
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def triad_once(n: int = 8_000_000) -> float:
    a = np.random.rand(n)
    b = np.random.rand(n)
    c = np.empty_like(a)
    tb = np.empty_like(a)
    np.multiply(b, 2.0, out=tb)
    t0 = time.perf_counter()
    np.add(a, tb, out=c)
    return (3 * 8 * n / (time.perf_counter() - t0)) / 1e9


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "4"
    thr = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3
    while True:
        vals = []
        for _ in range(3):
            vals.append(triad_once())
            time.sleep(2)
        med = sorted(vals)[1]
        print(f"ambient median {med:.3f} GB/s", flush=True)
        if med > thr:
            for cpus in (4, 16):
                out = os.path.join(REPO, f"BENCH/minhash_decomp_N{cpus}.json")
                log = f"/tmp/decomp_n{cpus}.log"
                with open(log, "w") as f:
                    subprocess.run(
                        [sys.executable, os.path.join(REPO, "tools/minhash_decomp.py"),
                         sf, str(cpus), out],
                        stdout=f, stderr=subprocess.STDOUT, timeout=3600,
                    )
                print(f"leg N={cpus} done", flush=True)
            return
        time.sleep(120)


if __name__ == "__main__":
    main()
