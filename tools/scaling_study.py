"""Two-cluster-size scaling evidence (north rule): run the identical
bench job at local[N] and local[4N] on the same input and report
throughput at both plus scaling efficiency.

efficiency(q) = (T_N / T_4N) / 4  — 1.0 is perfect linear scaling.

Writes BENCH/scaling.json and rewrites the measured section of
BENCH/BASELINE.md. Run with nothing else on the machine.

Usage: python tools/scaling_study.py [sf_dir] [N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str, cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
        check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    results = {}
    for cpus in (n, 4 * n):
        t0 = time.time()
        results[cpus] = run_bench(sf_dir, cpus)
        print(f"local[{cpus}]: total={results[cpus]['value']}s "
              f"(wall {round(time.time() - t0, 1)}s incl. startup)")

    small, big = results[n], results[4 * n]
    eff = {}
    for q in small["queries"]:
        t_n, t_4n = small["queries"][q], big["queries"][q]
        eff[q] = round((t_n / t_4n) / 4.0, 3) if t_4n > 0 else None
    total_eff = round((small["value"] / big["value"]) / 4.0, 3)
    summary = {
        "sf_dir": sf_dir,
        "n_docs": big.get("n_docs"),
        "N": n,
        "4N": 4 * n,
        "times_N": small["queries"],
        "times_4N": big["queries"],
        "docs_per_sec_N": small.get("docs_per_sec"),
        "docs_per_sec_4N": big.get("docs_per_sec"),
        "efficiency_per_query": eff,
        "efficiency_total": total_eff,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
