"""Merge multiple scaling_study runs (separate time windows) by taking
the per-(job, leg) MINIMUM — the documented shared-host protocol: the
min over interleaved trials across windows converges to the unloaded
time, because co-tenant bursts only ever ADD wall-clock.

Usage: python tools/merge_scaling.py run1.json run2.json ... > merged
(also rewrites BENCH/scaling.json with the merged summary)
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    runs = [json.load(open(p)) for p in sys.argv[1:]]
    assert runs, "pass at least one scaling.json"
    base = runs[0]
    for r in runs[1:]:
        assert r["N"] == base["N"] and r["4N"] == base["4N"] and r["sf"] == base["sf"]
        for leg in ("times_N", "times_4N"):
            for q, v in r[leg].items():
                base[leg][q] = min(base[leg].get(q, v), v)
    base["trials"] = sum(r["trials"] for r in runs)
    base["merged_windows"] = len(runs)
    eff = {
        q: round((base["times_N"][q] / base["times_4N"][q]) / 4.0, 3)
        for q in base["times_N"]
    }
    base["efficiency_per_query"] = eff
    t_n = sum(base["times_N"].values())
    t_4n = sum(base["times_4N"].values())
    base["efficiency_total"] = round((t_n / t_4n) / 4.0, 3)
    base["docs_per_sec_flagship_N"] = round(base["n_docs"] / base["times_N"]["flagship"], 1)
    base["docs_per_sec_flagship_4N"] = round(base["n_docs"] / base["times_4N"]["flagship"], 1)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as fh:
        json.dump(base, fh, indent=2)
    print(json.dumps(base, indent=2))


if __name__ == "__main__":
    main()
