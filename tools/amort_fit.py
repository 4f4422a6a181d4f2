"""Fit the fixed-overhead scaling model to every measured (input-size,
leg-time) point and emit BENCH/amortization_fit.json.

Model (see BENCH/BASELINE.md "fixed-overhead model"):

    T_4(x)  = c + W*x          T_16(x) = c + W*x/s
    eff(x)  = T_4 / (4*T_16)   ->  s/4 as x -> inf

x = input scale relative to the job's base sf, s = the measured
hardware-ceiling speedup for the job's regime (CPU 3.68, DRAM 3.34).
c and W are fitted jointly over BOTH legs of every point by ordinary
least squares (design rows [1, x] and [1, x/s]), so the fit is
over-determined once >=2 input sizes exist: per-point residuals then
VALIDATE the model rather than merely parameterize it.

Inputs: BENCH/scaling.json (the merged-minima sf4/sf1 point) plus every
BENCH/amort_*.json sweep point. Output: per-job c, W, residuals, the
implied asymptotic efficiency, and eff at representative scales.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (job, base sf, ceiling speedup 4->16, regime)
JOBS = {
    "flagship": (4.0, 3.68, "CPU"),
    "text_extract": (4.0, 3.34, "DRAM"),
    "minhash_assign": (1.0, 3.68, "CPU"),
}


def collect_points() -> dict[str, list[tuple[float, float, float, str]]]:
    """job -> [(scale_x, T4, T16, source), ...]"""
    pts: dict[str, list] = {j: [] for j in JOBS}
    files = [os.path.join(REPO, "BENCH", "scaling.json")] + sorted(
        glob.glob(os.path.join(REPO, "BENCH", "amort_*.json"))
    )
    for path in files:
        if path.endswith("amortization_fit.json"):
            continue
        try:
            d = json.load(open(path))
        except Exception:
            continue
        if "times_N" not in d:
            continue
        for job in d["times_N"]:
            if job not in JOBS:
                continue
            base = JOBS[job][0]
            # pre-knob artifacts (merged scaling.json) lack sf_minhash;
            # the study always ran minhash at sf1 before the knob existed
            sf = d.get("sf_minhash", 1.0) if job == "minhash_assign" else d.get("sf")
            pts[job].append(
                (float(sf) / base, d["times_N"][job], d["times_4N"][job],
                 os.path.basename(path))
            )
    return pts


def fit_job(points: list) -> dict:
    s = points["s"]
    # Fit over the quiet-window sweep points only: the merged
    # scaling.json minima were collected across many noisier windows
    # (min-merge converges from above), so they sit systematically high
    # vs the same-ambient sweep; they are listed per_point with
    # in_fit=False so the stale-noise residual stays visible.
    rows, ys = [], []
    for x, t4, t16, src in points["pts"]:
        if src == "scaling.json":
            continue
        rows += [[1.0, x], [1.0, x / s]]
        ys += [t4, t16]
    A, y = np.array(rows), np.array(ys)
    (c, w), *_ = np.linalg.lstsq(A, y, rcond=None)
    per_point = []
    for x, t4, t16, src in sorted(points["pts"]):
        p4, p16 = c + w * x, c + w * x / s
        per_point.append({
            "scale_x": x, "source": src, "in_fit": src != "scaling.json",
            "T4": t4, "T16": t16,
            "pred_T4": round(p4, 2), "pred_T16": round(p16, 2),
            "eff": round(t4 / (4 * t16), 3),
            "pred_eff": round(p4 / (4 * p16), 3),
        })
    def eff_at(x):
        return round((c + w * x) / (4 * (c + w * x / s)), 3)
    return {
        "c_fixed_s": round(float(c), 2),
        "W_per_base_sf_s": round(float(w), 2),
        "ceiling_speedup": s,
        "eff_asymptote": round(s / 4, 3),
        "points": per_point,
        "eff_at_scale": {"x=1": eff_at(1), "x=4": eff_at(4), "x=16": eff_at(16),
                         "x=256": eff_at(256), "x=inf": round(s / 4, 3)},
    }


def main() -> None:
    raw = collect_points()
    out = {}
    for job, (base, s, regime) in JOBS.items():
        if len({p[0] for p in raw[job]}) < 2:
            out[job] = {"skipped": f"only {len(raw[job])} input size(s) measured"}
            continue
        out[job] = {"base_sf": base, "regime": regime,
                    **fit_job({"s": s, "pts": raw[job]})}
    path = os.path.join(REPO, "BENCH", "amortization_fit.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
