"""Fit the fixed-overhead scaling model to every measured (input-size,
leg-time) point and emit BENCH/amortization_fit.json.

Model (see BENCH/BASELINE.md "fixed-overhead model"):

    T_4(x)  = c + W*x          T_16(x) = c + W*x/s
    eff(x)  = T_4 / (4*T_16)   ->  s/4 as x -> inf

x = input scale relative to the job's base sf; s = the job's saturation
speedup 4->16 threads. s is FITTED per job (grid search over s, weighted
least squares for c and W at each candidate, relative residuals so the
3 s and 118 s points weigh equally), not hardcoded: each job is its own
blend of CPU and DRAM work, so no single microbenchmark ratio is its
ceiling. The fitted s is instead REPORTED NEXT TO the two committed
hardware calibrations (cpu_calibration.json int-loop 4->16 ratio;
membw_calibration.json DRAM-triad 4->16 ratio) so the reader can see
which resource the job's saturation tracks — e.g. minhash_assign's
fitted s landing on the DRAM-triad ratio is the quantitative form of
"bandwidth-pinned".

c and W are fitted jointly over BOTH legs of every point, so the fit is
over-determined once >=2 input sizes exist: per-point residuals then
VALIDATE the model rather than merely parameterize it.

Inputs: BENCH/scaling.json (the merged-minima sf4/sf1 point) plus every
BENCH/amort_*.json sweep point. Output: per-job c, W, fitted s,
residuals, the implied asymptotic efficiency, and eff at representative
scales.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# job -> base sf (the sweep's x=1 input size)
JOBS = {
    "flagship": 4.0,
    "text_extract": 4.0,
    "minhash_assign": 1.0,
}


def calibration_ratios() -> dict:
    """The committed quiet-host 4->16 hardware ratios, for comparison
    against each job's fitted saturation speedup."""
    out = {}
    try:
        d = json.load(open(os.path.join(REPO, "BENCH", "cpu_calibration.json")))
        out["cpu_int_loop_4_to_16"] = d["hardware_4x_ratios"]["4_to_16"]
    except Exception:
        pass
    try:
        d = json.load(open(os.path.join(REPO, "BENCH", "membw_calibration.json")))
        out["dram_triad_4_to_16"] = d["bw_4x_ratios"]["4_to_16"]
    except Exception:
        pass
    return out


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
            base = JOBS[job]
            # pre-knob artifacts (merged scaling.json) lack sf_minhash;
            # the study always ran minhash at sf1 before the knob existed
            sf = d.get("sf_minhash", 1.0) if job == "minhash_assign" else d.get("sf")
            pts[job].append(
                (float(sf) / base, d["times_N"][job], d["times_4N"][job],
                 os.path.basename(path))
            )
    return pts


def _wls(pts: list, s: float) -> tuple[float, float, float]:
    """Weighted LS for (c, W) at fixed s; returns (c, W, relative SSE).

    Rows are scaled by 1/t so the residual is (pred - t)/t: without the
    weighting the 100+ s sf16 legs would dominate the 3 s sf0.4 legs by
    ~1000x in squared error and the small-x fixed overhead c would be
    unidentified.
    """
    rows, ys = [], []
    for x, t4, t16, _src in pts:
        rows += [[1.0 / t4, x / t4], [1.0 / t16, (x / s) / t16]]
        ys += [1.0, 1.0]
    A, y = np.array(rows), np.array(ys)
    (c, w), *_ = np.linalg.lstsq(A, y, rcond=None)
    sse = float(np.sum((A @ np.array([c, w]) - y) ** 2))
    return float(c), float(w), sse


def fit_job(points: list) -> dict:
    # Fit over the quiet-window sweep points only: the merged
    # scaling.json minima were collected across many noisier windows
    # (min-merge converges from above), so they sit systematically high
    # vs the same-ambient sweep; they are listed per_point with
    # in_fit=False so the stale-noise residual stays visible.
    fit_pts = [p for p in points if p[3] != "scaling.json"]
    best = None
    for s in np.arange(1.5, 4.0001, 0.005):
        c, w, sse = _wls(fit_pts, float(s))
        if best is None or sse < best[3]:
            best = (float(s), c, w, sse)
    s, c, w, _sse = best
    per_point = []
    for x, t4, t16, src in sorted(points):
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
        "c_fixed_s": round(c, 2),
        "W_per_base_sf_s": round(w, 2),
        "saturation_speedup_fitted": round(s, 3),
        # s at the 4.0 grid bound means the data never saw this job
        # saturate (measured speedup still rising at the largest input);
        # the asymptote is then a lower-bound statement, not a fit
        "s_at_grid_bound": bool(s >= 3.9999),
        "eff_asymptote": round(s / 4, 3),
        "points": per_point,
        "eff_at_scale": {"x=1": eff_at(1), "x=4": eff_at(4), "x=16": eff_at(16),
                         "x=256": eff_at(256), "x=inf": round(s / 4, 3)},
    }


def main() -> None:
    raw = collect_points()
    out = {"hardware_4_to_16_ratios": calibration_ratios(),
           "s_source": "fitted per job (grid search + relative-residual WLS)"}
    for job, base in JOBS.items():
        if len({p[0] for p in raw[job]}) < 2:
            out[job] = {"skipped": f"only {len(raw[job])} input size(s) measured"}
            continue
        out[job] = {"base_sf": base, **fit_job(raw[job])}
    path = os.path.join(REPO, "BENCH", "amortization_fit.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
