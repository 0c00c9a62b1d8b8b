#!/usr/bin/env python
"""Decompose guided-sampling NRMSE into magnitude GAIN x residual SHAPE
error, from a quality report's curves.csv (written by
scripts/eval_demo_quality.py).

Round-4 finding that motivated the guidance-scale sweep: at CFG w=5 both
frame variants produce predictions whose pixel-estimated stress-strain
curves track the target SHAPE almost perfectly (corr >= 0.99) but
overshoot magnitude by a near-constant multiplicative gain — 1.43x
(lagrangian demo4x step 8000, sd 0.16) and 1.97x (eulerian demo_euler2
step 6000, sd 0.08). Under the paper's NRMSE = ||p - t|| / ||t|| a pure
gain g scores |g - 1|, so the gain term dominates everything else: with
the per-prediction least-squares gain divided out, best-of-N NRMSE falls
0.271 -> 0.027 (lagrangian) and 0.897 -> 0.040 (eulerian). The
guidance-scale/cfg-rescale sweep (scripts/euler_guidance_sweep.py) probes
which (w, phi) brings the raw gain to ~1 WITHOUT post-hoc rescaling
(the protocol forbids correcting predictions).

Usage: python scripts/cfg_gain_analysis.py quality_report_r4/curves.csv
"""

import sys

import numpy as np


def analyze(curves_csv: str):
    d = np.genfromtxt(curves_csv, delimiter=",", skip_header=1)
    best_raw, best_deg, gains, corrs = [], [], [], []
    for t in sorted(set(d[:, 0])):
        rows = d[d[:, 0] == t]
        tgt = rows[rows[:, 1] == -1][0, 2:]
        preds = rows[rows[:, 1] >= 0][:, 2:]
        raw = [float(np.sqrt(((p - tgt) ** 2).sum() / (tgt ** 2).sum()))
               for p in preds]
        deg = []
        for p in preds:
            a = float(p @ tgt) / float(p @ p)   # LS gain correction
            gains.append(1.0 / a)               # model's magnitude gain
            deg.append(float(np.sqrt(((a * p - tgt) ** 2).sum()
                                     / (tgt ** 2).sum())))
            corrs.append(float(np.corrcoef(tgt, p)[0, 1]))
        best_raw.append(min(raw))
        best_deg.append(min(deg))
    return {
        "best_of_N_nrmse": float(np.mean(best_raw)),
        "best_of_N_after_ideal_gain": float(np.mean(best_deg)),
        "gain_mean": float(np.mean(gains)),
        "gain_sd": float(np.std(gains)),
        "shape_corr_mean": float(np.mean(corrs)),
        "shape_corr_min": float(np.min(corrs)),
    }


if __name__ == "__main__":
    for f in sys.argv[1:]:
        r = analyze(f)
        print(f"{f}: gain {r['gain_mean']:.3f}+-{r['gain_sd']:.3f} "
              f"corr>={r['shape_corr_min']:.3f} "
              f"best-of-N {r['best_of_N_nrmse']:.3f} "
              f"-> {r['best_of_N_after_ideal_gain']:.4f} after ideal gain")
