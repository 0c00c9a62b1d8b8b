#!/usr/bin/env python
"""Aggregate a quality report directory (quality_<tag>.json +
curves_<tag>.csv written by scripts/fidelity_run.sh) into one sorted
table: arm tag, best-of-N NRMSE, multiple over the closest-train-match
baseline, CFG gain (mean +- sd), shape correlation, and the after-ideal-
gain floor. This is the round-5 (w, phi) sweep readout — the decision
table for which arm (and which sampler family, DDPM-256 vs DDIM-<k>)
ships as the guided-eval default.

Usage: python scripts/quality_summary.py quality_report_r5 [--markdown]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from cfg_gain_analysis import analyze  # noqa: E402


def summarize(report_dir: Path) -> list[dict]:
    rows = []
    for qf in sorted(report_dir.glob("quality_*.json")):
        tag = qf.stem[len("quality_"):]
        q = json.loads(qf.read_text())
        row = {
            "tag": tag,
            "best_of_N": q.get("best_of_N_nrmse_mean"),
            "all_preds": q.get("all_preds_nrmse_mean"),
            "rel_closest": q.get("full_error", {}).get(
                "rel_to_closest_match_mean"),
        }
        cf = report_dir / f"curves_{tag}.csv"
        if cf.exists():
            g = analyze(str(cf))
            row.update(gain=g["gain_mean"], gain_sd=g["gain_sd"],
                       corr_min=g["shape_corr_min"],
                       after_gain=g["best_of_N_after_ideal_gain"])
        rows.append(row)
    rows.sort(key=lambda r: (r["best_of_N"] is None,
                             r["best_of_N"] or 0.0))
    return rows


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("report_dir")
    p.add_argument("--markdown", action="store_true",
                   help="emit a markdown table (for BENCH_NOTES)")
    args = p.parse_args()
    rows = summarize(Path(args.report_dir))
    if not rows:
        print(f"no quality_*.json in {args.report_dir}")
        return

    def f(v, spec=".3f"):
        return format(v, spec) if v is not None else "-"

    hdr = ["arm", "best-of-N", "xclosest", "gain", "corr>=", "after-gain"]
    lines = [[r["tag"], f(r["best_of_N"]), f(r["rel_closest"], ".1f"),
              (f(r.get("gain")) + "+-" + f(r.get("gain_sd"))
               if r.get("gain") is not None else "-"),
              f(r.get("corr_min")), f(r.get("after_gain"), ".4f")]
             for r in rows]
    if args.markdown:
        print("| " + " | ".join(hdr) + " |")
        print("|" + "---|" * len(hdr))
        for ln in lines:
            print("| " + " | ".join(ln) + " |")
    else:
        w = [max(len(h), *(len(ln[i]) for ln in lines))
             for i, h in enumerate(hdr)]
        print("  ".join(h.ljust(w[i]) for i, h in enumerate(hdr)))
        for ln in lines:
            print("  ".join(c.ljust(w[i]) for i, c in enumerate(ln)))


if __name__ == "__main__":
    main()
