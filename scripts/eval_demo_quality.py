#!/usr/bin/env python
"""Quantify conditioning fidelity of a trained run (the round-3 quality
demonstration): pixel-estimate the stress-strain curve of every guided
sample in an eval_target output directory and report per-target best-of-N
NRMSE against the target curves — the reference's evaluation protocol
(vddp.py:1674-1753 + src/utils.py:94-144) with the FEM loop replaced by the
pixel estimate (exact on the physically-consistent synthetic corpus, see
tests/test_consistent_dataset.py).

Usage:
  python scripts/eval_demo_quality.py \
      --eval-dir runs_demo/demo_r3/eval_target_w_5.0_0/step_6000 \
      --targets data_demo/target_responses.csv \
      --frame-ranges data_demo/lagrangian/training/frame_range_data.csv \
      --num-preds 4 --out quality_report
"""

import argparse
import json
from pathlib import Path

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--eval-dir", required=True)
    p.add_argument("--targets", required=True)
    p.add_argument("--frame-ranges", required=True)
    p.add_argument("--num-preds", type=int, default=1)
    p.add_argument("--num-frames", type=int, default=11)
    p.add_argument("--ref-frame", default="lagrangian",
                   choices=["lagrangian", "eulerian"])
    p.add_argument("--out", default="quality_report")
    p.add_argument("--train-curves", default=None,
                   help="stress_strain_data.csv of the TRAINING corpus: "
                        "adds the closest-training-match baseline of the "
                        "paper protocol (src/utils.py:97-156)")
    p.add_argument("--metrics", default=None,
                   help="metrics.jsonl of the training run: adds the "
                        "training/validation loss-curve artifact")
    args = p.parse_args()

    from videometamaterials_tpu.data.dataset import interpolate_labels
    from videometamaterials_tpu.postproc.metrics import (
        compute_NRMSE,
        compute_full_error,
    )
    from videometamaterials_tpu.postproc.visualization import (
        estimate_stress_strain,
        load_cell_fields,
        strain_schedule,
    )

    eval_dir = Path(args.eval_dir)
    gifs = str(eval_dir / "gifs") + "/"
    targets51 = np.genfromtxt(args.targets, delimiter=",")
    if targets51.ndim == 1:
        targets51 = targets51[None]
    targets = interpolate_labels(targets51, args.num_frames)
    n_targets = len(targets)

    per_target = []
    curves = {}
    for row in range(n_targets):
        errs = []
        for col in range(args.num_preds):
            fields = load_cell_fields(gifs, args.frame_ranges, row, col,
                                      ref_frame=args.ref_frame)
            _, est = estimate_stress_strain(fields["s22"], args.ref_frame)
            nrmse = compute_NRMSE(targets[row], est)
            errs.append(nrmse)
            curves[(row, col)] = est
        best = int(np.argmin(errs))
        per_target.append({"target": row, "errs": errs,
                           "best_nrmse": float(errs[best]),
                           "best_pred": best})

    best = np.array([t["best_nrmse"] for t in per_target])
    all_errs = np.array([e for t in per_target for e in t["errs"]])
    report = {
        "n_targets": n_targets, "num_preds": args.num_preds,
        "ref_frame": args.ref_frame,
        "best_of_N_nrmse_mean": float(best.mean()),
        "best_of_N_nrmse_median": float(np.median(best)),
        "best_of_N_nrmse_max": float(best.max()),
        "all_preds_nrmse_mean": float(all_errs.mean()),
        "per_target": per_target,
    }

    # the full paper protocol (src/utils.py:97-144) through the SAME code
    # the FEM loop uses: rows grouped [target, pred_1..pred_N] per target,
    # divergence cut, best-of-N, and — with --train-curves — the
    # closest-TRAINING-match retrieval baseline and the best relative gap
    groups = []
    for r in range(n_targets):
        groups.append(targets[r])
        for c in range(args.num_preds):
            groups.append(curves[(r, c)])
    data = np.stack(groups)
    if args.train_curves:
        train51 = np.genfromtxt(args.train_curves, delimiter=",")
        full_data = interpolate_labels(train51, args.num_frames)
        (mean_all, mean_best, min_idx, err_match,
         best_rel) = compute_full_error(data, n_targets, closest_match=True,
                                        full_data=full_data)
        rel = (np.array([t["best_nrmse"] for t in per_target])
               - err_match) / err_match
        report["full_error"] = {
            "mean_all_preds": float(mean_all),
            "mean_best_of_N": float(mean_best),
            "best_pred_idx": np.asarray(min_idx).tolist(),
            "closest_train_match_nrmse": err_match.tolist(),
            "closest_train_match_nrmse_mean": float(err_match.mean()),
            "rel_to_closest_match": rel.tolist(),
            "rel_to_closest_match_mean": float(rel.mean()),
            "rel_to_closest_match_best": float(best_rel),
        }
    else:
        mean_all, mean_best, min_idx = compute_full_error(data, n_targets)
        report["full_error"] = {"mean_all_preds": float(mean_all),
                                "mean_best_of_N": float(mean_best),
                                "best_pred_idx": np.asarray(min_idx).tolist()}
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    (out / "quality.json").write_text(json.dumps(report, indent=2))

    # target-vs-generated curve artifact (CSV + plot)
    strains = strain_schedule(args.num_frames)
    rows = [np.concatenate([[r, -1], targets[r]]) for r in range(n_targets)]
    for (r, c), est in sorted(curves.items()):
        rows.append(np.concatenate([[r, c], est]))
    np.savetxt(out / "curves.csv", np.stack(rows), delimiter=",",
               header="target,pred(-1=target)," +
               ",".join(f"s{s:.3f}" for s in strains), comments="")
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        ncols = min(4, n_targets)
        nrows = int(np.ceil(n_targets / ncols))
        fig, axes = plt.subplots(nrows, ncols,
                                 figsize=(3.2 * ncols, 2.6 * nrows),
                                 squeeze=False)
        for r in range(n_targets):
            ax = axes[r // ncols][r % ncols]
            for c in range(args.num_preds):
                ax.plot(strains, curves[(r, c)], color="0.7", lw=1)
            ax.plot(strains, curves[(r, per_target[r]["best_pred"])],
                    color="tab:blue", lw=1.5, label="best pred")
            ax.plot(strains, targets[r], "k--", lw=1.5, label="target")
            ax.set_title(f"target {r}: NRMSE "
                         f"{per_target[r]['best_nrmse']:.3f}", fontsize=9)
            if r == 0:
                ax.legend(fontsize=7)
        for k in range(n_targets, nrows * ncols):
            axes[k // ncols][k % ncols].axis("off")
        fig.suptitle("guided generation: pixel-estimated stress-strain vs "
                     "target", fontsize=11)
        fig.tight_layout()
        fig.savefig(out / "curves.png", dpi=130)
    except Exception as e:  # noqa: BLE001
        print(f"plot skipped: {e!r}")

    if args.metrics:
        train_pts, val_pts = [], []
        for ln in Path(args.metrics).read_text().splitlines():
            rec = json.loads(ln)
            if "training loss" in rec:
                train_pts.append((rec["step"], rec["training loss"]))
            if "validation loss" in rec:
                val_pts.append((rec["step"], rec["validation loss"]))
        np.savetxt(out / "loss_curve.csv",
                   np.asarray(train_pts), delimiter=",",
                   header="step,training_loss", comments="")
        np.savetxt(out / "val_loss_curve.csv",
                   np.asarray(val_pts), delimiter=",",
                   header="step,validation_loss", comments="")
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            t = np.asarray(train_pts)
            v = np.asarray(val_pts)
            fig, ax = plt.subplots(figsize=(6, 3.5))
            # smoothed training loss (window mean) over the raw cloud
            w = max(1, len(t) // 200)
            smooth = np.convolve(t[:, 1], np.ones(w) / w, mode="valid")
            ax.plot(t[:, 0], t[:, 1], color="0.85", lw=0.5)
            ax.plot(t[w - 1:, 0], smooth, color="tab:blue",
                    label="training loss (smoothed)")
            if len(v):
                ax.plot(v[:, 0], v[:, 1], "o-", color="tab:orange",
                        label="validation loss")
            ax.set_xlabel("step")
            ax.set_ylabel("L1 loss")
            ax.set_yscale("log")
            ax.legend(fontsize=8)
            fig.tight_layout()
            fig.savefig(out / "loss_curve.png", dpi=130)
        except Exception as e:  # noqa: BLE001
            print(f"loss plot skipped: {e!r}")

    print(json.dumps({k: v for k, v in report.items()
                      if k != "per_target"}, indent=2))


if __name__ == "__main__":
    main()
