#!/usr/bin/env bash
# Round-4 quality drivers.
#
# 1) Paper-protocol quality run (VERDICT r3 ask #4): 10 preds/target
#    (reference README.md:61), best-of-N NRMSE via compute_full_error with
#    the closest-training-match retrieval baseline (src/utils.py:97-156).
# 2) DDIM step-count trade curve (ask #6): sampling_timesteps 128/64/32
#    (DDIM, vddp.py:909-911) vs the DDPM 256 protocol run, same checkpoint,
#    same targets, quality scored identically.
#
# Usage: scripts/ddim_trade_curve.sh <data_root> <run_name> <ckpt_step>
#        [num_preds] [report_dir] [frame] ["steps list"]
set -euo pipefail
cd /root/repo

DATA=${1:-data_demo4x}
RUN=${2:-demo4x}
CKPT=${3:-24000}
PREDS=${4:-10}
REPORT=${5:-quality_report_r4}
FRAME=${6:-lagrangian}
STEPSLIST=${7:-"256 128 64 32"}

for S in $STEPSLIST; do
  before=$(ls -d "runs_demo/$RUN"/eval_target_w_5.0_* 2>/dev/null | wc -l)
  python -u main.py --run-name "$RUN" --config model.yaml \
    --data-root "$DATA" --runs-root runs_demo \
    --load-model-step "$CKPT" --skip-train --num-preds "$PREDS" \
    --sampling-timesteps "$S" \
    --target-labels "$DATA/target_responses.csv" --no-log
  python -u scripts/eval_demo_quality.py \
    --eval-dir "runs_demo/$RUN/eval_target_w_5.0_${before}/step_${CKPT}" \
    --targets "$DATA/target_responses.csv" \
    --frame-ranges "$DATA/$FRAME/training/frame_range_data.csv" \
    --ref-frame "$FRAME" \
    --num-preds "$PREDS" --out "$REPORT" \
    --train-curves "$DATA/$FRAME/training/stress_strain_data.csv" \
    --metrics "runs_demo/$RUN/metrics.jsonl"
  mv "$REPORT/quality.json" "$REPORT/quality_steps_${S}.json"
  echo "=== steps $S done -> $REPORT/quality_steps_${S}.json"
done
echo "trade curve complete: $REPORT"
