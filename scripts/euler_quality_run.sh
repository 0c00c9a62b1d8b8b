#!/usr/bin/env bash
# Round-4 eulerian-frame quality demonstration (VERDICT r3 ask #4): train
# the flagship config with reference_frame='eulerian' on the consistent
# eulerian synthetic corpus, then guided-eval held-out targets at the final
# checkpoint and score best-of-N NRMSE + closest-training-match through the
# EULERIAN pixel-estimation recipe (src/utils.py:341-410 eulerian branch).
#
# Usage: scripts/euler_quality_run.sh [steps] [preds] [report_dir]
set -euo pipefail
cd /root/repo

STEPS=${1:-6000}
PREDS=${2:-10}
REPORT=${3:-quality_report_r4_euler}
DATA=data_demo4x_euler
RUN=demo_euler

python -u main.py --run-name "$RUN" --config model_euler.yaml \
  --data-root "$DATA" --runs-root runs_demo \
  --train-num-steps "$STEPS" --save-and-sample-every 2000 \
  --num-samples 1 --test-batch-size 16 --no-log --skip-eval-target

before=$(ls -d "runs_demo/$RUN"/eval_target_w_5.0_* 2>/dev/null | wc -l)
python -u main.py --run-name "$RUN" --config model_euler.yaml \
  --data-root "$DATA" --runs-root runs_demo \
  --load-model-step "$STEPS" --skip-train --num-preds "$PREDS" \
  --target-labels "$DATA/target_responses.csv" --no-log

python -u scripts/eval_demo_quality.py \
  --eval-dir "runs_demo/$RUN/eval_target_w_5.0_${before}/step_${STEPS}" \
  --targets "$DATA/target_responses.csv" \
  --frame-ranges "$DATA/eulerian/training/frame_range_data.csv" \
  --ref-frame eulerian \
  --num-preds "$PREDS" --out "$REPORT" \
  --train-curves "$DATA/eulerian/training/stress_strain_data.csv" \
  --metrics "runs_demo/$RUN/metrics.jsonl"
echo "eulerian quality run complete: $REPORT"
