#!/usr/bin/env bash
# Round-3 quality-demonstration driver (4x corpus follow-up): train the
# flagship config on a physically-consistent synthetic corpus, guided-eval
# held-out targets at several milestone checkpoints, and score
# conditioning-fidelity NRMSE per milestone (the reference's best-of-N
# protocol with the FEM loop replaced by the exact pixel estimate).
#
# Usage: scripts/quality_run.sh <data_root> <run_name> <train_steps>
#        "<milestone steps ...>" [report_dir]
set -euo pipefail
cd /root/repo

DATA=${1:-data_demo4x}
RUN=${2:-demo4x}
STEPS=${3:-16000}
MILESTONES=${4:-"8000 12000 16000"}
REPORT=${5:-quality_report_r3_4x}

python -u main.py --run-name "$RUN" --config model.yaml \
  --data-root "$DATA" --runs-root runs_demo \
  --train-num-steps "$STEPS" --save-and-sample-every 2000 \
  --num-samples 1 --test-batch-size 16 --no-log --skip-eval-target

i=0
for M in $MILESTONES; do
  python -u main.py --run-name "$RUN" --config model.yaml \
    --data-root "$DATA" --runs-root runs_demo \
    --load-model-step "$M" --skip-train --num-preds 4 \
    --target-labels "$DATA/target_responses.csv" --no-log
  python -u scripts/eval_demo_quality.py \
    --eval-dir "runs_demo/$RUN/eval_target_w_5.0_${i}/step_${M}" \
    --targets "$DATA/target_responses.csv" \
    --frame-ranges "$DATA/lagrangian/training/frame_range_data.csv" \
    --num-preds 4 --out "$REPORT" \
    --metrics "runs_demo/$RUN/metrics.jsonl"
  mv "$REPORT/quality.json" "$REPORT/quality_step_${M}.json" || true
  i=$((i + 1))
done
echo "quality run complete: $REPORT"
