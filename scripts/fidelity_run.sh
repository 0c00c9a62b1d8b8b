#!/usr/bin/env bash
# One-command guided-fidelity pipeline (BENCH_NOTES "NEXT ROUND" item 2):
# regenerate the 4x corpus if absent -> train the flagship config to the
# best-measured milestone (8000; fidelity wanders 3x across checkpoints at
# flat val loss, so deeper training does NOT help without re-scoring) ->
# run the (w, phi) guidance arms on ONE compiled sampling program (traced
# operands) -> paper-protocol scoring (best-of-10 NRMSE + closest-match
# baseline, src/utils.py:97-156 protocol) + CFG gain decomposition per arm.
#
# Resumable: every stage is skipped if its artifact already exists, so a
# wall-clock cut mid-train can be resumed by re-running the same command.
# Run detached with NO output pipe (a pipe buffers all progress until
# exit — CLAUDE.md lesson); stages append to their own line-flushed logs.
#
#   timeout 3500 bash scripts/fidelity_run.sh &
#
# Expected TPU budget: ~15 min train-step compile + ~35 min train (265
# ms/step x 8000) + 1 sampling compile + ~6 min/arm eval at 8 targets x
# 10 preds.
set -euo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

DATA=${1:-data_demo4x}
RUN=${2:-demo4x}
STEP=${3:-8000}
ARMS=${4:-${STEP}:5,${STEP}:3,${STEP}:2,${STEP}:1,${STEP}:5:0.7,${STEP}:5:0.5}
REPORT=${5:-quality_report_r5}

if [ ! -f "$DATA/target_responses.csv" ]; then
  echo "[fidelity_run] generating corpus $DATA (seed 0 -> identical to the round-4 corpus)"
  python -u scripts/make_demo_data.py --root "$DATA" --train 1152 \
    --val 32 --targets 8 --seed 0
fi

if [ ! -d "runs_demo/$RUN/model/step_$STEP" ]; then
  echo "[fidelity_run] training $RUN to $STEP (val-loss milestones only)"
  python -u main.py --run-name "$RUN" --config model.yaml \
    --data-root "$DATA" --runs-root runs_demo \
    --train-num-steps "$STEP" --save-and-sample-every 2000 \
    --num-samples 0 --test-batch-size 16 --no-log --skip-eval-target
fi

echo "[fidelity_run] guidance arms: $ARMS"
python -u scripts/euler_guidance_sweep.py --run "$RUN" \
  --runs-root runs_demo --data-root "$DATA" --num-preds 10 \
  --arms "$ARMS" | tee /tmp/fidelity_arms.log

# score every eval dir the sweep produced (eval_target returns/prints the
# mode dir; phi is not encoded in the dir name, so recover the arm order
# from the sweep log lines: "[sweep] step=S w=W phi=P -> DIR in Ns")
mkdir -p "$REPORT"
grep -o "\[sweep\] step=[0-9]* w=[0-9.]* phi=[0-9.]* -> [^ ]*" \
    /tmp/fidelity_arms.log | while read -r _ s w phi _ dir; do
  s=${s#step=}; w=${w#w=}; phi=${phi#phi=}
  tag="step${s}_w${w}_phi${phi}"
  echo "[fidelity_run] scoring $dir -> $REPORT/quality_${tag}.json"
  python -u scripts/eval_demo_quality.py \
    --eval-dir "$dir" \
    --targets "$DATA/target_responses.csv" \
    --frame-ranges "$DATA/lagrangian/training/frame_range_data.csv" \
    --num-preds 10 --out "$REPORT" \
    --train-curves "$DATA/lagrangian/training/stress_strain_data.csv"
  mv "$REPORT/quality.json" "$REPORT/quality_${tag}.json"
  mv "$REPORT/curves.csv" "$REPORT/curves_${tag}.csv"
  python -u scripts/cfg_gain_analysis.py "$REPORT/curves_${tag}.csv" \
    > "$REPORT/gain_${tag}.txt" || true
done
echo "[fidelity_run] complete: $REPORT"
