#!/usr/bin/env bash
# One-command guided-fidelity pipeline (BENCH_NOTES "NEXT ROUND" item 2):
# regenerate the corpus if absent -> restore the milestone from the durable
# ckpt_cache if one survives (recycle insurance, scripts/persist_demo_ckpt.py)
# -> otherwise train the flagship config to the best-measured milestone
# (8000; fidelity wanders 3x across checkpoints at flat val loss, so deeper
# training does NOT help without re-scoring) with the in-training fidelity
# probe logging a guided NRMSE at every milestone -> persist the milestone
# into ckpt_cache/ -> run the (w, phi) guidance arms on ONE compiled
# sampling program (traced operands) -> paper-protocol scoring (best-of-10
# NRMSE + closest-match baseline, src/utils.py:97-156 protocol) + CFG gain
# decomposition per arm.
#
# Resumable: corpus/restore/train/persist stages are skipped when their
# artifact exists; a wall-clock cut mid-TRAIN resumes from the latest
# milestone checkpoint; sweep arms whose quality_<tag>.json already exists
# in $REPORT are skipped (so a cut mid-sweep re-runs only unscored arms).
# Run detached with NO output pipe (a pipe buffers all progress until
# exit — CLAUDE.md lesson); stages append to their own line-flushed logs.
#
#   timeout 7000 bash scripts/fidelity_run.sh &     # cold run is ~2h:
#   ~15 min train compile + ~35 min train + ~15 min sampling compile (paid
#   at the first in-training probe) + ~10 min probe evals + ~6-11 min x 6
#   default arms at 8 targets x 10 preds. Warm resumes cost only what's left.
#
# Env knobs: DDIM_STEPS=32 DDIM_ARMS=8000:2,8000:1.5 adds a DDIM pass at
# those (step, w, phi) arms after the DDPM arms (one extra remote compile).
set -euo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

DATA=${1:-data_demo4x}
RUN=${2:-demo4x}
STEP=${3:-8000}
ARMS=${4:-${STEP}:5,${STEP}:3,${STEP}:2,${STEP}:1.5,${STEP}:1,${STEP}:5:0.7,${STEP}:5:0.5}
REPORT=${5:-quality_report_r5}
RUNS_ROOT=${RUNS_ROOT:-runs_demo}
# eulerian runs need the eulerian model config (reference_frame lives in the
# yaml, not a main.py flag): CONFIG=model_euler.yaml bash scripts/fidelity_run.sh ...
CONFIG=${CONFIG:-model.yaml}
DDIM_STEPS=${DDIM_STEPS:-}
DDIM_ARMS=${DDIM_ARMS:-}

# lagrangian and eulerian corpora carry their frame in the directory layout
if [ -d "$DATA/lagrangian" ]; then FRAME=lagrangian; else FRAME=eulerian; fi
MODEL_DIR=$RUNS_ROOT/$RUN/model
LOG=$REPORT/fidelity_arms.log
mkdir -p "$REPORT"

if [ ! -f "$DATA/target_responses.csv" ]; then
  echo "[fidelity_run] generating corpus $DATA (seed 0 -> identical to the round-4 corpus)"
  python -u scripts/make_demo_data.py --root "$DATA" --train 1152 \
    --val 32 --targets 8 --seed 0
fi

# recycle insurance: a persisted EMA in the repo beats retraining
if [ ! -d "$MODEL_DIR/step_$STEP" ] && \
   [ -f "ckpt_cache/${RUN}_step_${STEP}.msgpack" ]; then
  echo "[fidelity_run] restoring step $STEP from durable ckpt_cache"
  python -u scripts/persist_demo_ckpt.py restore \
    --run-dir "$RUNS_ROOT/$RUN" --step "$STEP"
fi

if [ ! -d "$MODEL_DIR/step_$STEP" ]; then
  RESUME=""
  if [ -d "$RUNS_ROOT/$RUN" ]; then
    # resume from the newest milestone; a run dir with a config snapshot
    # but NO milestone cannot be resumed (main.py refuses) -> start fresh
    latest=$(ls -d "$MODEL_DIR"/step_* 2>/dev/null | sed 's/.*step_//' \
             | sort -n | tail -1 || true)
    if [ -n "$latest" ]; then
      RESUME="--load-model-step $latest"
      echo "[fidelity_run] resuming $RUN from milestone $latest"
    else
      echo "[fidelity_run] wiping milestone-less stub run dir $RUNS_ROOT/$RUN"
      rm -rf "${RUNS_ROOT:?}/${RUN:?}"
    fi
  fi
  echo "[fidelity_run] training $RUN to $STEP (milestones log val loss + guided fidelity probe)"
  # shellcheck disable=SC2086
  python -u main.py --run-name "$RUN" --config "$CONFIG" \
    --data-root "$DATA" --runs-root "$RUNS_ROOT" $RESUME \
    --train-num-steps "$STEP" --save-and-sample-every 2000 \
    --num-samples 0 --test-batch-size 16 --no-log --skip-eval-target \
    --fidelity-probe "$DATA/target_responses.csv"
fi

if [ ! -f "ckpt_cache/${RUN}_step_${STEP}.msgpack" ]; then
  echo "[fidelity_run] persisting step $STEP to ckpt_cache (commit it to survive recycles)"
  python -u scripts/persist_demo_ckpt.py persist \
    --run-dir "$RUNS_ROOT/$RUN" --step "$STEP"
fi

# ---- guidance arms. Tags normalize w/phi through python float repr so the
# skip check matches the sweep's own printed values.
norm() { python -c "print(float('$1'))"; }

run_arms() {  # $1 = comma arm list, $2 = tag suffix, $3.. = extra sweep flags
  local list=$1 suffix=$2; shift 2
  local todo="" s w phi tag
  for a in ${list//,/ }; do
    IFS=: read -r s w phi <<< "$a"
    tag="step${s}_w$(norm "$w")_phi$(norm "${phi:-0}")${suffix}"
    if [ -f "$REPORT/quality_${tag}.json" ]; then
      echo "[fidelity_run] skip already-scored $tag"
    else
      todo="${todo:+$todo,}$a"
    fi
  done
  [ -z "$todo" ] && return 0
  echo "[fidelity_run] guidance arms: $todo ${*:-}"
  python -u scripts/euler_guidance_sweep.py --run "$RUN" \
    --runs-root "$RUNS_ROOT" --data-root "$DATA" --num-preds 10 \
    --arms "$todo" "$@" | tee -a "$LOG"
}

run_arms "$ARMS" ""
if [ -n "$DDIM_STEPS" ] && [ -n "$DDIM_ARMS" ]; then
  run_arms "$DDIM_ARMS" "_steps${DDIM_STEPS}" --sampling-timesteps "$DDIM_STEPS"
fi

# ---- score every eval dir the sweep log names (lines:
# "[sweep] step=S w=W phi=P [steps=N] -> DIR in Ns"); already-scored tags
# and vanished dirs are skipped, so re-runs are idempotent.
grep "^\[sweep\] step=" "$LOG" | while read -r line; do
  s=""; w=""; phi=""; st=""; dir=""; prev=""
  for tok in $line; do
    case $tok in
      step=*) s=${tok#step=};; w=*) w=${tok#w=};; phi=*) phi=${tok#phi=};;
      steps=*) st=${tok#steps=};;
    esac
    [ "$prev" = "->" ] && dir=$tok
    prev=$tok
  done
  [ -d "$dir" ] || continue
  tag="step${s}_w${w}_phi${phi}${st:+_steps$st}"
  [ -f "$REPORT/quality_${tag}.json" ] && continue
  echo "[fidelity_run] scoring $dir -> $REPORT/quality_${tag}.json"
  python -u scripts/eval_demo_quality.py \
    --eval-dir "$dir" \
    --targets "$DATA/target_responses.csv" \
    --frame-ranges "$DATA/$FRAME/training/frame_range_data.csv" \
    --ref-frame "$FRAME" \
    --num-preds 10 --out "$REPORT" \
    --train-curves "$DATA/$FRAME/training/stress_strain_data.csv"
  mv "$REPORT/quality.json" "$REPORT/quality_${tag}.json"
  mv "$REPORT/curves.csv" "$REPORT/curves_${tag}.csv"
  [ -f "$REPORT/curves.png" ] && mv "$REPORT/curves.png" "$REPORT/curves_${tag}.png"
  python -u scripts/cfg_gain_analysis.py "$REPORT/curves_${tag}.csv" \
    > "$REPORT/gain_${tag}.txt" || true
done
echo "[fidelity_run] complete: $REPORT"
