#!/bin/bash
# Round-4 converged studies (VERDICT r3 next #1/#2/#3/#6), all at the
# ROUND-2 scale (327,680 train poses / 16,384 test — the 61-mm basin):
#
#   phase gt   — full gt-2D pipeline. Stage 3a logs the new val_tilt
#                flip alarm per epoch (selection study input) and prints
#                the EpochTimer wall-clock breakdown (delivered-vs-benched
#                accounting). Evals with --use-best.
#   phase bf16 — stage-3a twin of the gt run with --bf16-opt-state
#                (same seed, same frozen flows): converged end-metric
#                parity check for the +11.5% throughput knob.
#   phase det  — full detector-2D pipeline (--no-gt-2d) + the standard /
#                occlusion / --from-detections evals (incl. the new
#                completer composition for cross-side dropout).
#
# Usage: bash results/run_r4.sh [gt|bf16|det|all]
set -uo pipefail
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache_tpu
R="runs/r4"
mkdir -p "$R" results/r4
CORPUS="--data $R/corpus.pkl --synthetic --synthetic-n 65536 --synthetic-test-n 8192 --seed 42 --test-scale auto --save-every 10"
LIFT="--bone-means data"
PHASE="${1:-all}"

phase_gt () {
  local M="$R/models_gt"; mkdir -p "$M"
  if [ ! -d "$M/flow_torso" ]; then
    echo "=== [gt] stage 1: full-pose flow ==="
    time python -m links_tpu.cli.train_full_pose_norm_flow $CORPUS --model-dir "$M" --clip-grad 10.0
    echo "=== [gt] stage 2: part flows ==="
    time python -m links_tpu.cli.train_part_norm_flows $CORPUS --model-dir "$M" --clip-grad 10.0
  fi
  echo "=== [gt] stage 3a: left/right lifters (f32 opt state; timer) ==="
  time python -m links_tpu.cli.train_left_right_lifter $CORPUS $LIFT --model-dir "$M"
  echo "=== [gt] stage 3b: leg/torso lifters ==="
  time python -m links_tpu.cli.train_leg_torso_lifter $CORPUS $LIFT --model-dir "$M"
  echo "=== [gt] stage 4: occlusion completers ==="
  time python -m links_tpu.cli.train_occlusion_models $CORPUS --model-dir "$M" --use-best --aug-input-noise 0.05
  echo "=== [gt] eval (best) ==="
  python -m links_tpu.cli.eval_h36m $CORPUS --model-dir "$M" --json --use-best > results/r4/eval_gt_best.json
  python -m links_tpu.cli.eval_h36m $CORPUS --model-dir "$M" --mode leg_torso --json --use-best > results/r4/eval_gt_lt_best.json
  python -m links_tpu.cli.eval_h36m $CORPUS --model-dir "$M" --json --use-best --occlusion --dropout > results/r4/eval_gt_occ.json
}

phase_bf16 () {
  local M="$R/models_bf16"; mkdir -p "$M"
  # twin shares the frozen flows — copy, then train 3a with bf16 moments
  for a in full_flow flow_left flow_right flow_legs flow_torso; do
    [ -d "$M/$a" ] || cp -r "$R/models_gt/$a" "$M/$a"
  done
  echo "=== [bf16] stage 3a twin: --bf16-opt-state ==="
  time python -m links_tpu.cli.train_left_right_lifter $CORPUS $LIFT --model-dir "$M" --bf16-opt-state
  echo "=== [bf16] eval (best + final) ==="
  python -m links_tpu.cli.eval_h36m $CORPUS --model-dir "$M" --json --use-best > results/r4/eval_bf16_best.json
  python -m links_tpu.cli.eval_h36m $CORPUS --model-dir "$M" --json --use-final > results/r4/eval_bf16_final.json
  python -m links_tpu.cli.eval_h36m $CORPUS --model-dir "$R/models_gt" --json --use-final > results/r4/eval_gt_final.json
}

phase_det () {
  local M="$R/models_det"; mkdir -p "$M"; local X="--no-gt-2d"
  if [ ! -d "$M/flow_torso" ]; then
    echo "=== [det] stage 1: full-pose flow ==="
    time python -m links_tpu.cli.train_full_pose_norm_flow $CORPUS $X --model-dir "$M" --clip-grad 10.0
    echo "=== [det] stage 2: part flows ==="
    time python -m links_tpu.cli.train_part_norm_flows $CORPUS $X --model-dir "$M" --clip-grad 10.0
  fi
  echo "=== [det] stage 3a: left/right lifters ==="
  time python -m links_tpu.cli.train_left_right_lifter $CORPUS $X $LIFT --model-dir "$M"
  echo "=== [det] stage 3b: leg/torso lifters ==="
  time python -m links_tpu.cli.train_leg_torso_lifter $CORPUS $X $LIFT --model-dir "$M"
  echo "=== [det] stage 4: occlusion completers ==="
  time python -m links_tpu.cli.train_occlusion_models $CORPUS $X --model-dir "$M" --use-best --aug-input-noise 0.05
  echo "=== [det] eval (best) ==="
  python -m links_tpu.cli.eval_h36m $CORPUS $X --model-dir "$M" --json --use-best > results/r4/eval_det_best.json
  python -m links_tpu.cli.eval_h36m $CORPUS $X --model-dir "$M" --mode leg_torso --json --use-best > results/r4/eval_det_lt_best.json
  python -m links_tpu.cli.eval_h36m $CORPUS $X --model-dir "$M" --json --use-best --occlusion --dropout > results/r4/eval_det_occ.json
  echo "=== [det] eval --from-detections (composition) ==="
  python -m links_tpu.cli.eval_h36m $CORPUS $X --model-dir "$M" --json --use-best --from-detections > results/r4/eval_det_from_detections.json
}

case "$PHASE" in
  gt)   phase_gt ;;
  bf16) phase_bf16 ;;
  det)  phase_det ;;
  all)  phase_gt; phase_bf16; phase_det ;;
  *) echo "unknown phase $PHASE"; exit 2 ;;
esac
echo "=== run_r4.sh $PHASE DONE ==="
