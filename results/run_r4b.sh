#!/bin/bash
# Round-4 pipeline resume after the async-ckpt donation fix.
#
# The first run_r4.sh pass crashed three trainers mid-run ("Array has
# been deleted": the async writer raced donate_argnums buffer deletion,
# fixed in ckpt/orbax_io.py::_snapshot). Surviving artifacts (gt stages
# 1-3 + their evals) are kept; this script re-runs only what broke:
#
#   gtfix — gt stage 4 (occlusion completers) + the occlusion eval
#   bf16  — stage-3a twin with --bf16-opt-state + best/final evals
#   det   — detector-2D stages 3a/3b/4 + all evals (flows survived)
#
# Usage: bash results/run_r4b.sh [gtfix|bf16|det|all]
set -uo pipefail
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache_tpu
R="runs/r4"
mkdir -p results/r4
CORPUS="--data $R/corpus.pkl --synthetic --synthetic-n 65536 --synthetic-test-n 8192 --seed 42 --test-scale auto --save-every 10"
LIFT="--bone-means data"
PHASE="${1:-all}"

clean_tmp () { find "$1" -maxdepth 1 -name '*.orbax-checkpoint-tmp*' -exec rm -rf {} +; }

phase_gtfix () {
  local M="$R/models_gt"; clean_tmp "$M"
  echo "=== [gtfix] stage 4: occlusion completers ==="
  time python -m links_tpu.cli.train_occlusion_models $CORPUS --model-dir "$M" --use-best --aug-input-noise 0.05
  echo "=== [gtfix] eval occlusion (best) ==="
  python -m links_tpu.cli.eval_h36m $CORPUS --model-dir "$M" --json --use-best --occlusion --dropout > results/r4/eval_gt_occ.json
}

phase_bf16 () {
  local M="$R/models_bf16"; clean_tmp "$M"
  rm -rf "$M/lifter_left_right" "$M/left_right_run" "$M/left_right_lifter.jsonl"
  echo "=== [bf16] stage 3a twin: --bf16-opt-state ==="
  time python -m links_tpu.cli.train_left_right_lifter $CORPUS $LIFT --model-dir "$M" --bf16-opt-state
  echo "=== [bf16] eval (best + final) ==="
  python -m links_tpu.cli.eval_h36m $CORPUS --model-dir "$M" --json --use-best > results/r4/eval_bf16_best.json
  python -m links_tpu.cli.eval_h36m $CORPUS --model-dir "$M" --json --use-final > results/r4/eval_bf16_final.json
}

phase_det () {
  local M="$R/models_det"; clean_tmp "$M"; local X="--no-gt-2d"
  rm -rf "$M/lifter_left_right" "$M/lifter_left_right_best" "$M/left_right_run" \
         "$M/lifter_legs" "$M/lifter_legs_best" "$M/lifter_torso" "$M/lifter_torso_best" \
         "$M/leg_torso_run" "$M"/left_right_lifter.jsonl "$M"/leg_torso_lifter.jsonl
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
  gtfix) phase_gtfix ;;
  bf16)  phase_bf16 ;;
  det)   phase_det ;;
  all)   phase_gtfix; phase_bf16; phase_det ;;
  *) echo "unknown phase $PHASE"; exit 2 ;;
esac
echo "=== run_r4b.sh $PHASE DONE ==="
