#!/bin/bash
# Round-3 study: gt-2D control vs detector-2D (VERDICT r2 next #2), the
# stage-4 anti-overfitting matrix (next #7), and the unsupervised-selection
# curves (next #8, logged automatically as val_nll/val_unsup_loss).
#
# One corpus file serves both runs: the pickle carries poses_2d (GT) AND
# poses_2d_pred (simulated detector: per-joint noise, outliers,
# confidence-correlated dropout at ~50% complete frames — data/synthetic.py).
# The detector leg trains with --no-gt-2d (complete detections only) and
# evaluates BOTH the standard protocol and --from-detections (occlusion
# recovery on the genuinely missing keypoints).
set -uo pipefail
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache_tpu
R="runs/r3"
mkdir -p "$R/models_gt" "$R/models_det" results/r3
# --save-every 10: per-epoch orbax writes of the ~29M-param train state
# dominate wall clock on the tunneled chip (the best-tracker still
# checkpoints improvements whenever validation runs)
CORPUS="--data $R/corpus.pkl --synthetic --synthetic-n 16384 --synthetic-test-n 4096 --seed 42 --test-scale auto --save-every 10"
LIFT="--bone-means data"

run_leg () {  # $1 = gt|det, $2 = extra flags
  local M="$R/models_$1" X="$2"
  if [ ! -d "$R/models_$1/flow_torso" ]; then
  echo "=== [$1] stage 1: full-pose flow ==="
  time python -m links_tpu.cli.train_full_pose_norm_flow $CORPUS $X --model-dir "$M" --clip-grad 10.0
  echo "=== [$1] stage 2: part flows ==="
  time python -m links_tpu.cli.train_part_norm_flows $CORPUS $X --model-dir "$M" --clip-grad 10.0
  fi
  echo "=== [$1] stage 3a: left/right lifters ==="
  time python -m links_tpu.cli.train_left_right_lifter $CORPUS $X $LIFT --model-dir "$M"
  echo "=== [$1] stage 3b: leg/torso lifters ==="
  time python -m links_tpu.cli.train_leg_torso_lifter $CORPUS $X $LIFT --model-dir "$M"
  echo "=== [$1] stage 4: occlusion completers ==="
  time python -m links_tpu.cli.train_occlusion_models $CORPUS $X --model-dir "$M" --use-best
  echo "=== [$1] eval (best) ==="
  python -m links_tpu.cli.eval_h36m $CORPUS $X --model-dir "$M" --json --use-best > "results/r3/eval_$1_best.json"
  python -m links_tpu.cli.eval_h36m $CORPUS $X --model-dir "$M" --mode leg_torso --json --use-best > "results/r3/eval_$1_lt_best.json"
  python -m links_tpu.cli.eval_h36m $CORPUS $X --model-dir "$M" --json --use-best --occlusion --dropout > "results/r3/eval_$1_occ.json"
}

run_leg gt ""
run_leg det "--no-gt-2d"
echo "=== [det] eval --from-detections (genuinely missing keypoints) ==="
python -m links_tpu.cli.eval_h36m $CORPUS --no-gt-2d --model-dir "$R/models_det" --json --use-best --from-detections > results/r3/eval_det_from_detections.json

echo "=== stage-4 anti-overfitting matrix (gt lifters, 20 epochs each) ==="
for v in base rot6 noise wd rot6noise; do
  M="$R/models_s4_$v"; mkdir -p "$M"; cp -r "$R/models_gt/." "$M/"
  rm -rf "$M/occlusion_models" "$M/occlusion_models_best" "$M/occlusion_run" "$M/occlusion_models.jsonl"
  case $v in
    base)      F="";;
    rot6)      F="--aug-rotations 6";;
    noise)     F="--aug-input-noise 0.05";;
    wd)        F="--weight-decay 1e-3";;
    rot6noise) F="--aug-rotations 6 --aug-input-noise 0.05";;
  esac
  echo "--- stage-4 variant $v ($F) ---"
  time python -m links_tpu.cli.train_occlusion_models $CORPUS $F --model-dir "$M" --use-best --epochs 20 --log "results/r3/s4_$v.jsonl"
done
echo "=== DONE ==="
