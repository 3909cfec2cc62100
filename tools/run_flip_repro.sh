#!/bin/bash
# Flip-reproduction run (VERDICT r3 next #3, the missing half of the
# selection story): re-run the ONE round-3 configuration where --select-by
# nll failed — gt-2D left/right at the round-3 scale (16,384x5 train /
# 4,096x2 test poses, seed 42; RESULTS.md selection table: NLL picked the
# depth-flipped epoch 74 at +36.7 mm) — with the round-4 trainer, which
# logs val_tilt (metrics.depth_tilt_score) every validation epoch. Then
# run tools/selection_study.py over the curve: the claim under test is
# that nll-tilt (NLL gated on an un-flipped tilt alarm) recovers the GT
# pick on exactly the run plain NLL loses.
#
# Usage: bash tools/run_flip_repro.sh
set -uo pipefail
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache_tpu
R="runs/flip"
mkdir -p "$R/models" results/r4
CORPUS="--data $R/corpus.pkl --synthetic --synthetic-n 16384 --synthetic-test-n 4096 --seed 42 --test-scale auto --save-every 10"
M="$R/models"
if [ ! -d "$M/flow_torso" ]; then
  echo "=== [flip] stage 1: full-pose flow ==="
  time python -m links_tpu.cli.train_full_pose_norm_flow $CORPUS --model-dir "$M" --clip-grad 10.0
  echo "=== [flip] stage 2: part flows ==="
  time python -m links_tpu.cli.train_part_norm_flows $CORPUS --model-dir "$M" --clip-grad 10.0
fi
echo "=== [flip] stage 3a: left/right lifters (val_tilt logged) ==="
time python -m links_tpu.cli.train_left_right_lifter $CORPUS --bone-means data --model-dir "$M"
cp "$M/left_right_lifter.jsonl" results/r4/flip_gt_left_right_curve.jsonl
echo "=== [flip] selection study ==="
python tools/selection_study.py results/r4/flip_gt_left_right_curve.jsonl \
  runs/r4/models_gt/left_right_lifter.jsonl \
  runs/r4/models_gt/leg_torso_lifter.jsonl \
  | tee results/r4/selection_study.json
echo "=== run_flip_repro.sh DONE ==="
