#!/bin/bash
# Round-4 measurement pass (this session's environment lost runs/ — the
# training dirs and curve JSONLs from the earlier round-4 sessions were
# wiped with the host, so the two artifacts VERDICT r3 still wants are
# re-measured here from scratch):
#
#   flip     — the flip-reproduction run (VERDICT r3 next #3): gt-2D
#              left/right at the round-3 scale (16,384x5 train poses,
#              seed 42 — the one configuration where --select-by nll
#              picked the depth-flipped epoch at +36.7 mm), with the
#              round-4 trainer logging val_tilt every validation epoch.
#   measured — a full gt stage-1/2/3a run at the ROUND-2 scale
#              (65,536x5 train poses, the 61-mm basin), stage 3a with
#              --bf16-opt-state (the new default recipe), stdout tee'd:
#              the EpochTimer breakdown in the log IS the
#              delivered-vs-benched accounting (VERDICT r3 next #1).
#   study    — tools/selection_study.py over both curves: the claim
#              under test is that nll-tilt (NLL gated on the depth-flip
#              alarm) recovers the GT pick on exactly the run plain NLL
#              loses.
#
# Usage: bash results/run_r4d.sh [flip|measured|study|all]
set -uo pipefail
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache_tpu
mkdir -p results/r4
PHASE="${1:-all}"

phase_flip () {
  local R="runs/flip" M="runs/flip/models"
  mkdir -p "$M"
  local CORPUS="--data $R/corpus.pkl --synthetic --synthetic-n 16384 --synthetic-test-n 4096 --seed 42 --test-scale auto --save-every 10"
  if [ ! -d "$M/flow_torso" ]; then
    echo "=== [flip] stage 1: full-pose flow ==="
    time python -m links_tpu.cli.train_full_pose_norm_flow $CORPUS --model-dir "$M" --clip-grad 10.0
    echo "=== [flip] stage 2: part flows ==="
    time python -m links_tpu.cli.train_part_norm_flows $CORPUS --model-dir "$M" --clip-grad 10.0
  fi
  echo "=== [flip] stage 3a: left/right lifters (val_tilt logged) ==="
  time python -m links_tpu.cli.train_left_right_lifter $CORPUS --bone-means data --model-dir "$M"
  cp "$M/left_right_lifter.jsonl" results/r4/flip_gt_left_right_curve.jsonl
}

phase_measured () {
  local R="runs/r4" M="runs/r4/models_gt"
  mkdir -p "$M"
  local CORPUS="--data $R/corpus.pkl --synthetic --synthetic-n 65536 --synthetic-test-n 8192 --seed 42 --test-scale auto --save-every 10"
  if [ ! -d "$M/flow_torso" ]; then
    echo "=== [measured] stage 1: full-pose flow ==="
    time python -m links_tpu.cli.train_full_pose_norm_flow $CORPUS --model-dir "$M" --clip-grad 10.0 \
      2>&1 | tee results/r4/delivered_stage1.log
    echo "=== [measured] stage 2: part flows ==="
    time python -m links_tpu.cli.train_part_norm_flows $CORPUS --model-dir "$M" --clip-grad 10.0 \
      2>&1 | tee results/r4/delivered_stage2.log
  fi
  echo "=== [measured] stage 3a: left/right lifters (bf16 opt state, EpochTimer) ==="
  time python -m links_tpu.cli.train_left_right_lifter $CORPUS --bone-means data --model-dir "$M" \
    --bf16-opt-state 2>&1 | tee results/r4/delivered_stage3a.log
  cp "$M/left_right_lifter.jsonl" results/r4/gt_left_right_curve.jsonl
}

phase_study () {
  echo "=== [study] selection study over the round-4 curves ==="
  python tools/selection_study.py \
    results/r4/flip_gt_left_right_curve.jsonl \
    results/r4/gt_left_right_curve.jsonl \
    | tee results/r4/selection_study.json
}

case "$PHASE" in
  flip)     phase_flip ;;
  measured) phase_measured ;;
  study)    phase_study ;;
  all)      phase_flip; phase_measured; phase_study ;;
  *) echo "unknown phase $PHASE"; exit 2 ;;
esac
echo "=== run_r4d.sh $PHASE DONE ==="
