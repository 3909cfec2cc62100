#!/bin/bash
# Convergence run v2 (VERDICT item 2): 10x the data of v1 — 327,680 train
# poses (65,536 x 5 subjects), 16,384 test poses — after v1 showed the
# part-flow likelihood was miscalibrated at 40k poses (stick-pose pathology;
# see RESULTS.md). Checkpoints every 10 epochs to keep epochs compute-bound.
set -euo pipefail
cd /root/repo
D="runs/conv2"
COMMON="--data $D/synth.pkl --synthetic --synthetic-n 65536 --synthetic-test-n 8192 --model-dir $D/models --test-scale auto --seed 42 --save-every 10"
LIFT="--bone-means data"

echo "=== stage 1: full-pose flow ==="
time python -m links_tpu.cli.train_full_pose_norm_flow $COMMON
echo "=== stage 2: part flows ==="
time python -m links_tpu.cli.train_part_norm_flows $COMMON
echo "=== stage 3a: left/right lifters ==="
time python -m links_tpu.cli.train_left_right_lifter $COMMON $LIFT
echo "=== stage 3b: leg/torso lifters ==="
time python -m links_tpu.cli.train_leg_torso_lifter $COMMON $LIFT
echo "=== stage 4: occlusion completers ==="
time python -m links_tpu.cli.train_occlusion_models $COMMON
echo "=== stage 5: eval ==="
python -m links_tpu.cli.eval_h36m $COMMON --json
python -m links_tpu.cli.eval_h36m $COMMON --mode leg_torso --json
python -m links_tpu.cli.eval_h36m $COMMON --json --occlusion --dropout
echo "=== DONE ==="
