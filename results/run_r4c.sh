#!/bin/bash
# Round-4 detector-2D pipeline, take 3 — full retrain with the robust
# recipe after the raw-MLE divergence (see commit "Robust soft-capped
# flow NLL..."): the first det pass crashed on the async-ckpt race, the
# second (run_r4b.sh det, reusing its flows) detonated because those
# flows were sample-degenerate (self-sample NLL 5e5-1.4e7 at epochs
# 97-99) and the lifters inherited the explosion (likeli 3.6e5 -> 5e13
# -> NaN by epoch ~5).
#
# This pass retrains EVERYTHING det from scratch with:
#   --nll-cap 500   soft-cap per-sample flow NLLs (flows.soft_cap_nll)
#   --clip-grad 1.0 tight global-norm clip (was 10.0 for flows, off for
#                   lifters)
# on stages 1/2/3a/3b; stage 4 (pure MSE, no flow term) is unchanged.
# The gt pipeline keeps the reference's uncapped recipe — it is stable
# (runs/r4/models_gt) and is the parity anchor.
#
# Usage: bash results/run_r4c.sh
set -uo pipefail
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache_tpu
R="runs/r4"
M="$R/models_det"
mkdir -p results/r4
CORPUS="--data $R/corpus.pkl --synthetic --synthetic-n 65536 --synthetic-test-n 8192 --seed 42 --test-scale auto --save-every 10"
LIFT="--bone-means data"
X="--no-gt-2d"
ROBUST="--nll-cap 500 --clip-grad 1.0"

# wipe every det artifact (flows included — they are the broken part)
rm -rf "$M"
mkdir -p "$M"

echo "=== [det-robust] stage 1: full-pose flow ==="
time python -m links_tpu.cli.train_full_pose_norm_flow $CORPUS $X --model-dir "$M" $ROBUST
echo "=== [det-robust] stage 2: part flows ==="
time python -m links_tpu.cli.train_part_norm_flows $CORPUS $X --model-dir "$M" $ROBUST
echo "=== [det-robust] stage 3a: left/right lifters ==="
time python -m links_tpu.cli.train_left_right_lifter $CORPUS $X $LIFT --model-dir "$M" $ROBUST
echo "=== [det-robust] stage 3b: leg/torso lifters ==="
time python -m links_tpu.cli.train_leg_torso_lifter $CORPUS $X $LIFT --model-dir "$M" $ROBUST
echo "=== [det-robust] stage 4: occlusion completers ==="
time python -m links_tpu.cli.train_occlusion_models $CORPUS $X --model-dir "$M" --use-best --aug-input-noise 0.05
echo "=== [det-robust] eval (best) ==="
python -m links_tpu.cli.eval_h36m $CORPUS $X --model-dir "$M" --json --use-best > results/r4/eval_det_best.json
python -m links_tpu.cli.eval_h36m $CORPUS $X --model-dir "$M" --mode leg_torso --json --use-best > results/r4/eval_det_lt_best.json
python -m links_tpu.cli.eval_h36m $CORPUS $X --model-dir "$M" --json --use-best --occlusion --dropout > results/r4/eval_det_occ.json
echo "=== [det-robust] eval --from-detections (composition) ==="
python -m links_tpu.cli.eval_h36m $CORPUS $X --model-dir "$M" --json --use-best --from-detections > results/r4/eval_det_from_detections.json
echo "=== run_r4c.sh DONE ==="
