#!/bin/bash
# Convergence run v2, continuation: stages 1-2 already trained (see run.log).
# Rerun stage 3a with best-validation checkpoint tracking (the 100-epoch run
# mode-flipped: PA 64mm @ epoch 24 -> 145mm @ 99 while loss decreased), run
# stage 3b to completion, then stage 4 + eval from the *best* lifters.
set -uo pipefail
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache_tpu
D="runs/conv2"
COMMON="--data $D/synth.pkl --synthetic --synthetic-n 65536 --synthetic-test-n 8192 --model-dir $D/models --test-scale auto --seed 42 --save-every 10"
LIFT="--bone-means data"

echo "=== stage 3a: left/right lifters (rerun, best-tracking) ==="
time python -m links_tpu.cli.train_left_right_lifter $COMMON $LIFT
echo "=== stage 3b: leg/torso lifters ==="
time python -m links_tpu.cli.train_leg_torso_lifter $COMMON $LIFT
echo "=== stage 4: occlusion completers (frozen best lifters) ==="
time python -m links_tpu.cli.train_occlusion_models $COMMON --use-best
echo "=== stage 5: eval ==="
echo "--- final weights ---"
python -m links_tpu.cli.eval_h36m $COMMON --json
python -m links_tpu.cli.eval_h36m $COMMON --mode leg_torso --json
echo "--- best weights ---"
python -m links_tpu.cli.eval_h36m $COMMON --json --use-best
python -m links_tpu.cli.eval_h36m $COMMON --mode leg_torso --json --use-best
python -m links_tpu.cli.eval_h36m $COMMON --json --use-best --occlusion --dropout
echo "=== DONE ==="
