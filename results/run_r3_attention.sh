#!/bin/bash
# Complete the attention-vs-MLP comparison (VERDICT r2 next #10): the
# round-2 attention run died on a chip lock at epoch 53/60 and its
# gitignored working dir is gone, so this reruns the full comparison from
# scratch on a regenerated corpus of the same shape (32,770 train poses,
# seed 42): stages 1-2 to produce frozen flows, then stage 3a twice — MLP
# and --attention — on identical flows/corpus/seed/schedule, 60 epochs
# each, all the way to completion this time.
set -uo pipefail
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache_tpu
WS="runs/r3_attn"
OUT="results/r3"
mkdir -p "$WS/models" "$OUT"
COMMON="--data $WS/synth.pkl --synthetic --synthetic-n 6554 --synthetic-test-n 2048 --model-dir $WS/models --batch-size 256 --test-scale auto --seed 42"

echo "=== stages 1-2: flows ==="
time python -m links_tpu.cli.train_full_pose_norm_flow $COMMON --clip-grad 10.0
time python -m links_tpu.cli.train_part_norm_flows $COMMON --clip-grad 10.0
echo "=== stage 3a: MLP lifter, 60 epochs ==="
time python -m links_tpu.cli.train_left_right_lifter $COMMON --bone-means data \
  --epochs 60 --log "$OUT/attn_mlp_curve.jsonl"
echo "=== stage 3a: attention lifter, 60 epochs ==="
# same model-dir (the flows live there); the attention run overwrites the
# MLP lifter artifacts, which is fine — the comparison lives in the curves
time python -m links_tpu.cli.train_left_right_lifter $COMMON --bone-means data \
  --epochs 60 --attention --log "$OUT/attn_attention_curve.jsonl"
echo "=== DONE ==="
