#!/bin/bash
# Attention-vs-MLP lifter comparison (VERDICT r1 next #8): train stage 3a
# with --attention on the SAME corpus + frozen flows as the mode-flip
# control's rebuild leg (results/modeflip/rebuild_curve.jsonl, 32,770
# poses, seed 42), so the two validation-PA curves are directly
# comparable. The attention variant supplies the reference's named-but-
# never-defined Attention_Left_Right_Lifter (train_left_right_lifter.py:67).
set -euo pipefail
cd /root/repo
WS=runs/modeflip
OUT=results/modeflip
python -m links_tpu.cli.train_left_right_lifter \
  --data "$WS/synth.pkl" --model-dir "$WS/models_attention" --synthetic \
  --synthetic-n 6554 --synthetic-test-n 2048 --batch-size 256 \
  --bone-means data --test-scale auto --seed 42 --epochs 60 \
  --attention --log "$OUT/attention_curve.jsonl"
