#!/usr/bin/env bash
# Mode-flip control experiment (VERDICT r1 next #3) — full recipe.
#
# One corpus, one set of frozen flows, two stage-3a trainers:
#   * links_tpu (TPU/jax)  — the rebuild under test
#   * the reference (torch-CPU, executed via tests/_reference_shim.py)
# Overlaid validation-PA curves answer whether the late-training
# depth-flip (RESULTS.md) is objective-inherent or a rebuild bug.
#
# Scale note: the converged RESULTS.md run used 327k poses x 100 epochs —
# far beyond what torch-CPU can retrace here (~1.6 s/step at batch 256).
# This control uses 32,770 train poses (128 steps/epoch); the rebuild leg
# is run first to confirm the flip reproduces at this scale.
set -euo pipefail
cd "$(dirname "$0")/.."

WS=${WS:-runs/modeflip}
EPOCHS=${EPOCHS:-60}
REF_EPOCHS=${REF_EPOCHS:-$EPOCHS}
OUT=${OUT:-results/modeflip}
COMMON="--data $WS/synth.pkl --model-dir $WS/models --synthetic \
  --synthetic-n 6554 --synthetic-test-n 2048 --batch-size 256 \
  --bone-means data --test-scale auto --seed 42"
FLOWARGS="--data $WS/synth.pkl --model-dir $WS/models --synthetic \
  --synthetic-n 6554 --synthetic-test-n 2048 --batch-size 256 --seed 42"
mkdir -p "$OUT"

# stages 1-2: flows (rebuild; also exported as reference-layout .pt)
python -m links_tpu.cli.train_full_pose_norm_flow $FLOWARGS --epochs 40 --save-pt
python -m links_tpu.cli.train_part_norm_flows    $FLOWARGS --epochs 40 --save-pt

# stage 3a, rebuild leg (TPU) — JSONL curve
python -m links_tpu.cli.train_left_right_lifter  $COMMON --epochs "$EPOCHS" \
  --log "$OUT/rebuild_curve.jsonl"

# stage 3a, reference leg (torch-CPU, same flows/data/bone-means)
python tools/reference_control_run.py --data "$WS/synth.pkl" \
  --model-dir "$WS/models" --epochs "$REF_EPOCHS" \
  --out "$OUT/reference_curve.jsonl"

python tools/plot_modeflip.py "$OUT" --out "$OUT/modeflip_control.png"
