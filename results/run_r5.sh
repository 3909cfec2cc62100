#!/bin/bash
# Round-5 measurement campaign (VERDICT r4 "next round" items 1-8).
#
# All stage-3 runs reuse the round-4 corpus (runs/r4/corpus.pkl: 65,536x5
# train = 327,680 poses, 8,192x2 test) and the round-4 frozen gt flows
# (runs/r4/models_gt) so every number is comparable with the committed
# round-4 artifacts. Each run gets a FRESH model dir seeded with copies of
# the frozen flow artifacts (MetricLogger appends — reusing a dir would
# pollute its curve).
#
# Phases:
#   measured — stage 3a seed 42, default recipe (bf16 Adam moments,
#              deferred best-saves, persistent compile cache) ->
#              results/r5/delivered_stage3a.log + gt_s42 curve.
#              VERDICT #2: the delivered-vs-benched accounting.
#   stage12  — stages 1+2 re-run into a scratch dir for delivered logs
#              with the round-5 EpochTimer (flows are NOT reused
#              downstream; the frozen round-4 flows stay authoritative).
#   cap      — twin of `measured` with --nll-cap 500. VERDICT #3: is the
#              robust recipe metric-neutral on healthy gt data?
#   packed   — twin of `measured` through the native streaming loader
#              (links-pack -> --packed-data). VERDICT #8.
#   flipseek — seeds 101/102/103, 150 epochs, watching val_tilt for a
#              sustained depth flip. VERDICT #1: a curve where plain NLL
#              selection actually loses.
#   guard    — re-run a flipped seed with --flip-guard 5 (VERDICT #5):
#              must stop within ~5 validation epochs of the flip with the
#              _best checkpoint intact. Pass the seed as $2.
#   b3       — stage 3b seed 42 twins: default (bf16 moments) and
#              --no-bf16-opt-state (ADVICE #4: the 3b default shipped on
#              extrapolation from the 3a twin).
#   occ      — stage 4 at scale on the b3-default lifters, both selection
#              criteria logged (pa_scenario_mean + val_mse). VERDICT #6.
#   study    — tools/selection_study.py over every round-5 lifter curve.
#
# Usage: bash results/run_r5.sh <phase> [seed]
set -euo pipefail
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache_tpu
mkdir -p results/r5 runs/r5
PHASE="${1:?phase required: measured|stage12|cap|packed|flipseek|guard|b3|occ|study}"

CORPUS="runs/r4/corpus.pkl"
FLOWS="runs/r4/models_gt"
COMMON="--data $CORPUS --synthetic --synthetic-n 65536 --synthetic-test-n 8192 --test-scale auto --save-every 10"
# --bone-means is a lifter-stage flag only (flow/occlusion CLIs reject it)
LIFTER="$COMMON --bone-means data"

seed_dir () {  # seed_dir <name> -> fresh model dir with the frozen flows
  local D="runs/r5/$1"
  rm -rf "$D"
  mkdir -p "$D"
  for f in full_flow flow_left flow_right flow_legs flow_torso; do
    cp -r "$FLOWS/$f" "$D/$f"
  done
  echo "$D"
}

phase_measured () {
  local M; M=$(seed_dir measured)
  echo "=== [measured] stage 3a seed 42, default recipe ==="
  time python -m links_tpu.cli.train_left_right_lifter $LIFTER --seed 42 \
    --model-dir "$M" 2>&1 | tee results/r5/delivered_stage3a.log
  cp "$M/left_right_lifter.jsonl" results/r5/gt_s42_left_right_curve.jsonl
}

phase_stage12 () {
  local M="runs/r5/stage12"
  rm -rf "$M" && mkdir -p "$M"
  echo "=== [stage12] stage 1: full-pose flow ==="
  time python -m links_tpu.cli.train_full_pose_norm_flow $COMMON --seed 42 \
    --model-dir "$M" --clip-grad 10.0 2>&1 | tee results/r5/delivered_stage1.log
  echo "=== [stage12] stage 2: part flows ==="
  time python -m links_tpu.cli.train_part_norm_flows $COMMON --seed 42 \
    --model-dir "$M" --clip-grad 10.0 2>&1 | tee results/r5/delivered_stage2.log
}

phase_cap () {
  local M; M=$(seed_dir cap)
  echo "=== [cap] stage 3a seed 42 twin, --nll-cap 500 ==="
  time python -m links_tpu.cli.train_left_right_lifter $LIFTER --seed 42 \
    --model-dir "$M" --nll-cap 500 2>&1 | tee results/r5/delivered_stage3a_cap.log
  cp "$M/left_right_lifter.jsonl" results/r5/gt_s42_cap_left_right_curve.jsonl
}

phase_packed () {
  local M; M=$(seed_dir packed)
  local PACK="runs/r5/corpus.lnks"
  rm -f "$PACK"  # a stale pack would make --bone-means data unservable
  echo "=== [packed] stage 3a seed 42 twin through the native loader ==="
  time python -m links_tpu.cli.train_left_right_lifter $LIFTER --seed 42 \
    --model-dir "$M" --packed-data "$PACK" \
    2>&1 | tee results/r5/delivered_stage3a_packed.log
  cp "$M/left_right_lifter.jsonl" results/r5/gt_s42_packed_left_right_curve.jsonl
}

phase_flipseek () {
  for S in 101 102 103; do
    local M; M=$(seed_dir "flipseek_s$S")
    echo "=== [flipseek] stage 3a seed $S, 150 epochs ==="
    time python -m links_tpu.cli.train_left_right_lifter $LIFTER --seed "$S" \
      --epochs 150 --model-dir "$M" \
      2>&1 | tee "results/r5/flipseek_s${S}.log" \
      | grep -E "\[best\]|epoch (0|[0-9]*[05]):" || true
    cp "$M/left_right_lifter.jsonl" "results/r5/gt_s${S}_left_right_curve.jsonl"
  done
}

phase_guard () {
  local S="${2:?guard needs the flipped seed as arg 2}"
  local M; M=$(seed_dir "guard_s$S")
  echo "=== [guard] stage 3a seed $S with --flip-guard 5 ==="
  time python -m links_tpu.cli.train_left_right_lifter $LIFTER --seed "$S" \
    --epochs 150 --model-dir "$M" --flip-guard 5 \
    2>&1 | tee "results/r5/guard_s${S}.log"
  cp "$M/left_right_lifter.jsonl" "results/r5/guard_s${S}_curve.jsonl"
}

phase_b3 () {
  local M; M=$(seed_dir b3)
  echo "=== [b3] stage 3b seed 42, default recipe (bf16 moments) ==="
  time python -m links_tpu.cli.train_leg_torso_lifter $LIFTER --seed 42 \
    --model-dir "$M" 2>&1 | tee results/r5/delivered_stage3b.log
  cp "$M/leg_torso_lifter.jsonl" results/r5/gt_s42_leg_torso_curve.jsonl

  local M2; M2=$(seed_dir b3_f32)
  echo "=== [b3] stage 3b seed 42 twin, --no-bf16-opt-state ==="
  time python -m links_tpu.cli.train_leg_torso_lifter $LIFTER --seed 42 \
    --model-dir "$M2" --no-bf16-opt-state \
    2>&1 | tee results/r5/delivered_stage3b_f32.log
  cp "$M2/leg_torso_lifter.jsonl" results/r5/gt_s42_f32_leg_torso_curve.jsonl
}

phase_occ () {
  # stage 4 needs all four lifters: left/right from `measured`, legs/torso
  # from `b3` (default-recipe twin)
  local M="runs/r5/occ"
  rm -rf "$M" && mkdir -p "$M"
  for f in full_flow flow_left flow_right flow_legs flow_torso; do
    cp -r "$FLOWS/$f" "$M/$f"
  done
  for f in lifter_left_right lifter_left_right_best; do
    cp -r "runs/r5/measured/$f" "$M/$f"
  done
  for f in lifter_legs lifter_torso lifter_legs_best lifter_torso_best; do
    cp -r "runs/r5/b3/$f" "$M/$f"
  done
  echo "=== [occ] stage 4 at scale, both selection criteria logged ==="
  time python -m links_tpu.cli.train_occlusion_models $COMMON --seed 42 \
    --model-dir "$M" --use-best --aug-input-noise 0.05 \
    2>&1 | tee results/r5/delivered_stage4.log
  cp "$M/occlusion_models.jsonl" results/r5/gt_s42_occlusion_curve.jsonl
}

phase_serve () {
  # VERDICT #4: the production serving matrix — converged weights, int8
  # static quant OR the fused bf16 kernel (mutually exclusive: the Pallas
  # kernel multiplies in bf16), hostile clients injected into both.
  echo "=== [serve] serve_load v2: int8-static + fault injection ==="
  python benchmarks/serve_load.py --model-dir runs/r5/occ --data "$CORPUS" \
    --use-best --quant int8-static --fault 2 \
    --clients 8 --requests 20 --rows 50 \
    | tee results/r5/serve_load_v2.json
  echo "=== [serve] serve_load v2: fused bf16 kernel + fault injection ==="
  python benchmarks/serve_load.py --model-dir runs/r5/occ --data "$CORPUS" \
    --use-best --fused --fault 2 \
    --clients 8 --requests 20 --rows 50 \
    | tee results/r5/serve_load_v2_fused.json
}

phase_study () {
  echo "=== [study] selection study over the round-5 curves ==="
  python tools/selection_study.py \
    results/r5/gt_s42_left_right_curve.jsonl \
    results/r5/gt_s42_cap_left_right_curve.jsonl \
    results/r5/gt_s42_packed_left_right_curve.jsonl \
    results/r5/gt_s42_warm_left_right_curve.jsonl \
    results/r5/gt_s101_left_right_curve.jsonl \
    results/r5/gt_s102_left_right_curve.jsonl \
    results/r5/gt_s103_left_right_curve.jsonl \
    results/r5/gt_s42_leg_torso_curve.jsonl \
    results/r5/gt_s42_f32_leg_torso_curve.jsonl \
    results/r4/flip_gt_left_right_curve.jsonl \
    results/r4/gt_left_right_curve.jsonl \
    | tee results/r5/selection_study.json
}

case "$PHASE" in
  measured) phase_measured ;;
  stage12)  phase_stage12 ;;
  cap)      phase_cap ;;
  packed)   phase_packed ;;
  flipseek) phase_flipseek ;;
  guard)    phase_guard "$@" ;;
  b3)       phase_b3 ;;
  occ)      phase_occ ;;
  serve)    phase_serve ;;
  study)    phase_study ;;
  *) echo "unknown phase $PHASE"; exit 2 ;;
esac
echo "=== run_r5.sh $PHASE DONE ==="
