#!/bin/bash
# MPI-INF-3DHP end-to-end exercise (VERDICT r1 missing #5 / BASELINE.json
# configs[4]): drive `--dataset mpi` through full stages, not just plumb it.
#
# The corpus is the synthetic generator's MPI-schema side: the same pickle
# carries 'poses_3d_univ' (utils/h36m_dataset_class.py:81 — the GT key the
# MPI dataset class reads) and the loader routes it + the vnect test
# normalization (scale 302.8530630720979, helpers.py:242-249) under
# `--dataset mpi --test-norm mpi_vnect`. Eval reports PCK@150/AUC — the
# MPI protocol's headline metrics (metrics_batch.py:26-64).
set -euo pipefail
cd /root/repo
D="runs/mpi"
COMMON="--data $D/synth.pkl --synthetic --synthetic-n 32768 --synthetic-test-n 4096 --model-dir $D/models --seed 42 --save-every 10"
MPI="--dataset mpi --test-norm mpi_vnect --test-scale auto"
LIFT="--bone-means data"
# On the held-out split (train S1-S6) the stage-1 self-sample NLL
# deterministically explodes at ~epoch 22 (one outlier sample batch hits
# ~1e15 loss and wrecks the flow); --clip-grad 10.0 bounds that single
# update and the run converges (-331 final vs -344 for a lucky unclipped
# draw; clip 1.0 over-throttles at -303). Flow stages only — the lifter
# stages keep the reference's unclipped recipe.
FLOW="--clip-grad 10.0"

echo "=== stage 1: full-pose flow (mpi schema) ==="
time python -m links_tpu.cli.train_full_pose_norm_flow $COMMON $MPI $FLOW
echo "=== stage 2: part flows ==="
time python -m links_tpu.cli.train_part_norm_flows $COMMON $MPI $FLOW
echo "=== stage 3a: left/right lifters ==="
time python -m links_tpu.cli.train_left_right_lifter $COMMON $MPI $LIFT
echo "=== stage 3b: leg/torso lifters ==="
time python -m links_tpu.cli.train_leg_torso_lifter $COMMON $MPI $LIFT
echo "=== stage 5: eval (PCK/AUC over poses_3d_univ GT) ==="
python -m links_tpu.cli.eval_h36m $COMMON $MPI --json > results/eval_mpi_left_right.json
python -m links_tpu.cli.eval_h36m $COMMON $MPI --mode leg_torso --json > results/eval_mpi_leg_torso.json
echo "=== DONE ==="
