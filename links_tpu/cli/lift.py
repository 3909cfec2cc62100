"""Batch 2D→3D lifting inference — the production serving surface.

The reference exposes prediction only through its visualiser
(visualisation/h36m_prediction_visualiser.py:244-320, one frame at a time,
matplotlib-bound). This CLI is the framework's deployable counterpart:
normalized 2D keypoints in, camera-frame 3D poses out, as one fixed-shape
jitted program driven over padded chunks so arbitrary request sizes reuse a
single compiled executable (no shape-churn recompiles — the serving
requirement XLA imposes).

Inputs:
  * ``--data`` — a dataset pickle; the test split is normalized exactly as
    eval does (utils/helpers.py:222-259 scales), or
  * ``--raw-2d`` — a .npy/.npz of already-normalized (N, 34) poses, the
    contract an upstream 2D detector service would fulfil.

``--scenario`` serves the paper's occlusion story end-to-end: the limb's
keypoints are zeroed, the pose is lifted from the visible joints only and
the missing 3D part is infilled by the stage-4 completers
(train_occlusion_models.py:317-399 routing).

Output: ``--out`` .npz with ``poses_3d`` (N, 3, 17) [+ ``poses_2d`` echo],
plus one JSON summary line on stdout (count, wall time, poses/sec).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from links_tpu.cli import _common as C


def _load_raw_2d(path: str) -> np.ndarray:
    if path.endswith(".npz"):
        with np.load(path) as z:
            key = "poses_2d" if "poses_2d" in z else list(z.keys())[0]
            arr = z[key]
    else:
        arr = np.load(path)
    arr = np.asarray(arr, np.float32)
    if arr.ndim == 3 and arr.shape[1:] == (2, 17):
        arr = arr.reshape(-1, 34)
    if arr.ndim != 2 or arr.shape[1] != 34:
        raise SystemExit(
            f"--raw-2d must be (N, 34) or (N, 2, 17) normalized 2D poses, "
            f"got {arr.shape}")
    return arr


def _chunked(fn, poses_2d: np.ndarray, batch: int) -> np.ndarray:
    """Run ``fn`` over fixed-size chunks (last chunk padded) so every call
    hits the same compiled executable."""
    n = poses_2d.shape[0]
    pad = (-n) % batch
    if pad:
        poses_2d = np.concatenate([poses_2d, poses_2d[-1:].repeat(pad, 0)])
    outs = [np.asarray(fn(jnp.asarray(poses_2d[i:i + batch])))
            for i in range(0, poses_2d.shape[0], batch)]
    return np.concatenate(outs)[:n]


def add_serving_flags(parser):
    """The model-selection flags shared by links-lift and links-serve
    (build_serving_fn consumes exactly these plus the common/ckpt flags)."""
    from links_tpu.objectives import occlusion as occ

    parser.add_argument("--mode", choices=["left_right", "leg_torso"],
                        default="left_right")
    parser.add_argument("--choice", choices=["left", "right"], default="right")
    parser.add_argument("--depth", type=float, default=10.0)
    parser.add_argument("--scenario", default=None,
                        choices=sorted(occ.DROPOUT_SCENARIO_JOINTS),
                        help="occluded-limb scenario: zero its 2D keypoints, "
                             "lift the visible part and infill the missing "
                             "3D joints with the stage-4 completers")
    parser.add_argument("--fused", action="store_true",
                        help="left_right mode: run both side lifters as one "
                             "fused Pallas kernel (bf16 multiplies, chunked "
                             "at <=512 poses; see PERF.md 'Inference "
                             "serving')")
    parser.add_argument("--quant", choices=["int8", "int8-static"],
                        default=None,
                        help="post-training quantization of the serving "
                             "weights: int8 runs the MXU's s8xs8->s32 2x-"
                             "rate path with dynamic per-row activation "
                             "scales; int8-static calibrates per-tensor "
                             "activation scales offline on --calib-rows "
                             "train poses, removing the per-row dynamic-"
                             "quant VPU work from the serving program "
                             "(ops/quant.py; accuracy/latency deltas in "
                             "PERF.md 'Int8 serving')")
    parser.add_argument("--calib-rows", type=int, default=1024,
                        help="train rows used to calibrate int8-static "
                             "activation scales")
    parser.add_argument("--policy", choices=["f32", "bf16"], default="f32",
                        help="serving matmul dtype: bf16 multiplies (f32 "
                             "accumulation) run 2.3x faster than f32 on "
                             "the MXU at large batch for ~1e-3 relative "
                             "error (PERF.md); default stays the eval-"
                             "parity f32")


def build_serving_fn(args, batch: int):
    """Construct the jitted serving forward the CLI flags describe and the
    effective per-call batch cap: plain left_right / leg_torso lifting, the
    --scenario completer-infill program, --quant int8 weights, or the
    --fused Pallas kernel. Shared by links-lift and links-serve."""
    from links_tpu.ckpt import load_lifter_pt
    from links_tpu.objectives import lift_left_right_eval, lift_leg_torso_eval
    from links_tpu.objectives import occlusion as occ

    def _name(base):
        return base + C.best_suffix(args, base)

    if args.fused and (args.scenario or args.mode != "left_right"):
        raise SystemExit(
            "--fused covers the plain left_right forward only; it cannot "
            "serve --scenario infill or --mode leg_torso")
    if args.fused and args.quant:
        raise SystemExit("--fused and --quant are mutually exclusive "
                         "(the Pallas kernel multiplies in bf16)")
    if args.quant == "int8-static" and args.scenario:
        raise SystemExit(
            "--quant int8-static calibrates the plain left_right/leg_torso "
            "forwards only; the --scenario completer-infill program falls "
            "back to --quant int8 (dynamic scales)")

    _maybe_quant = lambda tree: C.maybe_quantize(tree, args)
    policy = C.serving_policy(args)

    if args.scenario:
        # occluded serving path: lifters that never see the dropped joints
        # + completer infill (dropout_eval_poses semantics, single scenario)
        lifters = _maybe_quant(C.load_all_lifters(args))
        completers = _maybe_quant(C.load_params(args, _name(C.OCCLUSION)))
        joints = occ.DROPOUT_SCENARIO_JOINTS[args.scenario]

        # model weights are jit *arguments* (closure-captured arrays bake
        # into the HLO as constants and stall compilation)
        @jax.jit
        def _infill(cs, ls, p2d):
            occluded = occ.drop_keypoints(p2d, joints)
            return occ.occlusion_validation_poses(
                cs, ls, occluded, args.depth, policy=policy,
                scenarios=(args.scenario,))[args.scenario]

        fn = lambda p2d: _infill(completers, lifters, p2d)
    elif args.mode == "left_right":
        stacked = C.load_stacked_lr(args)
        stacked = (C.static_quant_lr(args, stacked)
                   if args.quant == "int8-static" else _maybe_quant(stacked))
        if args.fused:
            # single fused Pallas kernel for both side lifters (bf16
            # multiply policy; ops/fused_infer.py) — opt-in serving path
            from links_tpu.ops import (lift_left_right_eval_fused,
                                       prepare_fused_weights)

            prep = prepare_fused_weights(stacked)
            fn = lambda p2d: lift_left_right_eval_fused(
                prep, p2d, args.depth, args.choice)
            batch = min(batch, 512)  # the kernel's latency-regime cap
        else:
            _lift = jax.jit(lift_left_right_eval, static_argnums=(2, 3, 4))
            fn = lambda p2d: _lift(stacked, p2d, args.depth, args.choice,
                                   policy)
    else:
        legs = C.load_params(args, _name(C.LIFTER_LEGS),
                             pt_loader=load_lifter_pt)
        torso = C.load_params(args, _name(C.LIFTER_TORSO),
                              pt_loader=load_lifter_pt)
        if args.quant == "int8-static":
            legs, torso = C.static_quant_leg_torso(args, legs, torso)
        else:
            legs, torso = _maybe_quant(legs), _maybe_quant(torso)
        _lift = jax.jit(lift_leg_torso_eval, static_argnums=(3, 4))
        fn = lambda p2d: _lift(legs, torso, p2d, args.depth, policy)
    return fn, batch


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Batch 2D→3D pose lifting (serving path)")
    add_serving_flags(parser)
    parser.add_argument("--raw-2d", default=None,
                        help=".npy/.npz of normalized (N,34) 2D poses; "
                             "bypasses the dataset loader")
    parser.add_argument("--out", required=True, help="output .npz path")
    parser.add_argument("--limit", type=int, default=None,
                        help="lift only the first N poses")
    C.add_common_flags(parser)
    C.add_lr_pt_flags(parser)
    C.add_use_best_flag(parser)
    args = parser.parse_args(argv)
    C.maybe_init_distributed(args)

    if args.raw_2d:
        poses_2d = _load_raw_2d(args.raw_2d)
    else:
        test_data = C.load_test(args)
        poses_2d = np.asarray(test_data.poses_2d)
    if args.limit:
        poses_2d = poses_2d[: args.limit]
    n = poses_2d.shape[0]
    if n == 0:
        raise SystemExit("no poses to lift: the input is empty")
    batch = min(args.batch_size or 256, n)

    fn, batch = build_serving_fn(args, batch)

    _chunked(fn, poses_2d[:batch], batch)  # warm the executable
    t0 = time.perf_counter()
    pred = _chunked(fn, poses_2d, batch)
    dt = time.perf_counter() - t0

    pred_3d = pred.reshape(n, 3, 17)
    np.savez_compressed(args.out, poses_3d=pred_3d, poses_2d=poses_2d)
    print(json.dumps({
        "poses": n, "batch": batch, "mode": args.mode, "quant": args.quant,
        "scenario": args.scenario, "seconds": round(dt, 4),
        "poses_per_sec": round(n / dt, 1) if dt > 0 else None,
        "out": args.out,
    }))
    return pred_3d


if __name__ == "__main__":
    main()
