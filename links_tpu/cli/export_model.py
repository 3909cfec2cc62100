"""``links-export`` — freeze a lifting forward into a portable StableHLO
serving artifact (ckpt/export_io.py), plus ``--inspect`` for existing ones.

The reference ships raw ``.pt`` weight files and requires its full Python
stack to predict (eval_h36m.py:27-49); this CLI emits one self-contained
file — weights embedded, batch dimension symbolic, lowered for tpu+cpu —
that `jax.export.deserialize` turns back into a callable anywhere. The
exported programs are exactly the ``links-lift`` serving forwards:

* ``--mode left_right`` (default): ``lift_left_right_eval`` over the
  stacked side lifters (objectives/lifter.py:342-358);
* ``--mode leg_torso``: ``lift_leg_torso_eval`` (lifter.py:361-374);
* ``--scenario <limb>``: the occlusion story — zero the limb's 2D
  keypoints, lift the visible part, infill the missing 3D joints with the
  stage-4 completers (train_occlusion_models.py:317-399 routing).

Contract: input (B, 34) normalized 2D poses, output (B, 51) camera-frame
3D; B is symbolic unless ``--batch`` pins it. ``--verify`` (default on)
round-trips the artifact and checks it against the live forward.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from links_tpu.cli import _common as C


def main(argv=None):
    from links_tpu import ckpt
    from links_tpu.objectives import occlusion as occ

    from links_tpu.cli.lift import add_serving_flags

    parser = argparse.ArgumentParser(
        description="Export a serving forward as serialized StableHLO")
    add_serving_flags(parser)
    parser.add_argument("--out", default=None,
                        help="artifact path (required unless --inspect)")
    parser.add_argument("--batch", type=int, default=None,
                        help="pin the batch dimension (default: symbolic)")
    parser.add_argument("--platforms", default="tpu,cpu",
                        help="comma-separated lowering targets")
    parser.add_argument("--mlir-out", default=None,
                        help="also write the StableHLO MLIR as text")
    parser.add_argument("--no-verify", action="store_true",
                        help="skip the deserialize-and-compare round trip")
    parser.add_argument("--inspect", metavar="ARTIFACT", default=None,
                        help="print an existing artifact's metadata and exit")
    C.add_common_flags(parser)
    C.add_lr_pt_flags(parser)
    C.add_use_best_flag(parser)
    args = parser.parse_args(argv)

    if args.inspect:
        info = ckpt.exported_info(args.inspect)
        print(json.dumps(info))
        return info
    if not args.out:
        raise SystemExit("--out is required (or use --inspect)")
    if args.fused:
        raise SystemExit("--fused is a live-serving option (links-lift); "
                         "Pallas kernels are not exported through "
                         "jax.export — use the XLA path for artifacts")
    if args.quant == "int8-static" and args.scenario:
        raise SystemExit(
            "--quant int8-static calibrates the plain left_right/leg_torso "
            "forwards only; export the --scenario program with --quant int8")

    from links_tpu.objectives import lift_left_right_eval, lift_leg_torso_eval

    def _name(base):
        return base + C.best_suffix(args, base)

    _maybe_quant = lambda tree: C.maybe_quantize(tree, args)
    policy = C.serving_policy(args)

    # Weights close over the exported fn on purpose: jax.export embeds
    # them as StableHLO constants — the artifact must be self-contained.
    # (This is the opposite discipline from live jit, where closure
    # capture is a compile-stall bug; export only *lowers*.)
    if args.scenario:
        lifters = _maybe_quant(C.load_all_lifters(args))
        completers = _maybe_quant(C.load_params(args, _name(C.OCCLUSION)))
        joints = occ.DROPOUT_SCENARIO_JOINTS[args.scenario]
        scenario = args.scenario

        def fwd(p2d):
            occluded = occ.drop_keypoints(p2d, joints)
            poses = occ.occlusion_validation_poses(
                completers, lifters, occluded, args.depth, policy=policy,
                scenarios=(scenario,))[scenario]
            return poses.reshape(p2d.shape[0], 51)
    elif args.mode == "left_right":
        stacked = C.load_stacked_lr(args)
        stacked = (C.static_quant_lr(args, stacked)
                   if args.quant == "int8-static" else _maybe_quant(stacked))

        def fwd(p2d):
            return lift_left_right_eval(stacked, p2d, args.depth, args.choice,
                                        policy)
    else:
        legs = C.load_params(args, _name(C.LIFTER_LEGS),
                             pt_loader=ckpt.load_lifter_pt)
        torso = C.load_params(args, _name(C.LIFTER_TORSO),
                              pt_loader=ckpt.load_lifter_pt)
        if args.quant == "int8-static":
            legs, torso = C.static_quant_leg_torso(args, legs, torso)
        else:
            legs, torso = _maybe_quant(legs), _maybe_quant(torso)

        def fwd(p2d):
            return lift_leg_torso_eval(legs, torso, p2d, args.depth, policy)

    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())
    exp, nbytes = ckpt.export_serving(
        fwd, args.out, batch=args.batch, platforms=platforms,
        mlir_out=args.mlir_out)

    verified = None
    if not args.no_verify:
        served = ckpt.load_exported(args.out)
        n = args.batch or 4
        probe = np.random.default_rng(0).normal(size=(n, 34)).astype(np.float32)
        probe[:, 0] = 0.0
        got = np.asarray(served(probe))
        want = np.asarray(jax.jit(fwd)(jnp.asarray(probe)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        verified = True

    summary = {
        "out": args.out, "bytes": nbytes, "platforms": list(platforms),
        "batch": args.batch if args.batch else "symbolic",
        "mode": args.mode, "scenario": args.scenario, "quant": args.quant,
        "policy": args.policy,
        "outputs": [str(a) for a in exp.out_avals], "verified": verified,
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
