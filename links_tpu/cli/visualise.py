"""Visualisation entry point (reference visualisation/*.py scripts).

Usage:
    python -m links_tpu.cli.visualise --data data/h36m_data.pkl --frame 0 \\
        --what prediction --out pred.png
"""

from __future__ import annotations

import argparse

import jax

from links_tpu.cli import _common as C


def main(argv=None):
    parser = argparse.ArgumentParser(description="Render skeletons / predictions")
    parser.add_argument("--what", default="prediction",
                        choices=["gt3d", "gt2d", "prediction", "occlusion",
                                 "samples", "video"])
    parser.add_argument("--frame", type=int, default=0)
    parser.add_argument("--frames", type=int, default=50,
                        help="sequence length for --what video (starting at "
                             "--frame)")
    parser.add_argument("--fps", type=int, default=25)
    parser.add_argument("--scenario", default=None,
                        choices=["la", "ra", "ll", "rl", "torso", "legs",
                                 "left", "right"],
                        help="occlusion scenario (--what occlusion default: "
                             "left). With --what video: render the 3-panel "
                             "occlusion clip — GT | naive lift of the "
                             "occluded 2D | completer-recovered — the "
                             "reference's shipped occlusion comparison "
                             "videos (videos/README.md:12-17)")
    parser.add_argument("--flow", default=C.FULL_FLOW, help="flow artifact for --what samples")
    parser.add_argument("--style", choices=["bones", "32slot"],
                        default="bones",
                        help="--what gt3d rendering convention: 'bones' = "
                             "direct 16-edge bone map (side-colored); "
                             "'32slot' = the reference's 32-slot H36M "
                             "buffer + kinematic-tree walk with its axis "
                             "order and view (h36m_gt_visualiser.py:88-101)")
    parser.add_argument("--depth", type=float, default=10.0)
    parser.add_argument("--choice", choices=["left", "right"], default="right",
                        help="which side's lifter supplies the shared "
                             "root/torso columns (matches eval_h36m's "
                             "--choice so the naive-lift panel uses the "
                             "same side as the eval it illustrates)")
    parser.add_argument("--out", default=None, help="output image path")
    C.add_common_flags(parser)
    C.add_lr_pt_flags(parser)
    C.add_use_best_flag(parser)
    args = parser.parse_args(argv)
    C.maybe_init_distributed(args)

    def _name(base):
        return base + C.best_suffix(args, base)

    test_data = C.load_test(args)
    test2d, test3d = test_data.poses_2d, test_data.poses_3d
    if not 0 <= args.frame < test2d.shape[0]:
        raise SystemExit(
            f"--frame {args.frame} out of range (test set has "
            f"{test2d.shape[0]} poses)")
    default_ext = "gif" if args.what == "video" else "png"
    out = args.out or f"{args.what}_{args.frame}.{default_ext}"

    from links_tpu import viz

    if args.what == "gt3d":
        if args.style == "32slot":
            import matplotlib.pyplot as plt

            ax = viz.plot_skeleton_3d_32slot(test3d[args.frame],
                                             title="ground truth")
            ax.figure.savefig(out, dpi=120, bbox_inches="tight")
            plt.close(ax.figure)
        else:
            viz.compare_poses_3d([test3d[args.frame]], ["ground truth"],
                                 out_path=out)
    elif args.what == "gt2d":
        import matplotlib.pyplot as plt

        ax = viz.plot_skeleton_2d(test2d[args.frame], title="ground truth 2D")
        ax.figure.savefig(out, dpi=120, bbox_inches="tight")
        plt.close(ax.figure)
    elif args.what == "prediction":
        stacked = C.load_stacked_lr(args)
        _, err = viz.visualise_prediction(stacked, test2d, test3d, args.frame,
                                          args.depth, out_path=out)
        print(f"frame {args.frame}: PA-MPJPE {err:.2f}mm")
    elif args.what == "occlusion":
        lifters = C.load_all_lifters(args)
        completers = C.load_params(args, _name(C.OCCLUSION))
        scenario = args.scenario or "left"
        _, err = viz.visualise_occlusion(completers, lifters, test2d, test3d,
                                         args.frame, scenario, args.depth,
                                         out_path=out)
        print(f"frame {args.frame} scenario {scenario}: PA {err:.2f}mm")
    elif args.what == "video":
        # GT-vs-prediction comparison clip (the reference ships these
        # pre-rendered, videos/README.md:1-17); with --scenario, the
        # 3-panel occlusion clip (GT | naive | recovered)
        import numpy as np

        from links_tpu.metrics import procrustes_align
        from links_tpu.objectives import lift_left_right_eval

        if args.frames < 1:
            raise SystemExit(f"--frames must be >= 1 (got {args.frames})")
        lo, hi = args.frame, min(args.frame + args.frames, test2d.shape[0])

        if args.scenario:
            from links_tpu.objectives import occlusion as occ

            lifters = C.load_all_lifters(args)
            completers = C.load_params(args, _name(C.OCCLUSION))

            @jax.jit
            def _scenario_poses(cs, ls, p2d, gt3d):
                rec, naive = occ.dropout_eval_poses(
                    cs, ls, p2d, args.depth,
                    choice=args.choice)[args.scenario]
                return procrustes_align(gt3d, rec), procrustes_align(gt3d, naive)

            rec, naive = _scenario_poses(completers, lifters,
                                         test2d[lo:hi], test3d[lo:hi])
            gt = np.asarray(test3d[lo:hi]).reshape(-1, 3, 17)
            viz.render_multi_video(
                [gt, np.asarray(naive), np.asarray(rec)],
                ["ground truth",
                 f"naive lift ({args.scenario} occluded)",
                 "occlusion-recovered"], out, fps=args.fps)
        else:
            stacked = C.load_stacked_lr(args)

            @jax.jit
            def _aligned_pred(params, p2d, gt3d):
                pred = lift_left_right_eval(params, p2d, args.depth,
                                            args.choice)
                return procrustes_align(gt3d, pred)

            aligned = _aligned_pred(stacked, test2d[lo:hi], test3d[lo:hi])
            gt = np.asarray(test3d[lo:hi]).reshape(-1, 3, 17)
            viz.render_comparison_video(gt, np.asarray(aligned), out,
                                        fps=args.fps)
    elif args.what == "samples":
        flow = C.load_flow(args, args.flow)
        dim = flow.perm.shape[-1]
        poses = test2d
        if dim != poses.shape[-1]:
            # part flow: feed it the matching split of the test poses
            from links_tpu.core.skeleton import (
                split_data_left_right,
                split_data_legs_torso,
            )

            left, right = split_data_left_right(test2d)
            legs, torso = split_data_legs_torso(test2d)
            by_name = {"left": left, "right": right,
                       "legs": legs, "torso": torso}
            part = next((p for p in by_name if p in args.flow), None)
            if part is None or by_name[part].shape[-1] != dim:
                raise SystemExit(
                    f"--flow {args.flow} expects {dim}-dim inputs; cannot "
                    f"infer the matching pose split from the name")
            poses = by_name[part]
        viz.visualise_flow_samples(flow, poses, jax.random.PRNGKey(args.seed),
                                   out_path=out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
