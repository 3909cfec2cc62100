"""Full-pipeline orchestrator: runs the five training stages in their
required order (README.md:13-19 of the reference documents the manual
sequence) with automatic crash recovery — each stage restarts from its own
run checkpoint (params + optimizer + epoch + RNG) via --resume semantics.

Usage:
    python -m links_tpu.cli.run_pipeline --data data/h36m_data.pkl \\
        [--stages 1,2,3a,3b,4,eval] [--retries 2]
"""

from __future__ import annotations

import argparse
import sys
import traceback

STAGES = ("1", "2", "3a", "3b", "4", "eval")


def _stage_main(stage: str):
    if stage == "1":
        from links_tpu.cli.train_full_pose_norm_flow import main
    elif stage == "2":
        from links_tpu.cli.train_part_norm_flows import main
    elif stage == "3a":
        from links_tpu.cli.train_left_right_lifter import main
    elif stage == "3b":
        from links_tpu.cli.train_leg_torso_lifter import main
    elif stage == "4":
        from links_tpu.cli.train_occlusion_models import main
    elif stage == "eval":
        from links_tpu.cli.eval_h36m import main
    else:
        raise ValueError(f"unknown stage {stage!r}")
    return main


def main(argv=None):
    parser = argparse.ArgumentParser(description="Run the full LInKs pipeline")
    parser.add_argument("--stages", default=",".join(STAGES),
                        help="comma-separated subset of 1,2,3a,3b,4,eval")
    parser.add_argument("--retries", type=int, default=2,
                        help="per-stage crash retries (resume from the run "
                             "checkpoint)")
    parser.add_argument("--stage-args", default="",
                        help="extra flags forwarded to every stage")
    parser.add_argument("--eval-args", default="",
                        help="extra flags forwarded only to the eval stage "
                             "(e.g. '--json --occlusion')")
    g = parser.add_mutually_exclusive_group()
    g.add_argument("--use-best", action="store_true",
                   help="stages 4 and eval REQUIRE the lifters' "
                        "best-validation checkpoints (they already prefer "
                        "them by default when present)")
    g.add_argument("--use-final", action="store_true",
                   help="stages 4 and eval consume the final-epoch weights "
                        "even when best-validation checkpoints exist")
    # everything else is forwarded verbatim to the stage CLIs
    args, passthrough = parser.parse_known_args(argv)

    stages = [s.strip() for s in args.stages.split(",") if s.strip()]
    unknown = set(stages) - set(STAGES)
    if unknown:
        parser.error(f"unknown stages: {sorted(unknown)}")

    forwarded = passthrough + [a for a in args.stage_args.split() if a]
    eval_extra = [a for a in args.eval_args.split() if a]
    for stage in stages:
        stage_main = _stage_main(stage)
        attempts = args.retries + 1
        for attempt in range(attempts):
            flags = list(forwarded)
            if args.use_best and stage in ("4", "eval"):
                flags.append("--use-best")
            if args.use_final and stage in ("4", "eval"):
                flags.append("--use-final")
            if stage == "eval":
                flags += eval_extra
            elif attempt > 0:
                flags.append("--resume")
            try:
                print(f"[pipeline] stage {stage} (attempt {attempt + 1}/{attempts})")
                stage_main(flags)
                break
            except KeyboardInterrupt:
                raise
            except Exception:
                traceback.print_exc()
                if attempt + 1 == attempts:
                    print(f"[pipeline] stage {stage} failed after "
                          f"{attempts} attempts", file=sys.stderr)
                    sys.exit(1)
                print(f"[pipeline] stage {stage} crashed; resuming")


if __name__ == "__main__":
    main()
