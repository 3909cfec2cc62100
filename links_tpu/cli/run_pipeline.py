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

# stage -> consumer-facing lifter artifacts a seed sweep must promote
_SWEEP_ARTIFACTS = {"3a": ("lifter_left_right",),
                    "3b": ("lifter_legs", "lifter_torso")}
_SWEEP_CURVES = {"3a": "left_right_lifter.jsonl",
                 "3b": "leg_torso_lifter.jsonl"}
_FLOW_DIRS = ("full_flow", "flow_left", "flow_right", "flow_legs",
              "flow_torso")


def _forwarded_model_dir(flags) -> str:
    out = "models"  # the stage CLIs' default (cli/_common.py)
    for i, f in enumerate(flags):
        # LAST occurrence wins, matching argparse (the seed sweep appends
        # its per-seed override after the user's forwarded flags)
        if f == "--model-dir" and i + 1 < len(flags):
            out = flags[i + 1]
        elif f.startswith("--model-dir="):
            out = f.split("=", 1)[1]
    return out


def _best_extra(path):
    """(epoch, metric_name, value) recorded for a ``<name>_best``
    checkpoint, or None if the artifact is absent (a fully-gated run
    under --select-by nll-tilt saves no best). Reads the BestTracker's
    ``.meta.json`` sidecar when present — restoring the full params tree
    just for two scalars costs ~100 MB of disk reads per seed."""
    import json

    from links_tpu import ckpt

    if not path.exists():
        return None
    sidecar = path.with_name(path.name + ".meta.json")
    if sidecar.exists():
        extra = json.loads(sidecar.read_text())
    else:  # pre-round-5 checkpoint: fall back to the full restore
        extra = ckpt.restore_checkpoint(path).get("extra", {})
    metric = next((k for k in extra if k != "epoch"), None)
    if metric is None:
        return None
    return int(extra.get("epoch", -1)), metric, float(extra[metric])


def _run_seed_sweep(stage, run_stage, flags, seeds):
    """Train stage 3a/3b once per seed in ``<model-dir>/seed<k>/`` (flows
    shared via symlink), then promote the winner's artifacts into the base
    model dir for stages 4/eval (RESULTS.md round-5 selection study: basin
    outcome is a seed lottery — 61.9/83.9/77.6/126.7 mm across four seeds
    on the same corpus — and cross-run GT-free selection is impossible for
    likelihood-preferred basins, so the production recipe is a multi-seed
    sweep picked on the BestTracker's validation criterion; the reference
    runs seeds by hand and eyeballs wandb)."""
    import os
    import shutil
    from pathlib import Path

    base = Path(_forwarded_model_dir(flags))
    names = _SWEEP_ARTIFACTS[stage]
    if "--log" in flags or any(f.startswith("--log=") for f in flags):
        # one shared log would interleave every seed's curve and break
        # winner-curve promotion; each seed logs into its own dir instead
        print("[pipeline] --lifter-seeds: dropping forwarded --log "
              "(each seed writes <seed-dir>/" + _SWEEP_CURVES[stage] + ")",
              file=sys.stderr)
        drop = False
        kept = []
        for f in flags:
            if drop:
                drop = False
                continue
            if f == "--log":
                drop = True
            elif not f.startswith("--log="):
                kept.append(f)
        flags = kept
    scored = []
    for seed in seeds:
        sdir = base / f"seed{seed}"
        sdir.mkdir(parents=True, exist_ok=True)
        for f in _FLOW_DIRS:
            src, dst = base / f, sdir / f
            if src.exists() and not dst.is_symlink() and not dst.exists():
                os.symlink(src.resolve(), dst)
        print(f"[pipeline] stage {stage} seed {seed} -> {sdir}")
        # fatal=False: a seed that crashes through every retry is
        # disqualified like a gate-vetoed one — it must not discard the
        # other seeds' completed training. Stale artifacts from an
        # earlier sweep in the same dir are removed by the trainers
        # themselves (cli/_common.clear_stage_artifacts).
        if not run_stage(flags + ["--model-dir", str(sdir),
                                  "--seed", str(seed)], fatal=False):
            print(f"[pipeline] stage {stage} seed {seed}: crashed through "
                  f"every retry; disqualified", file=sys.stderr)
            continue
        got = _best_extra(sdir / f"{names[0]}_best")
        if got is None:
            print(f"[pipeline] stage {stage} seed {seed}: no best "
                  f"checkpoint (selection gate vetoed every epoch); "
                  f"disqualified", file=sys.stderr)
            continue
        epoch, metric, value = got
        print(f"[pipeline] stage {stage} seed {seed}: best {metric}="
              f"{value:.4f} @ epoch {epoch}")
        scored.append((value, seed, sdir, metric))
    if not scored:
        print(f"[pipeline] stage {stage}: every seed disqualified",
              file=sys.stderr)
        sys.exit(1)
    value, seed, sdir, metric = min(scored)
    print(f"[pipeline] stage {stage}: seed {seed} wins "
          f"({metric}={value:.4f}); promoting artifacts to {base}")
    to_copy = [n for name in names for n in (name, f"{name}_best")]
    to_copy.append(f"{'left_right' if stage == '3a' else 'leg_torso'}_run")
    for name in to_copy:
        src = sdir / name
        if not src.exists():
            continue
        dst = base / name
        if dst.exists():
            shutil.rmtree(dst)
        shutil.copytree(src, dst)
    curve = sdir / _SWEEP_CURVES[stage]
    if curve.exists():
        shutil.copy2(curve, base / _SWEEP_CURVES[stage])


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
    parser.add_argument("--lifter-seeds", default=None, metavar="S1,S2,..",
                        help="train stages 3a/3b once per seed (in "
                             "<model-dir>/seed<k>/, flows shared) and "
                             "promote the winner by its BestTracker "
                             "validation criterion — the multi-seed "
                             "production recipe for this objective's "
                             "basin lottery (RESULTS.md round-5 "
                             "selection study). Stages 4/eval then "
                             "consume the promoted winner")
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
    seeds = ([int(s) for s in args.lifter_seeds.split(",") if s.strip()]
             if args.lifter_seeds else None)
    for stage in stages:
        stage_main = _stage_main(stage)

        def run_stage(flags, fatal=True, stage=stage, stage_main=stage_main):
            attempts = args.retries + 1
            for attempt in range(attempts):
                f2 = list(flags)
                if stage != "eval" and attempt > 0:
                    f2.append("--resume")
                try:
                    print(f"[pipeline] stage {stage} "
                          f"(attempt {attempt + 1}/{attempts})")
                    stage_main(f2)
                    return True
                except KeyboardInterrupt:
                    raise
                except Exception:
                    traceback.print_exc()
                    if attempt + 1 == attempts:
                        print(f"[pipeline] stage {stage} failed after "
                              f"{attempts} attempts", file=sys.stderr)
                        if fatal:
                            sys.exit(1)
                        return False
                    print(f"[pipeline] stage {stage} crashed; resuming")

        flags = list(forwarded)
        if args.use_best and stage in ("4", "eval"):
            flags.append("--use-best")
        if args.use_final and stage in ("4", "eval"):
            flags.append("--use-final")
        if stage == "eval":
            flags += eval_extra
        if seeds and stage in ("3a", "3b"):
            _run_seed_sweep(stage, run_stage, flags, seeds)
        else:
            run_stage(flags)


if __name__ == "__main__":
    main()
