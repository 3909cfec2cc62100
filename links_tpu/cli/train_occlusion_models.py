"""Stage 4 — train the eight occlusion-completion models against the frozen
lifters' pseudo-3D (reference train_occlusion_models.py). Validation
evaluates all eight occlusion scenarios built from mixed lifter
combinations, on device.

Usage:
    python -m links_tpu.cli.train_occlusion_models --data data/h36m_data.pkl
"""

from __future__ import annotations

import argparse
from functools import partial

import jax

from links_tpu import metrics, models
from links_tpu.cli import _common as C
from links_tpu.config import OcclusionTrainConfig
from links_tpu.objectives import occlusion as occ
from links_tpu.train import (
    build_occlusion_step,
    init_state,
    make_optimizer,
)


@partial(jax.jit, static_argnames=("depth",))
def _validate(completers, lifters, test_2d, test_3d, depth: float = 10.0):
    """Per-scenario PA-MPJPE + N-MPJPE (train_occlusion_models.py:401-509)."""
    poses = occ.occlusion_validation_poses(completers, lifters, test_2d, depth)
    out = {}
    for name, pred in poses.items():
        out[f"pa_{name}"] = metrics.pa_mpjpe(test_3d, pred).mean()
        out[f"mpjpe_scaled_{name}"] = metrics.n_mpjpe(
            test_3d, pred, num_joints=17, root_joint=0
        ).mean()
    return out


@partial(jax.jit, static_argnames=("depth",))
def _validate_unsup(completers, lifters, test_2d, key, depth: float = 10.0):
    """Unsupervised selection criterion (VERDICT r4 next #6): the stage's
    own training signal — completer MSE against the frozen lifters'
    pseudo-3D — evaluated on the *validation* split's 2D with a fixed
    rotation key. No GT 3D involved, so ``--select-by mse`` keeps model
    selection GT-free through stage 4 (the reference hand-picks on wandb
    scenario curves, train_occlusion_models.py:317-372)."""
    pose_3d = occ.pseudo_3d_from_lifters(lifters["legs"], lifters["torso"],
                                         test_2d, depth)
    pose_3d = jax.lax.stop_gradient(pose_3d)
    loss, _ = occ.occlusion_loss(completers, pose_3d, key)
    return {"val_mse": loss}


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train 2D INN with PCA")
    # reference flag set (train_occlusion_models.py:27-42)
    parser.add_argument("-n", "--num_bases", type=int, default=26,
                        help="number of PCA bases (kept for reference CLI "
                             "parity; inert there too — the reference only "
                             "ever puts it in the wandb run name, "
                             "train_occlusion_models.py:44-47, and no "
                             "completer consumes PCA bases)")
    parser.add_argument("--aug-rotations", type=int, default=2,
                        help="random y-rotations of the pseudo-3D per step "
                             "(reference: 2, train_occlusion_models.py:213-"
                             "296); more widens orientation coverage "
                             "against completer overfitting")
    parser.add_argument("--aug-input-noise", type=float, default=0.0,
                        help="Gaussian jitter on the completers' INPUT "
                             "slices only (targets stay clean) — denoising "
                             "regularization against memorizing the frozen "
                             "lifters' pseudo-3D; units = the root-centered "
                             "reconstruction space (pose extent ~2-4)")
    parser.add_argument("--weight-decay", type=float, default=None,
                        help="override Adam weight decay for this stage "
                             "(reference: 1e-5 everywhere)")
    parser.add_argument(
        "--select-by", choices=["pa", "mse"], default="pa",
        help="best-checkpoint selection criterion: 'pa' = mean GT-3D "
             "scenario PA-MPJPE (uses test-set 3D GT for selection only); "
             "'mse' = held-out completer MSE against the frozen lifters' "
             "pseudo-3D — the training signal itself on the validation "
             "split, keeping selection GT-free (RESULTS.md compares the "
             "PA cost). Both are logged every validation epoch regardless")
    C.add_lifter_flags(parser)
    C.add_common_flags(parser)
    C.add_lr_pt_flags(parser)
    C.add_use_best_flag(parser)
    args = parser.parse_args(argv)
    C.maybe_init_distributed(args)

    import dataclasses

    cfg = C.resolve_cfg(args, OcclusionTrainConfig(
        depth=args.translation, n_rot=args.aug_rotations,
        input_noise=args.aug_input_noise))
    if args.weight_decay is not None:
        cfg = dataclasses.replace(
            cfg, optim=dataclasses.replace(cfg.optim,
                                           weight_decay=args.weight_decay))
    train_data, test_data, n_train, packed = C.load_train_test_or_packed(args)

    lifters = C.load_all_lifters(args)

    logger = C.make_logger(args, "occlusion_models")
    # the reference's only use of -n is the wandb run name (:44-47)
    logger.set_config({"num_bases": args.num_bases})
    key = C.key_from_seed(args.seed)
    key, k_init = jax.random.split(key)
    completers = models.init_all_completers(k_init)

    steps_per_epoch = n_train // cfg.batch_size
    optimizer = make_optimizer(cfg.optim, steps_per_epoch)
    step = build_occlusion_step(lifters["legs"], lifters["torso"], optimizer, cfg)
    state = init_state(completers, optimizer)

    _, epoch_fn, data2d, (test2d, test3d) = C.train_feed(
        args, cfg, step, train_data, packed,
        test_data.poses_2d, test_data.poses_3d,
    )
    C.clear_stage_artifacts(args, "occlusion", [C.OCCLUSION])
    state, key, start_epoch = C.maybe_resume(args, "occlusion", state, key)
    best = C.BestTracker("val_mse" if args.select_by == "mse"
                         else "pa_scenario_mean", deferred=True)
    # fixed SEED-INDEPENDENT key: the MSE criterion's rotation draw must
    # be comparable across epochs and seeds (same rule as the lifters)
    val_key = jax.random.PRNGKey(20_000)
    if args.resume:
        # unconditional on the run checkpoint existing: a crash before the
        # first --save-every boundary leaves start_epoch=0 but a valid
        # <name>_best that must still seed the bar (ADVICE r1)
        best.maybe_restore(args, C.OCCLUSION)

    timer = C.EpochTimer().start()
    epochs_run = 0
    for epoch in range(start_epoch, cfg.n_epochs):
        key, sub = jax.random.split(key)
        with timer.section("step"):
            state, losses = epoch_fn(state, data2d, sub)
            rec = {k: float(v) for k, v in jax.device_get(losses).items()}
        epochs_run += 1
        msg = f"epoch {epoch}: loss={rec['loss']:.4f}"
        if C.due(args, epoch, cfg.n_epochs, "validate_every"):
            with timer.section("validate"):
                val = {k: float(v) for k, v in jax.device_get(
                       _validate(state.params, lifters, test2d, test3d,
                                 depth=cfg.depth)).items()}
                rec.update(val)
                rec.update({k: float(v) for k, v in jax.device_get(
                    _validate_unsup(state.params, lifters, test2d, val_key,
                                    depth=cfg.depth)).items()})
            # completers overfit the frozen lifters' pseudo-3D; track the
            # best mean scenario PA like the lifter stages track theirs.
            # Mean over the validation scenarios only — scanning the merged
            # rec would pick up any future pa_* training loss (ADVICE r1)
            pa_keys = [k for k in val if k.startswith("pa_")]
            rec["pa_scenario_mean"] = sum(val[k] for k in pa_keys) / len(pa_keys)
            with timer.section("checkpoint"):
                if best.update(args, epoch, rec, {C.OCCLUSION: state.params},
                               async_save=True):
                    msg += " [best]"
            msg += (f" pa_left={rec['pa_left']:.2f}"
                    f" pa_torso={rec['pa_torso']:.2f}")
        rec["epoch"] = epoch
        logger.log(rec, step=epoch)
        print(msg)
        if C.due(args, epoch, cfg.n_epochs, "save_every"):
            with timer.section("checkpoint"):
                best.flush(args)
                # consumer-facing params artifact only on completion —
                # see the stage-3a twin: mid-run it duplicates run-
                # checkpoint bytes over the 27 MB/s tunnel D2H
                if epoch + 1 == cfg.n_epochs:
                    C.save_params(args, C.OCCLUSION, state.params,
                                  async_save=True)
                C.save_run(args, "occlusion", state, key, epoch + 1,
                           async_save=True)
    from links_tpu import ckpt as _ckpt

    with timer.section("checkpoint"):
        best.flush(args)
        _ckpt.wait_for_saves()
    timer.report(epochs_run * steps_per_epoch * cfg.batch_size, logger)

    if args.save_pt:
        from links_tpu import ckpt

        names = {  # reference file names (train_occlusion_models.py:563-570)
            "left_leg": "left_leg_estimator.pt", "right_leg": "right_leg_estimator.pt",
            "both_legs": "both_legs_estimator.pt", "left_side": "left_side_estimator.pt",
            "right_side": "right_side_estimator.pt", "right_arm": "right_arm_estimator.pt",
            "left_arm": "left_arm_estimator.pt", "torso": "torso_estimator.pt",
        }
        out_dir = C.artifact(args, "occlusion_model_weights")
        out_dir.mkdir(parents=True, exist_ok=True)
        for k, fname in names.items():
            ckpt.save_pt(out_dir / fname, ckpt.completer_to_torch(state.params[k]))
    logger.close()
    return state


if __name__ == "__main__":
    main()
