"""Stage 3a — train the left/right side lifters, unsupervised (reference
train_left_right_lifter.py). Both lifters are a single stacked pytree
trained by one fused step; validation computes PA-MPJPE (reflection='best')
and N-MPJPE on-device over the whole test set each epoch.

Usage:
    python -m links_tpu.cli.train_left_right_lifter --data data/h36m_data.pkl \\
        -b 50 -t 10 -r 1 -o 1 -v 1 -l 1
"""

from __future__ import annotations

import argparse
from functools import partial

import jax
import jax.numpy as jnp

from links_tpu import metrics, models
from links_tpu.cli import _common as C
from links_tpu.config import LifterTrainConfig
from links_tpu.objectives import (
    LifterFrozen,
    left_right_loss,
    lift_left_right_eval,
)
from links_tpu.train import (
    build_left_right_step,
    init_state,
    make_optimizer,
)


@partial(jax.jit, static_argnames=("depth",))
def _validate(stacked_params, test_2d, test_3d, depth: float = 10.0):
    """Reference validation_step (train_left_right_lifter.py:437-499), the
    per-sample numpy Procrustes loop replaced by one batched device SVD."""
    out = {}
    tilt = 0.0
    for choice in ("left", "right"):
        pred = lift_left_right_eval(stacked_params, test_2d, depth, choice)
        out[f"pa_{choice}"] = metrics.pa_mpjpe(test_3d, pred).mean()
        out[f"mpjpe_scaled_{choice}"] = metrics.n_mpjpe(
            test_3d, pred, num_joints=17, root_joint=0
        ).mean()
        tilt = tilt + metrics.depth_tilt_score(pred)
    # unsupervised depth-flip alarm: negative = un-flipped mode
    # (metrics.depth_tilt_score; gates --select-by nll-tilt)
    out["val_tilt"] = tilt / 2.0
    return out


@partial(jax.jit, static_argnames=("cfg",))
def _validate_unsup(stacked_params, frozen, bone_means, test_2d, key, cfg):
    """Unsupervised validation criterion: the stage's own five-loss
    objective evaluated on the *validation* split with a fixed rotation key
    — no GT 3D involved. ``val_nll`` is the part-flow NLL of the rotated
    reprojections (the likeli term); ``val_unsup_loss`` the full weighted
    sum. Logged every validation epoch so checkpoint selection can be
    end-to-end unsupervised (``--select-by nll``); RESULTS.md compares it
    against GT-PA selection."""
    n2 = (test_2d.shape[0] // 2) * 2  # pairwise-deformation needs even n
    loss, aux = left_right_loss(stacked_params, frozen, test_2d[:n2], key,
                                cfg, bone_relations_mean=bone_means)
    return {"val_nll": aux["likeli"], "val_unsup_loss": loss}


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train 2D INN with PCA")
    C.add_lifter_flags(parser)
    parser.add_argument("--bone-means",
                        choices=["h36m", "mpi_vnect_interesting", "data"],
                        default="h36m",
                        help="bone-relation prior means "
                             "(train_left_right_lifter.py:76-94); 'data' "
                             "computes them from the train set's 3D GT")
    parser.add_argument("--attention", action="store_true",
                        help="train the 2-head attention lifter variant "
                             "(models/attention.py) instead of the MLP — "
                             "the reference's undefined "
                             "Attention_Left_Right_Lifter(num_heads=2) "
                             "(train_left_right_lifter.py:67-68) supplied "
                             "for real; downstream stages work unchanged "
                             "(lifter_apply dispatches on the checkpoint's "
                             "param structure)")
    C.add_select_by_flag(parser)
    C.add_flip_guard_flag(parser)
    C.add_common_flags(parser, bf16_opt_state_default=True,
                       nll_cap_default=500.0)
    args = parser.parse_args(argv)
    C.maybe_init_distributed(args)

    cfg = C.resolve_cfg(args, LifterTrainConfig(
        weight_bl=args.bl, depth=args.translation, weight_2d=args.rep2d,
        weight_3d=args.rot3d, weight_velocity=args.velocity,
        weight_likeli=args.likelihood,
    ))
    train_data, test_data, n_train, packed = C.load_train_test_or_packed(args)
    frozen = LifterFrozen(
        full_flow=C.load_flow(args, C.FULL_FLOW),
        part_a=C.load_flow(args, C.FLOW_LEFT),
        part_b=C.load_flow(args, C.FLOW_RIGHT),
    )
    logger = C.make_logger(args, "left_right_lifter")
    logger.set_config({"learning_rate": cfg.optim.learning_rate,
                       "BATCH_SIZE": cfg.batch_size, "N_epochs": cfg.n_epochs,
                       "weight_bl": cfg.weight_bl, "depth": cfg.depth,
                       "use_elevation": cfg.use_elevation})

    key = C.key_from_seed(args.seed)
    key, kl, kr = jax.random.split(key, 3)
    init_fn = (models.init_attention_lifter if args.attention
               else models.init_lifter)
    stacked = jax.tree.map(
        lambda a, b: jnp.stack([a, b]),
        init_fn(kl, models.SIDE_JOINTS),
        init_fn(kr, models.SIDE_JOINTS),
    )

    bone_means = None  # objective default = H36M means
    if args.bone_means == "mpi_vnect_interesting":
        from links_tpu.core.skeleton import (
            BONE_RELATIONS_MEAN_MPI_VNECT_INTERESTING,
        )

        bone_means = jnp.asarray(BONE_RELATIONS_MEAN_MPI_VNECT_INTERESTING,
                                 jnp.float32)
    elif args.bone_means == "data":
        if train_data is None:
            raise SystemExit(
                "--bone-means data needs the train split's 3D GT, which an "
                "existing --packed-data pack does not carry (it holds only "
                "2D poses); pass explicit means or drop --packed-data")
        bone_means = C.bone_means_from_data(train_data)

    steps_per_epoch = n_train // cfg.batch_size
    optimizer = make_optimizer(cfg.optim, steps_per_epoch)
    step = build_left_right_step(frozen, optimizer, cfg, bone_means)
    state = init_state(stacked, optimizer)

    mesh, epoch_fn, data2d, (test2d, test3d) = C.train_feed(
        args, cfg, step, train_data, packed,
        test_data.poses_2d, test_data.poses_3d,
    )
    # _validate_unsup mixes these with the mesh-replicated train state in
    # one jit — they must live on the same devices, not just device 0
    from links_tpu.train import parallel

    frozen_v = parallel.replicate(frozen, mesh)
    bone_means_v = (None if bone_means is None
                    else parallel.replicate(bone_means, mesh))
    C.clear_stage_artifacts(args, "left_right", [C.LIFTER_LR])
    state, key, start_epoch = C.maybe_resume(args, "left_right", state, key)
    best = C.BestTracker(C.select_metric(args, "pa_mean"),
                         gate_metric=C.select_gate(args), deferred=True)
    guard = C.FlipGuard(args.flip_guard)
    # fixed SEED-INDEPENDENT key: the unsupervised validation criterion
    # must be comparable across epochs AND across seeds — the pipeline's
    # --lifter-seeds sweep picks a winner on it (deriving it from --seed
    # would attribute rotation-draw noise to model quality)
    val_key = jax.random.PRNGKey(20_000)
    if args.resume:
        # unconditional on the run checkpoint existing: a crash before the
        # first --save-every boundary leaves start_epoch=0 but a valid
        # <name>_best that must still seed the bar (ADVICE r1)
        best.maybe_restore(args, C.LIFTER_LR)

    timer = C.EpochTimer().start()
    epochs_run = 0
    for epoch in range(start_epoch, cfg.n_epochs):
        key, sub = jax.random.split(key)
        with timer.section("step"):
            state, losses = epoch_fn(state, data2d, sub)
            # one batched D2H instead of one tunnel round trip per key
            rec = {k: float(v) for k, v in jax.device_get(losses).items()}
        epochs_run += 1
        msg = f"epoch {epoch}: loss={rec['loss']:.4f}"
        if C.due(args, epoch, cfg.n_epochs, "validate_every"):
            with timer.section("validate"):
                rec.update({k: float(v) for k, v in jax.device_get(
                    _validate(state.params, test2d, test3d,
                              depth=cfg.depth)).items()})
                rec["pa_mean"] = (rec["pa_left"] + rec["pa_right"]) / 2
                rec.update({k: float(v) for k, v in jax.device_get(
                    _validate_unsup(state.params, frozen_v,
                                    bone_means_v, test2d, val_key,
                                    cfg)).items()})
            with timer.section("checkpoint"):
                if best.update(args, epoch, rec,
                               {C.LIFTER_LR: state.params},
                               async_save=True):
                    msg += " [best]"
            msg += (f" pa_left={rec['pa_left']:.2f}"
                    f" pa_right={rec['pa_right']:.2f}"
                    f" n-mpjpe_l={rec['mpjpe_scaled_left']:.2f}")
        stop = guard.update(epoch, rec)
        if stop:
            rec["flip_guard_stop"] = 1.0
        rec["epoch"] = epoch
        logger.log(rec, step=epoch)
        print(msg)
        if stop or C.due(args, epoch, cfg.n_epochs, "save_every"):
            with timer.section("checkpoint"):
                best.flush(args)
                # the consumer-facing params artifact only on completion:
                # mid-run it duplicates a third of the run checkpoint's
                # bytes, and D2H on the tunneled chip (27 MB/s) is what
                # bounds delivered throughput (PERF.md "Delivered vs
                # benched"); a crash recovers through --resume instead
                if stop or epoch + 1 == cfg.n_epochs:
                    C.save_params(args, C.LIFTER_LR, state.params,
                                  async_save=True)
                C.save_run(args, "left_right", state, key, epoch + 1,
                           async_save=True)
        if stop:
            break
    with timer.section("checkpoint"):  # drain in-flight async writes
        from links_tpu import ckpt as _ckpt

        best.flush(args)
        _ckpt.wait_for_saves()
    timer.report(epochs_run * steps_per_epoch * cfg.batch_size, logger)

    if best.gate_metric and best.gated_out:
        print(f"[links_tpu] --select-by {args.select_by}: flip alarm vetoed "
              f"{best.gated_out} NLL-improving epoch(s) (val_tilt >= 0)"
              + ("; NO _best saved — the run looks depth-flipped throughout"
                 if best.epoch < 0 else ""))
    if args.save_pt and args.attention:
        print("[links_tpu] --save-pt skipped: the reference has no "
              "attention-lifter class to hold these weights")
    elif args.save_pt:
        from links_tpu import ckpt

        left = jax.tree.map(lambda a: a[0], state.params)
        right = jax.tree.map(lambda a: a[1], state.params)
        ckpt.save_pt(C.artifact(args, "left_side_lifter_final.pt"),
                     ckpt.lifter_to_torch(left))
        ckpt.save_pt(C.artifact(args, "right_side_lifter_final.pt"),
                     ckpt.lifter_to_torch(right))
    logger.close()
    return state


if __name__ == "__main__":
    main()
