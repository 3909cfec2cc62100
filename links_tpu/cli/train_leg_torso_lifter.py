"""Stage 3b — train the legs/torso lifters, unsupervised (reference
train_leg_torso_lifter.py; its dead left/right-lifter freeze lines at
:69-73 are dropped per SURVEY.md §7.3). Validation adds PCK and AUC
(train_leg_torso_lifter.py:331-337).

Usage:
    python -m links_tpu.cli.train_leg_torso_lifter --data data/h36m_data.pkl
"""

from __future__ import annotations

import argparse
from functools import partial

import jax

from links_tpu import metrics, models
from links_tpu.cli import _common as C
from links_tpu.config import LifterTrainConfig
from links_tpu.core.skeleton import BONE_RELATIONS_MEAN_H36M
from links_tpu.objectives import LifterFrozen, leg_torso_loss, lift_leg_torso_eval
from links_tpu.train import (
    build_leg_torso_step,
    init_state,
    make_optimizer,
)


@partial(jax.jit, static_argnames=("depth",))
def _validate(params, test_2d, test_3d, depth: float = 10.0):
    """train_leg_torso_lifter.py:286-337 on device."""
    pred = lift_leg_torso_eval(params["legs"], params["torso"], test_2d, depth)
    return {
        "pa": metrics.pa_mpjpe(test_3d, pred).mean(),
        "mpjpe_scaled": metrics.n_mpjpe(test_3d, pred, num_joints=17,
                                        root_joint=0).mean(),
        "auc": metrics.auc(test_3d, pred, num_joints=17, root_joint=0),
        "pck": metrics.pck(test_3d, pred, num_joints=17, root_joint=0),
        # unsupervised depth-flip alarm: negative = un-flipped mode
        # (metrics.depth_tilt_score; gates --select-by nll-tilt)
        "val_tilt": metrics.depth_tilt_score(pred),
    }


@partial(jax.jit, static_argnames=("cfg",))
def _validate_unsup(params, frozen, bone_means, test_2d, key, cfg):
    """Unsupervised validation criterion — see the stage-3a twin
    (train_left_right_lifter._validate_unsup): the stage objective on the
    validation split with a fixed rotation key; enables --select-by nll."""
    n2 = (test_2d.shape[0] // 2) * 2
    loss, aux = leg_torso_loss(params["legs"], params["torso"], frozen,
                               test_2d[:n2], key, cfg,
                               bone_relations_mean=bone_means)
    return {"val_nll": aux["likeli"], "val_unsup_loss": loss}


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train 2D INN with PCA")
    C.add_lifter_flags(parser)
    parser.add_argument("--bone-means", choices=["h36m", "mpi_vnect_interesting", "data"],
                        default="h36m",
                        help="bone-relation prior; the reference file defaults "
                             "to the MPI means (train_leg_torso_lifter.py:97) "
                             "but H36M training wants the H36M means")
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
        part_a=C.load_flow(args, C.FLOW_LEGS),
        part_b=C.load_flow(args, C.FLOW_TORSO),
    )
    bone_means = None  # objective default = MPI vnect interesting
    if args.bone_means == "data":
        if train_data is None:
            raise SystemExit(
                "--bone-means data needs the train split's 3D GT, which an "
                "existing --packed-data pack does not carry (it holds only "
                "2D poses); pass explicit means or drop --packed-data")
        bone_means = C.bone_means_from_data(train_data)
    elif args.bone_means == "h36m":
        import jax.numpy as jnp

        bone_means = jnp.asarray(BONE_RELATIONS_MEAN_H36M, jnp.float32)

    logger = C.make_logger(args, "leg_torso_lifter")
    logger.set_config({"learning_rate": cfg.optim.learning_rate,
                       "BATCH_SIZE": cfg.batch_size, "N_epochs": cfg.n_epochs,
                       "weight_bl": cfg.weight_bl, "depth": cfg.depth,
                       "use_elevation": cfg.use_elevation})
    key = C.key_from_seed(args.seed)
    key, k_leg, k_torso = jax.random.split(key, 3)
    params = {
        "legs": models.init_lifter(k_leg, models.LEG_JOINTS),
        "torso": models.init_lifter(k_torso, models.TORSO_JOINTS),
    }

    steps_per_epoch = n_train // cfg.batch_size
    optimizer = make_optimizer(cfg.optim, steps_per_epoch)
    step = build_leg_torso_step(frozen, optimizer, cfg, bone_means)
    state = init_state(params, optimizer)

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
    C.clear_stage_artifacts(args, "leg_torso",
                            [C.LIFTER_LEGS, C.LIFTER_TORSO])
    state, key, start_epoch = C.maybe_resume(args, "leg_torso", state, key)
    best = C.BestTracker(C.select_metric(args, "pa"),
                         gate_metric=C.select_gate(args), deferred=True)
    guard = C.FlipGuard(args.flip_guard)
    # seed-independent: cross-seed comparable (see the stage-3a twin)
    val_key = jax.random.PRNGKey(20_000)
    if args.resume:
        # unconditional on the run checkpoint existing: a crash before the
        # first --save-every boundary leaves start_epoch=0 but a valid
        # <name>_best that must still seed the bar (ADVICE r1)
        best.maybe_restore(args, C.LIFTER_LEGS)

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
                rec.update({k: float(v) for k, v in jax.device_get(
                    _validate_unsup(state.params, frozen_v,
                                    bone_means_v, test2d, val_key,
                                    cfg)).items()})
            with timer.section("checkpoint"):
                if best.update(args, epoch, rec,
                               {C.LIFTER_LEGS: state.params["legs"],
                                C.LIFTER_TORSO: state.params["torso"]},
                               async_save=True):
                    msg += " [best]"
            msg += (f" pa={rec['pa']:.2f} n-mpjpe={rec['mpjpe_scaled']:.2f}"
                    f" pck={rec['pck']:.2f}")
        stop = guard.update(epoch, rec)
        if stop:
            rec["flip_guard_stop"] = 1.0
        rec["epoch"] = epoch
        logger.log(rec, step=epoch)
        print(msg)
        if stop or C.due(args, epoch, cfg.n_epochs, "save_every"):
            with timer.section("checkpoint"):
                best.flush(args)
                # consumer-facing params artifacts only on completion —
                # see the stage-3a twin: mid-run they duplicate run-
                # checkpoint bytes over the 27 MB/s tunnel D2H
                if stop or epoch + 1 == cfg.n_epochs:
                    C.save_params(args, C.LIFTER_LEGS,
                                  state.params["legs"], async_save=True)
                    C.save_params(args, C.LIFTER_TORSO,
                                  state.params["torso"], async_save=True)
                C.save_run(args, "leg_torso", state, key, epoch + 1,
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
    if args.save_pt:
        from links_tpu import ckpt

        ckpt.save_pt(C.artifact(args, "leg_lifter.pt"),
                     ckpt.lifter_to_torch(state.params["legs"]))
        ckpt.save_pt(C.artifact(args, "torso_lifter.pt"),
                     ckpt.lifter_to_torch(state.params["torso"]))
    logger.close()
    return state


if __name__ == "__main__":
    main()
