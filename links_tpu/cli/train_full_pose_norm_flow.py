"""Stage 1 — train the full-pose 2D normalizing flow used for generative
sampling (reference train_full_pose_norm_flow.py; its dataloader lines are
commented out there — restored here per SURVEY.md §7.3).

Usage:
    python -m links_tpu.cli.train_full_pose_norm_flow --data data/h36m_data.pkl
"""

from __future__ import annotations

import argparse

import jax

from links_tpu import ckpt, flows
from links_tpu.cli import _common as C
from links_tpu.config import FlowTrainConfig
from links_tpu.train import (
    build_full_flow_step,
    init_state,
    make_optimizer,
)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train 2D INN")
    # reference flag (train_full_pose_norm_flow.py:22-23)
    parser.add_argument("-n", "--num_keypoints", type=int, default=34,
                        help="number of keypoints")
    C.add_common_flags(parser)
    args = parser.parse_args(argv)
    C.maybe_init_distributed(args)

    cfg = C.resolve_cfg(args, FlowTrainConfig(num_keypoints=args.num_keypoints))
    train_data, _, n_train, packed = C.load_train_test_or_packed(args)
    logger = C.make_logger(args, "full_pose_norm_flow")
    logger.set_config({"learning_rate": cfg.optim.learning_rate,
                       "BATCH_SIZE": cfg.batch_size, "N_epochs": cfg.n_epochs,
                       "num_keypoints": cfg.num_keypoints})

    key = C.key_from_seed(args.seed)
    key, k_init = jax.random.split(key)
    flow = flows.init_flow(k_init, cfg.num_keypoints)

    steps_per_epoch = n_train // cfg.batch_size
    optimizer = make_optimizer(cfg.optim, steps_per_epoch)
    state = init_state(flow.params, optimizer)
    C.clear_stage_artifacts(args, "full_flow", [C.FULL_FLOW])
    state, key, start_epoch = C.maybe_resume(args, "full_flow", state, key)
    if start_epoch and C.artifact(args, C.FULL_FLOW).exists():
        # The SO(D) mixing perms are seed-derived, not in the run
        # checkpoint; a resumed run must pair the restored params with the
        # SAVED perms (resuming under a different --seed would otherwise
        # silently rebuild different orthogonal matrices).
        flow = flows.Flow(flow.params, C.load_flow(args, C.FULL_FLOW).perm)
    step = build_full_flow_step(flow.perm, optimizer, cfg)

    _, epoch_fn, data2d, _ = C.train_feed(args, cfg, step, train_data, packed)

    timer = C.EpochTimer().start()
    epochs_run = 0
    for epoch in range(start_epoch, cfg.n_epochs):
        key, sub = jax.random.split(key)
        with timer.section("step"):
            state, losses = epoch_fn(state, data2d, sub)
            rec = {k: float(v) for k, v in jax.device_get(losses).items()}
        epochs_run += 1
        rec["epoch"] = epoch
        logger.log(rec, step=epoch)
        print(f"epoch {epoch}: " + " ".join(f"{k}={v:.4f}" for k, v in rec.items()
                                            if k != "epoch"))
        # reference saves per epoch (:115); --save-every relaxes that
        if C.due(args, epoch, cfg.n_epochs, "save_every"):
            with timer.section("checkpoint"):
                C.save_flow(args, C.FULL_FLOW,
                            flows.Flow(state.params, flow.perm),
                            async_save=True)
                C.save_run(args, "full_flow", state, key, epoch + 1,
                           async_save=True)
    with timer.section("checkpoint"):
        ckpt.wait_for_saves()
    timer.report(epochs_run * steps_per_epoch * cfg.batch_size, logger)
    logger.close()
    return state


if __name__ == "__main__":
    main()
