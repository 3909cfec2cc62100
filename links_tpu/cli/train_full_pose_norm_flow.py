"""Stage 1 — train the full-pose 2D normalizing flow used for generative
sampling (reference train_full_pose_norm_flow.py; its dataloader lines are
commented out there — restored here per SURVEY.md §7.3).

Usage:
    python -m links_tpu.cli.train_full_pose_norm_flow --data data/h36m_data.pkl
"""

from __future__ import annotations

import argparse

import jax

from links_tpu import flows
from links_tpu.cli import _common as C
from links_tpu.config import FlowTrainConfig
from links_tpu.train import (
    build_full_flow_step,
    dp_epoch_fn,
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

    cfg = C.resolve_cfg(args, FlowTrainConfig(num_keypoints=args.num_keypoints))
    train_data, _ = C.load_train_test(args)
    logger = C.make_logger(args, "full_pose_norm_flow")
    logger.set_config({"learning_rate": cfg.optim.learning_rate,
                       "BATCH_SIZE": cfg.batch_size, "N_epochs": cfg.n_epochs,
                       "num_keypoints": cfg.num_keypoints})

    key = C.key_from_seed(args.seed)
    key, k_init = jax.random.split(key)
    flow = flows.init_flow(k_init, cfg.num_keypoints)

    steps_per_epoch = len(train_data) // cfg.batch_size
    optimizer = make_optimizer(cfg.optim, steps_per_epoch)
    step = build_full_flow_step(flow.perm, optimizer, cfg)
    state = init_state(flow.params, optimizer)

    mesh, (data2d,) = C.mesh_and_shard(args, train_data.poses_2d)
    epoch_fn = dp_epoch_fn(step, cfg.batch_size, mesh)
    state, key, start_epoch = C.maybe_resume(args, "full_flow", state, key)

    for epoch in range(start_epoch, cfg.n_epochs):
        key, sub = jax.random.split(key)
        state, losses = epoch_fn(state, data2d, sub)
        rec = {k: float(v) for k, v in losses.items()}
        rec["epoch"] = epoch
        logger.log(rec, step=epoch)
        print(f"epoch {epoch}: " + " ".join(f"{k}={v:.4f}" for k, v in rec.items()
                                            if k != "epoch"))
        # save every epoch (reference saves per epoch, :115)
        C.save_flow(args, C.FULL_FLOW, flows.Flow(state.params, flow.perm))
        C.save_run(args, "full_flow", state, key, epoch + 1)
    logger.close()
    return state


if __name__ == "__main__":
    main()
