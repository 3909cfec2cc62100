"""Stage 2 — train the four partial-pose flows (left/right sides, legs,
torso) on real splits + frozen-full-flow samples (reference
train_leg_torso_left_right_norm_flow.py).

Usage:
    python -m links_tpu.cli.train_part_norm_flows --data data/h36m_data.pkl
"""

from __future__ import annotations

import argparse

import jax

from links_tpu import ckpt, flows
from links_tpu.cli import _common as C
from links_tpu.config import PartFlowTrainConfig
from links_tpu.train import (
    build_part_flows_step,
    init_state,
    make_optimizer,
)

_NAMES = {"left": C.FLOW_LEFT, "right": C.FLOW_RIGHT,
          "legs": C.FLOW_LEGS, "torso": C.FLOW_TORSO}


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train 2D INN")
    # reference flag (train_leg_torso_left_right_norm_flow.py:28-29)
    parser.add_argument("-l", "--left_right_side_keypoints", type=int, default=22,
                        help="number of key-points in each split")
    C.add_common_flags(parser)
    args = parser.parse_args(argv)
    C.maybe_init_distributed(args)

    cfg = C.resolve_cfg(
        args, PartFlowTrainConfig(side_keypoints=args.left_right_side_keypoints)
    )
    train_data, _, n_train, packed = C.load_train_test_or_packed(args)
    full_flow = C.load_flow(args, C.FULL_FLOW)
    logger = C.make_logger(args, "part_norm_flows")

    key = C.key_from_seed(args.seed)
    keys = jax.random.split(key, 5)
    key = keys[0]
    dims = {"left": cfg.side_keypoints, "right": cfg.side_keypoints,
            "legs": cfg.leg_keypoints, "torso": cfg.torso_keypoints}
    part = {name: flows.init_flow(k, d)
            for (name, d), k in zip(dims.items(), keys[1:])}
    params = {n: f.params for n, f in part.items()}
    perms = {n: f.perm for n, f in part.items()}

    steps_per_epoch = n_train // cfg.batch_size
    optimizer = make_optimizer(cfg.optim, steps_per_epoch)
    state = init_state(params, optimizer)
    C.clear_stage_artifacts(args, "part_flows", list(_NAMES.values()))
    state, key, start_epoch = C.maybe_resume(args, "part_flows", state, key)
    if start_epoch:
        # seed-derived SO(D) perms are not in the run checkpoint; a resumed
        # run must pair restored params with the SAVED perms (see the same
        # guard in train_full_pose_norm_flow.py)
        for name, art in _NAMES.items():
            if C.artifact(args, art).exists():
                perms[name] = C.load_flow(args, art).perm
    step = build_part_flows_step(perms, full_flow, optimizer, cfg)

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
        print(f"epoch {epoch}: loss={rec['loss']:.4f}")
        if C.due(args, epoch, cfg.n_epochs, "save_every"):
            with timer.section("checkpoint"):
                for name, art in _NAMES.items():
                    C.save_flow(args, art,
                                flows.Flow(state.params[name], perms[name]),
                                async_save=True)
                C.save_run(args, "part_flows", state, key, epoch + 1,
                           async_save=True)
    with timer.section("checkpoint"):
        ckpt.wait_for_saves()
    timer.report(epochs_run * steps_per_epoch * cfg.batch_size, logger)
    logger.close()
    return state


if __name__ == "__main__":
    main()
