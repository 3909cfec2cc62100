"""Stage 1 — train the full-pose 2D normalizing flow used for generative
sampling (reference train_full_pose_norm_flow.py; its dataloader lines are
commented out there — restored here per SURVEY.md §7.3).

Usage:
    python -m links_tpu.cli.train_full_pose_norm_flow --data data/h36m_data.pkl
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp

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
    parser.add_argument("--packed-data", default=None,
                        help="stream train batches from a packed LNKS file "
                             "through the native C++ loader (the "
                             "larger-than-HBM path; data/native_loader.py). "
                             "Packed from --data on first use.")
    C.add_common_flags(parser)
    args = parser.parse_args(argv)
    C.maybe_init_distributed(args)

    cfg = C.resolve_cfg(args, FlowTrainConfig(num_keypoints=args.num_keypoints))
    packed_path = Path(args.packed_data) if args.packed_data else None
    packed = None
    if packed_path is not None and packed_path.exists():
        # larger-than-HBM route: the training set stays on disk (pack it
        # offline with `links-pack`); never load/normalize/shard it onto
        # the device — that was the entire point of the streaming feed
        from links_tpu.data import native_loader

        train_data = None
        packed = native_loader.PackedDataset(packed_path)
        n_train = packed.n_rows
    else:
        train_data, _ = C.load_train_test(args)
        n_train = len(train_data)
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
    state, key, start_epoch = C.maybe_resume(args, "full_flow", state, key)
    if start_epoch and C.artifact(args, C.FULL_FLOW).exists():
        # The SO(D) mixing perms are seed-derived, not in the run
        # checkpoint; a resumed run must pair the restored params with the
        # SAVED perms (resuming under a different --seed would otherwise
        # silently rebuild different orthogonal matrices).
        flow = flows.Flow(flow.params, C.load_flow(args, C.FULL_FLOW).perm)
    step = build_full_flow_step(flow.perm, optimizer, cfg)

    if args.packed_data:
        from links_tpu.train import parallel

        mesh = parallel.make_mesh(args.num_devices)
        # placeholder carry — the packed feed streams its own batches
        data2d = jnp.zeros((0, cfg.num_keypoints), jnp.float32)
        epoch_fn = _packed_epoch_fn(args, cfg, step, train_data, mesh, packed)
    else:
        mesh, (data2d,) = C.mesh_and_shard(args, train_data.poses_2d)
        epoch_fn = dp_epoch_fn(step, cfg.batch_size, mesh)

    for epoch in range(start_epoch, cfg.n_epochs):
        key, sub = jax.random.split(key)
        state, losses = epoch_fn(state, data2d, sub)
        rec = {k: float(v) for k, v in losses.items()}
        rec["epoch"] = epoch
        logger.log(rec, step=epoch)
        print(f"epoch {epoch}: " + " ".join(f"{k}={v:.4f}" for k, v in rec.items()
                                            if k != "epoch"))
        # reference saves per epoch (:115); --save-every relaxes that
        if C.due(args, epoch, cfg.n_epochs, "save_every"):
            C.save_flow(args, C.FULL_FLOW, flows.Flow(state.params, flow.perm))
            C.save_run(args, "full_flow", state, key, epoch + 1)
    logger.close()
    return state


def _packed_epoch_fn(args, cfg, step, train_data, mesh, packed=None):
    """Epoch driver streaming host batches from the native packed loader
    (larger-than-HBM datasets): the C++ thread pool gathers each shuffled
    batch while the device runs the previous step. Same step function and
    mesh sharding as the device-resident scan; only the feed differs.

    ``packed``: an already-open PackedDataset (main opens it without ever
    touching the device when the file exists); when None, the file is
    packed from the in-memory ``train_data`` on first use."""
    from pathlib import Path

    import jax.numpy as jnp
    import numpy as np

    from links_tpu.data import native_loader
    from links_tpu.train import parallel

    if packed is None:
        ppath = Path(args.packed_data)
        if not ppath.exists():
            ppath.parent.mkdir(parents=True, exist_ok=True)
            native_loader.pack_dataset(ppath, np.asarray(train_data.poses_2d))
        packed = native_loader.PackedDataset(ppath)
    if packed.n_rows < cfg.batch_size:
        raise ValueError(
            f"packed dataset has {packed.n_rows} rows < batch {cfg.batch_size}")
    dp_step = parallel.dp_jit_step(step, mesh)

    def _shuffle_seed(key):
        # resumed keys are typed (0-d); fresh PRNGKey(seed) keys are (2,)
        raw = jax.random.key_data(key) if key.ndim == 0 else key
        return int(np.asarray(raw).ravel()[-1]) & 0x7FFFFFFF

    def epoch_fn(state, _unused_device_data, key):
        total, nb = None, 0
        for batch in packed.epoch_batches(cfg.batch_size, _shuffle_seed(key)):
            key, sub = jax.random.split(key)
            sharded = parallel.shard_batch(jnp.asarray(batch), mesh)
            state, losses = dp_step(state, sharded, sub)
            total = losses if total is None else jax.tree.map(
                jnp.add, total, losses)
            nb += 1
        # epoch mean, matching the dp_epoch_fn scan's aux mean
        return state, jax.tree.map(lambda v: v / nb, total)

    return epoch_fn


if __name__ == "__main__":
    main()
