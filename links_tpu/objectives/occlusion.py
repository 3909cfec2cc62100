"""Occlusion-completion objective — stage 4 (train_occlusion_models.py:144-307).

The frozen leg+torso lifters produce pseudo-3D poses from the 2D batch; each
of the 8 completers infills a hidden part from the complementary joints; MSE
losses are summed over three orientations (identity + two cumulative random
y-rotations).

TPU design: the reference runs 8 independent model forwards (×3 passes)
sequentially. Here the completers run as three vmapped groups —
4 limb predictors (42→9), the {both_legs,left_side,right_side} group
(33→18), and the torso predictor (21→30) — and the 3 orientation passes are
a batched rotation (poses stacked on an orientation axis), so the whole
stage is a handful of large MXU matmuls per step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from links_tpu.core import nn
from links_tpu.core.geometry import PI, rotation_about_y
from links_tpu.core.skeleton import split_data_left_right_3d, split_data_legs_torso
from links_tpu.models import completer_apply, lifter_apply

LIMB_GROUP = ("left_arm", "right_arm", "left_leg", "right_leg")
SIDE_GROUP = ("both_legs", "left_side", "right_side")


def pseudo_3d_from_lifters(leg_params, torso_params, poses_2d, depth: float = 10.0,
                           policy: nn.Policy = nn.F32):
    """Frozen leg+torso lifters → root-centered pseudo-3D (B,3,17)
    (train_occlusion_models.py:150-174; note: no depth clamp here)."""
    legs_split, torso_split = split_data_legs_torso(poses_2d)
    legs_pred, _ = lifter_apply(leg_params, legs_split, policy)
    torso_pred, _ = lifter_apply(torso_params, torso_split, policy)
    pred = jnp.concatenate([legs_pred, torso_pred], axis=1).at[:, 0].set(0.0)
    pred_depth = pred + depth
    p2 = poses_2d.reshape(-1, 2, 17)
    pose = jnp.concatenate([p2 * pred_depth[:, None, :], pred_depth[:, None, :]], axis=1)
    return pose - pose[:, :, 0:1]


def part_targets(pose_3d):
    """The 8 completer regression targets (train_occlusion_models.py:176-183).
    pose_3d: (..., 3, 17)."""
    p = pose_3d
    return {
        "left_arm": p[..., :, 11:14].reshape(*p.shape[:-2], 9),
        "right_arm": p[..., :, 14:].reshape(*p.shape[:-2], 9),
        "left_leg": p[..., :, 4:7].reshape(*p.shape[:-2], 9),
        "right_leg": p[..., :, 1:4].reshape(*p.shape[:-2], 9),
        "left_side": jnp.concatenate([p[..., :, 4:7], p[..., :, 11:14]], axis=-1
                                     ).reshape(*p.shape[:-2], 18),
        "right_side": jnp.concatenate([p[..., :, 1:4], p[..., :, 14:]], axis=-1
                                      ).reshape(*p.shape[:-2], 18),
        "both_legs": p[..., :, 1:7].reshape(*p.shape[:-2], 18),
        "torso": p[..., :, 7:].reshape(*p.shape[:-2], 30),
    }


def part_inputs(pose_3d):
    """The 8 complementary completer inputs (train_occlusion_models.py:185-191)."""
    p = pose_3d
    lead = p.shape[:-2]
    no_right_side, no_left_side = split_data_left_right_3d(p)
    return {
        "left_arm": jnp.concatenate([p[..., :, :11], p[..., :, 14:]], axis=-1
                                    ).reshape(*lead, 42),
        "right_arm": p[..., :, :14].reshape(*lead, 42),
        "left_leg": jnp.concatenate([p[..., :, :4], p[..., :, 7:]], axis=-1
                                    ).reshape(*lead, 42),
        "right_leg": jnp.concatenate([p[..., :, :1], p[..., :, 4:]], axis=-1
                                     ).reshape(*lead, 42),
        "torso": p[..., :, :7].reshape(*lead, 21),
        "both_legs": jnp.concatenate([p[..., :, :1], p[..., :, 7:]], axis=-1
                                     ).reshape(*lead, 33),
        # the left-side predictor sees the pose *without* its left side
        # (= the right split) and vice versa (train_occlusion_models.py:191,199-200)
        "left_side": no_left_side.reshape(*lead, 33),
        "right_side": no_right_side.reshape(*lead, 33),
    }


def _group_apply(completers, names, x_by_name, policy):
    """vmap a same-shaped completer group over stacked params+inputs."""
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *[completers[n] for n in names])
    xs = jnp.stack([x_by_name[n] for n in names])
    return jax.vmap(lambda p, x: completer_apply(p, x, policy))(stacked, xs)


def completer_losses(completers, pose_3d, policy: nn.Policy = nn.F32):
    """Per-completer MSE (squared error summed over dims, meaned over batch;
    train_occlusion_models.py:203-210) for one orientation."""
    inputs = part_inputs(pose_3d)
    targets = part_targets(pose_3d)
    losses = {}
    limb_out = _group_apply(completers, LIMB_GROUP, inputs, policy)
    for i, name in enumerate(LIMB_GROUP):
        losses[name] = ((limb_out[i] - targets[name]) ** 2).sum(axis=1).mean()
    side_out = _group_apply(completers, SIDE_GROUP, inputs, policy)
    for i, name in enumerate(SIDE_GROUP):
        losses[name] = ((side_out[i] - targets[name]) ** 2).sum(axis=1).mean()
    torso_out = completer_apply(completers["torso"], inputs["torso"], policy)
    losses["torso"] = ((torso_out - targets["torso"]) ** 2).sum(axis=1).mean()
    return losses


def occlusion_loss(completers, pose_3d, key, policy: nn.Policy = nn.F32):
    """Full stage-4 loss: MSE over identity + two cumulative random
    y-rotations (train_occlusion_models.py:213-296). Returns (loss, aux)
    with the reference's `threed_loss_*` keys."""
    k1, k2 = jax.random.split(key)
    n = pose_3d.shape[0]
    total = completer_losses(completers, pose_3d, policy)
    for k in (k1, k2):
        y_ang = (jax.random.uniform(k, (n, 1)) - 0.5) * 1.99 * PI
        ry = rotation_about_y(y_ang)
        pose_3d = jnp.matmul(ry, pose_3d, precision="highest")
        step = completer_losses(completers, pose_3d, policy)
        total = {name: total[name] + step[name] for name in total}
    aux = {f"threed_loss_{name}": v for name, v in total.items()}
    loss = sum(total.values())
    aux["loss"] = loss
    return loss, aux
