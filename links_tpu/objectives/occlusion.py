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


def completer_losses(completers, pose_3d, policy: nn.Policy = nn.F32,
                     input_pose_3d=None):
    """Per-completer MSE (squared error summed over dims, meaned over batch;
    train_occlusion_models.py:203-210) for one orientation.
    ``input_pose_3d`` optionally decouples the completers' INPUT view from
    the regression targets (both default to the same pose, the reference
    recipe) — the denoising-regularization knob of --aug-input-noise."""
    inputs = part_inputs(pose_3d if input_pose_3d is None else input_pose_3d)
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


def occlusion_validation_poses(completers, lifters, test_2d, depth: float = 10.0,
                               policy: nn.Policy = nn.F32, scenarios=None):
    """Reference validation scenario construction
    (train_occlusion_models.py:317-399): partial 3D poses are built from
    *different lifter combinations* (side lifters supply side poses; the
    leg/torso lifters supply part poses), each completer infills its part,
    and the merged full poses are translated back to the camera frame.

    ``lifters``: {'left','right','legs','torso'} param pytrees.
    Returns {scenario: (B, 51) camera-frame poses} for the 8 scenarios
    keyed la/ra/ll/rl/torso/legs/left/right (or the requested
    ``scenarios`` subset — only those completers run).

    All four lifter forwards and all 8 input tensors are traced regardless
    of ``scenarios``; only the returned dict is filtered. That is fine for
    every caller in this codebase — cli/eval_h36m.py and cli/lift.py wrap
    this under ``jax.jit``, where XLA dead-code-eliminates the lifts whose
    outputs are unused — but an eager single-scenario caller would pay for
    all four lifters; jit this function if you call it that way.
    """
    from links_tpu.core.skeleton import (
        combine_left_right_occluded_3d,
        combine_pose_and_limb,
        split_data_left_right,
    )

    left_split, right_split = split_data_left_right(test_2d)
    legs_split, torso_split = split_data_legs_torso(test_2d)

    legs_pred, _ = lifter_apply(lifters["legs"], legs_split, policy)
    torso_pred, _ = lifter_apply(lifters["torso"], torso_split, policy)
    left_pred, _ = lifter_apply(lifters["left"], left_split, policy)
    right_pred, _ = lifter_apply(lifters["right"], right_split, policy)

    left_pred = left_pred.at[:, 0].set(0.0) + depth
    right_pred = right_pred.at[:, 0].set(0.0) + depth
    pred_lt = jnp.concatenate([legs_pred, torso_pred], axis=1).at[:, 0].set(0.0) + depth

    def _to3d(split2d, d, nj):
        s = split2d.reshape(-1, 2, nj)
        return jnp.concatenate([s * d[:, None, :], d[:, None, :]], axis=1)

    p_legs = _to3d(legs_split, pred_lt[:, :7], 7)
    p_torso = _to3d(torso_split, pred_lt[:, 7:], 10)
    p_left = _to3d(left_split, left_pred, 11)
    p_right = _to3d(right_split, right_pred, 11)

    # root-centering (train_occlusion_models.py:360-363): torso uses the
    # legs' root (it has none of its own)
    p_torso = p_torso - p_legs[:, :, 0:1]
    p_legs = p_legs - p_legs[:, :, 0:1]
    p_left = p_left - p_left[:, :, 0:1]
    p_right = p_right - p_right[:, :, 0:1]

    inputs = {
        "la": jnp.concatenate([p_legs, p_right[:, :, 4:]], axis=2).reshape(-1, 42),
        "ra": jnp.concatenate([p_legs, p_left[:, :, 4:]], axis=2).reshape(-1, 42),
        "ll": jnp.concatenate([p_right[:, :, :4], p_torso], axis=2).reshape(-1, 42),
        "rl": jnp.concatenate([p_left[:, :, :4], p_torso], axis=2).reshape(-1, 42),
        "torso": p_legs.reshape(-1, 21),
        "legs": jnp.concatenate([p_legs[:, :, 0:1], p_torso], axis=2).reshape(-1, 33),
        "left": p_right.reshape(-1, 33),   # pose without its left side
        "right": p_left.reshape(-1, 33),
    }
    completer_of = {"la": "left_arm", "ra": "right_arm", "ll": "left_leg",
                    "rl": "right_leg", "torso": "torso", "legs": "both_legs",
                    "left": "left_side", "right": "right_side"}
    names = tuple(scenarios) if scenarios is not None else tuple(completer_of)
    preds = {
        n: completer_apply(completers[completer_of[n]], inputs[n], policy)
        for n in names
    }

    def _full(n):
        if n in ("la", "ra", "ll", "rl"):
            return combine_pose_and_limb(inputs[n], preds[n], n)
        if n == "torso":
            return jnp.concatenate(
                [inputs["torso"].reshape(-1, 3, 7),
                 preds["torso"].reshape(-1, 3, 10)], axis=2).reshape(-1, 51)
        if n == "legs":
            return jnp.concatenate(
                [inputs["legs"].reshape(-1, 3, 11)[:, :, :1],
                 preds["legs"].reshape(-1, 3, 6),
                 inputs["legs"].reshape(-1, 3, 11)[:, :, 1:]],
                axis=2).reshape(-1, 51)
        return combine_left_right_occluded_3d(
            occluded_part=preds[n], visible_part=inputs[n],
            part_occluded=n).reshape(-1, 51)

    # camera frame (z += depth; train_occlusion_models.py:392-399)
    return {
        n: (lambda v: jnp.concatenate([v[:, :34], v[:, 34:] + depth], axis=1))(
            _full(n))
        for n in names
    }


# Joints zeroed per dropout scenario (keys match the 8 completer scenarios
# of occlusion_validation_poses). Limb scenarios use the reference's
# occlusion_create keypoint sets at full count (utils/helpers.py:313-340);
# side/legs/torso scenarios drop the whole part.
DROPOUT_SCENARIO_JOINTS = {
    "ll": (4, 5, 6),
    "rl": (1, 2, 3),
    "la": (11, 12, 13),
    "ra": (14, 15, 16),
    "legs": (1, 2, 3, 4, 5, 6),
    "torso": (7, 8, 9, 10, 11, 12, 13, 14, 15, 16),
    "left": (4, 5, 6, 11, 12, 13),
    "right": (1, 2, 3, 14, 15, 16),
}


def drop_keypoints(poses_2d, joints):
    """Zero the given joints in a (B,34) batch — deterministic full-limb
    variant of occlusion_create (helpers.py:313-340) for scenario evals."""
    mask = jnp.ones((17,), poses_2d.dtype).at[jnp.asarray(joints)].set(0.0)
    return (poses_2d.reshape(-1, 2, 17) * mask).reshape(-1, 34)


def dropout_eval_poses(completers, lifters, test_2d, depth: float = 10.0,
                       policy: nn.Policy = nn.F32, choice: str = "right"):
    """Lifting under simulated 2D keypoint dropout (BASELINE.md's dropout
    config; the paper's occlusion-handling claim).

    For each scenario the dropped limb's keypoints are zeroed in the 2D
    input, the partial pose is lifted by lifters that never see the dropped
    joints, and the completer infills the missing 3D part
    (occlusion_validation_poses routing, train_occlusion_models.py:317-399).
    Returns {scenario: (recovered (B,51), naive (B,51))} where ``naive`` is
    the full left/right lift of the corrupted 2D (shared joints from
    ``choice``, matching the headline eval) — the no-completion baseline
    the paper improves on.
    """
    from links_tpu.objectives.lifter import lift_left_right_eval

    stacked = jax.tree.map(
        lambda a, b: jnp.stack([a, b]), lifters["left"], lifters["right"]
    )
    out = {}
    for name, joints in DROPOUT_SCENARIO_JOINTS.items():
        occluded = drop_keypoints(test_2d, joints)
        recovered = occlusion_validation_poses(
            completers, lifters, occluded, depth, policy, scenarios=(name,)
        )[name]
        naive = lift_left_right_eval(stacked, occluded, depth, choice, policy)
        out[name] = (recovered, naive)
    return out


def occlusion_loss(completers, pose_3d, key, policy: nn.Policy = nn.F32,
                   n_rot: int = 2, input_noise: float = 0.0):
    """Full stage-4 loss: MSE over identity + ``n_rot`` cumulative random
    y-rotations (train_occlusion_models.py:213-296; reference n_rot=2).
    Returns (loss, aux) with the reference's `threed_loss_*` keys.

    TPU note: the reference runs the 8 completers once per orientation (24
    sequential forwards). The cumulative rotations are inherently
    sequential, but the completer passes are not — the orientation batches
    concatenate into one ((n_rot+1)·B, 3, 17) batch and every completer
    runs ONCE. Since the orientation groups are equal-sized,
    (n_rot+1) * mean(concat) == sum of the per-orientation means exactly,
    so the default configuration matches the sequential reference form.

    Anti-overfitting knobs (the completers memorize the frozen lifters'
    pseudo-3D — scenario PA regresses while train MSE falls, RESULTS.md):
    ``n_rot`` > 2 widens orientation coverage; ``input_noise`` > 0 jitters
    only the completers' INPUT slices (targets stay clean — denoising
    regularization), scaled to the root-centered reconstruction-space
    units the pseudo-3D lives in."""
    keys = jax.random.split(key, n_rot + 1)
    n = pose_3d.shape[0]
    poses = [pose_3d]
    for k in keys[:n_rot]:
        y_ang = (jax.random.uniform(k, (n, 1)) - 0.5) * 1.99 * PI
        ry = rotation_about_y(y_ang)
        poses.append(jnp.matmul(ry, poses[-1], precision="highest"))
    cat = jnp.concatenate(poses, axis=0)
    inp = cat
    if input_noise:
        inp = cat + input_noise * jax.random.normal(keys[-1], cat.shape)
    per = completer_losses(completers, cat, policy, input_pose_3d=inp)
    total = {name: float(n_rot + 1) * v for name, v in per.items()}
    aux = {f"threed_loss_{name}": v for name, v in total.items()}
    loss = sum(total.values())
    aux["loss"] = loss
    return loss, aux
