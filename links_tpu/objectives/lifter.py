"""Unsupervised lifter objectives — stage 3, the flagship training step.

Pipeline invariant (SURVEY.md §2.7; train_left_right_lifter.py:121-427):
  1. lifter emits per-joint depth offsets xd and a scalar elevation angle xa;
  2. depth z = xd + cfg.depth (root offset pinned to 0 first), clamped ≥ 1;
  3. 3D reconstruction X = x·z, Y = y·z, Z = z, root-centered;
  4. random camera: elevation compensation R_comp from the predicted angles,
     elevation ~ N(−mean(props), std(props)) (ddof=1), azimuth
     ~ U(−0.995π, 0.995π); R = Rx @ (Ry @ R_comp);
  5. rotate, translate by cfg.depth, perspective-project; the rotated views
     feed five losses: part-flow NLL, 3D consistency, 2D reprojection,
     pairwise deformation, bone-length prior.

Everything here is one differentiable function per stage — sampling
augmentation, rotation, re-lifting, all five losses — so the whole training
step jit-fuses into a single device program. The two side lifters (and the
two side flows) are stacked on a leading axis and vmapped: both sides run
as one batched MXU matmul chain.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from links_tpu import flows
from links_tpu.config import LifterTrainConfig
from links_tpu.core import nn
from links_tpu.core.geometry import (
    PI,
    perspective_projection,
    rotation_about_x,
    rotation_about_y,
)
from links_tpu.core.skeleton import (
    BONE_RELATIONS_MEAN_H36M,
    combine_left_right_pred_1d,
    get_bone_lengths_all,
    split_data_left_right,
    split_data_legs_torso,
)
from links_tpu.models import lifter_apply


class LifterFrozen(NamedTuple):
    """Frozen flows used by stage-3 losses. ``side_flows`` is a 2-stacked
    Flow (left, right) for the L/R stage or the (legs, torso) pair —
    stored unstacked for legs/torso since their dims differ."""

    full_flow: flows.Flow
    part_a: flows.Flow  # left flow / legs flow
    part_b: flows.Flow  # right flow / torso flow


def reconstruct_3d(poses_2d, depth):
    """(B,34) 2D + (B,17) depth → (B,3,17) root-centered camera-space 3D
    (train_left_right_lifter.py:189-198)."""
    p2 = poses_2d.reshape(-1, 2, 17)
    xyz = jnp.concatenate([p2 * depth[:, None, :], depth[:, None, :]], axis=1)
    return xyz - xyz[:, :, 0:1]


def globalize(pose_51, depth_offset):
    """Root-centered (B,51) → camera frame by translating z (+cfg.depth)
    (train_left_right_lifter.py:324-325)."""
    return jnp.concatenate([pose_51[:, :34], pose_51[:, 34:] + depth_offset], axis=1)


def _batch_stats(props, axis_name: str | None = None):
    """Mean and ddof=1 std of the elevation angles over the *global* batch.

    Inside ``shard_map`` the local slice sees only its shard; pass
    ``axis_name`` to reduce across the mesh axis so the data-dependent
    elevation distribution (train_left_right_lifter.py:166-174) matches the
    global-batch computation exactly (VERDICT r1 weak #3)."""
    if axis_name is None:
        return props.mean(), props.std(ddof=1)
    m1 = jax.lax.pmean(props.mean(), axis_name)
    m2 = jax.lax.pmean((props**2).mean(), axis_name)
    n = props.size * jax.lax.psum(1, axis_name)
    var = (m2 - m1**2) * (n / (n - 1))
    return m1, jnp.sqrt(jnp.maximum(var, 0.0))


def sample_rotation(key, props, use_elevation: bool = True,
                    axis_name: str | None = None):
    """Random augmentation rotation (train_left_right_lifter.py:159-183).

    props: (B,1) predicted elevation angles. Elevation compensation R_comp
    rotates by the *per-sample* predicted angle; the random elevation is
    drawn from the batch statistics of props (data-dependent distribution —
    stays inside jit). std uses ddof=1 to match torch.std. ``axis_name``
    reduces the batch statistics over a shard_map mesh axis.
    """
    b = props.shape[0]
    k_elev, k_azim = jax.random.split(key)
    y_ang = (jax.random.uniform(k_azim, (b, 1)) - 0.5) * 1.99 * PI
    ry = rotation_about_y(y_ang)
    if use_elevation:
        r_comp = rotation_about_x(props)
        mean, std = _batch_stats(props, axis_name)
        x_ang = -mean + std * jax.random.normal(k_elev, (b, 1))
        rx = rotation_about_x(x_ang)
        return jnp.matmul(rx, jnp.matmul(ry, r_comp, precision="highest"),
                          precision="highest")
    x_ang = (jax.random.uniform(k_elev, (b, 1)) - 0.5) * 2.0 * (PI / 9.0)
    return jnp.matmul(rotation_about_x(x_ang), ry, precision="highest")


def _rotate(R, pose_3d):
    """(B,3,3) @ (B,3,17), full precision (rotations feed logdet-sensitive
    flow NLLs and L2 losses)."""
    return jnp.matmul(R, pose_3d, precision="highest")


def _pairwise_deformation(pred_3d, re_rot_3d):
    """Consecutive-pair difference consistency
    (train_left_right_lifter.py:392-400). Requires even batch (guaranteed:
    the augmented batch is 2× the loader batch)."""
    n = pred_3d.shape[0]
    num_pairs = n // 2
    a = pred_3d.reshape(-1, 51)[: 2 * num_pairs].reshape(-1, 2, 51)
    b = re_rot_3d[: 2 * num_pairs].reshape(-1, 2, 51)
    diff = (a[:, 0] - a[:, 1]) - (b[:, 0] - b[:, 1])
    return jnp.linalg.norm(diff, axis=1).mean()


def _bl_prior(pred_3d, bone_relations_mean):
    """Relative bone-length prior (train_left_right_lifter.py:402-408)."""
    bl = get_bone_lengths_all(pred_3d.reshape(-1, 51))
    rel = bl / bl.mean(axis=1, keepdims=True)
    return ((bone_relations_mean - rel) ** 2).sum(axis=1).mean()


def augment_with_samples(full_flow: flows.Flow, poses_2d, key,
                         noise_factor: float = 0.2, policy: nn.Policy = nn.F32):
    """Concat real batch with frozen-full-flow samples
    (train_left_right_lifter.py:130-139). Doubles the batch."""
    samples = flows.draw_samples(full_flow, poses_2d, key, noise_factor, policy=policy)
    return jnp.concatenate([poses_2d, samples], axis=0)


def _stacked_side_apply(stacked_params, left_x, right_x, policy):
    """Run both side lifters as one vmapped call: (2,B,22) → (2,B,11),(2,B,1)."""
    xs = jnp.stack([left_x, right_x])
    xd, xa = jax.vmap(lambda p, x: lifter_apply(p, x, policy))(stacked_params, xs)
    return xd[0], xd[1], xa[0], xa[1]


def _capped_nll_mean(z, ld, nll_cap: float):
    v = flows.nll(z, ld)
    if nll_cap:
        v = flows.soft_cap_nll(v, nll_cap)
    return v.mean()


def _stacked_side_nll(frozen: LifterFrozen, left_x, right_x, policy,
                      nll_cap: float = 0.0):
    lr_params = jax.tree.map(
        lambda a, b: jnp.stack([a, b]), frozen.part_a.params, frozen.part_b.params
    )
    lr_perm = jnp.stack([frozen.part_a.perm, frozen.part_b.perm])

    def one(p, w, x):
        z, ld = flows.forward(flows.Flow(p, w), x, policy)
        return _capped_nll_mean(z, ld, nll_cap)

    out = jax.vmap(one)(lr_params, lr_perm, jnp.stack([left_x, right_x]))
    return out[0], out[1]


def left_right_loss(stacked_lifter_params, frozen: LifterFrozen, inp_poses, key,
                    cfg: LifterTrainConfig, policy: nn.Policy = nn.F32,
                    bone_relations_mean=None, axis_name: str | None = None):
    """Stage-3a loss (train_left_right_lifter.py:121-423).

    ``stacked_lifter_params``: (left, right) lifters stacked on axis 0.
    ``inp_poses``: (N,34) — already augmented with flow samples.
    Returns (loss, aux) with the reference's loss keys (the reference's
    swapped likeli_left/right names are corrected; the summed loss is
    identical — SURVEY.md §7.3).
    """
    if bone_relations_mean is None:
        bone_relations_mean = jnp.asarray(BONE_RELATIONS_MEAN_H36M, jnp.float32)
    n = inp_poses.shape[0]
    left_inp, right_inp = split_data_left_right(inp_poses)
    left_pred, right_pred, left_ang, right_ang = _stacked_side_apply(
        stacked_lifter_params, left_inp, right_inp, policy
    )
    props = (left_ang + right_ang) / 2.0

    pred_left = combine_left_right_pred_1d(left_pred, right_pred, "left").reshape(n, 17)
    pred_right = combine_left_right_pred_1d(left_pred, right_pred, "right").reshape(n, 17)
    pred_left = pred_left.at[:, 0].set(0.0)
    pred_right = pred_right.at[:, 0].set(0.0)

    R = sample_rotation(key, props, cfg.use_elevation, axis_name)

    depth_left = jnp.maximum(pred_left + cfg.depth, 1.0)
    depth_right = jnp.maximum(pred_right + cfg.depth, 1.0)
    pred_3d_left = reconstruct_3d(inp_poses, depth_left)
    pred_3d_right = reconstruct_3d(inp_poses, depth_right)

    rot_poses_left = _rotate(R, pred_3d_left).reshape(n, 51)
    rot_poses_right = _rotate(R, pred_3d_right).reshape(n, 51)
    rot_2d_left = perspective_projection(globalize(rot_poses_left, cfg.depth))
    rot_2d_right = perspective_projection(globalize(rot_poses_right, cfg.depth))

    # flow likelihood of the rotated 2D parts (each side's flow sees its own
    # rotated view; train_left_right_lifter.py:329-352)
    norm_left_side, _ = split_data_left_right(rot_2d_left)
    _, norm_right_side = split_data_left_right(rot_2d_right)
    likeli_left, likeli_right = _stacked_side_nll(
        frozen, norm_left_side, norm_right_side, policy, cfg.nll_cap
    )
    likeli = likeli_left + likeli_right

    # re-lift the rotated views (train_left_right_lifter.py:355-377)
    pred_rot_left, pred_rot_right, _, _ = _stacked_side_apply(
        stacked_lifter_params, norm_left_side, norm_right_side, policy
    )
    pred_rot_full_left = combine_left_right_pred_1d(
        pred_rot_left, pred_rot_right, "left"
    ).reshape(n, 17).at[:, 0].set(0.0)
    pred_rot_full_right = combine_left_right_pred_1d(
        pred_rot_left, pred_rot_right, "right"
    ).reshape(n, 17).at[:, 0].set(0.0)
    rot_depth_left = jnp.maximum(pred_rot_full_left + cfg.depth, 1.0)
    rot_depth_right = jnp.maximum(pred_rot_full_right + cfg.depth, 1.0)
    pred_3d_rot_left = reconstruct_3d(rot_2d_left, rot_depth_left)
    pred_3d_rot_right = reconstruct_3d(rot_2d_right, rot_depth_right)

    # 3D consistency (:379-380)
    L3d = jnp.linalg.norm(
        rot_poses_right - pred_3d_rot_right.reshape(n, 51), axis=1
    ).mean()
    L3d = L3d + jnp.linalg.norm(
        rot_poses_left - pred_3d_rot_left.reshape(n, 51), axis=1
    ).mean()

    # rotate back and reproject (:382-390)
    Rt = R.transpose(0, 2, 1)
    re_rot_3d_left = _rotate(Rt, pred_3d_rot_left).reshape(n, 51)
    re_rot_3d_right = _rotate(Rt, pred_3d_rot_right).reshape(n, 51)
    re_rot_2d_left = perspective_projection(globalize(re_rot_3d_left, cfg.depth))
    re_rot_2d_right = perspective_projection(globalize(re_rot_3d_right, cfg.depth))
    rep_rot = jnp.abs(re_rot_2d_left - inp_poses).sum(axis=1).mean()
    rep_rot = rep_rot + jnp.abs(re_rot_2d_right - inp_poses).sum(axis=1).mean()

    # pairwise deformation (:392-400)
    re_rot_3d = _pairwise_deformation(pred_3d_left, re_rot_3d_left)
    re_rot_3d = re_rot_3d + _pairwise_deformation(pred_3d_right, re_rot_3d_right)

    # bone-length prior (:402-408)
    bl_prior = _bl_prior(pred_3d_left, bone_relations_mean)
    bl_prior = bl_prior + _bl_prior(pred_3d_right, bone_relations_mean)

    loss = (
        cfg.weight_likeli * likeli
        + cfg.weight_2d * rep_rot
        + cfg.weight_3d * L3d
        + cfg.weight_velocity * re_rot_3d
        + cfg.weight_bl * bl_prior
    )
    aux = {
        "likeli": likeli,
        "likeli_left": likeli_left,
        "likeli_right": likeli_right,
        "L3d": L3d,
        "rep_rot": rep_rot,
        "re_rot_3d": re_rot_3d,
        "bl_prior": bl_prior,
        "loss": loss,
    }
    return loss, aux


def leg_torso_loss(leg_params, torso_params, frozen: LifterFrozen, inp_poses, key,
                   cfg: LifterTrainConfig, policy: nn.Policy = nn.F32,
                   bone_relations_mean=None, axis_name: str | None = None):
    """Stage-3b loss (train_leg_torso_lifter.py:123-272): one combined depth
    vector from the legs (joints 0-6) and torso (7-16) lifters, a single
    rotation/reprojection pass, and the same five losses. The reference
    defaults this stage's bone prior to the MPI 'vnect interesting' means
    (train_leg_torso_lifter.py:97-100)."""
    from links_tpu.core.skeleton import BONE_RELATIONS_MEAN_MPI_VNECT_INTERESTING

    if bone_relations_mean is None:
        bone_relations_mean = jnp.asarray(
            BONE_RELATIONS_MEAN_MPI_VNECT_INTERESTING, jnp.float32
        )
    n = inp_poses.shape[0]
    inp_legs, inp_torso = split_data_legs_torso(inp_poses)
    legs_pred, legs_ang = lifter_apply(leg_params, inp_legs, policy)
    torso_pred, torso_ang = lifter_apply(torso_params, inp_torso, policy)
    props = (legs_ang + torso_ang) / 2.0

    pred = jnp.concatenate([legs_pred, torso_pred], axis=1).at[:, 0].set(0.0)
    R = sample_rotation(key, props, cfg.use_elevation, axis_name)
    depth = jnp.maximum(pred + cfg.depth, 1.0)
    pred_3d = reconstruct_3d(inp_poses, depth)

    rot_poses = _rotate(R, pred_3d).reshape(n, 51)
    rot_2d = perspective_projection(globalize(rot_poses, cfg.depth))

    leg_rot, torso_rot = split_data_legs_torso(rot_2d)
    za, lda = flows.forward(frozen.part_a, leg_rot, policy)
    leg_likeli = _capped_nll_mean(za, lda, cfg.nll_cap)
    zb, ldb = flows.forward(frozen.part_b, torso_rot, policy)
    torso_likeli = _capped_nll_mean(zb, ldb, cfg.nll_cap)
    likeli = leg_likeli + torso_likeli

    legs_pred_rot, _ = lifter_apply(leg_params, leg_rot, policy)
    torso_pred_rot, _ = lifter_apply(torso_params, torso_rot, policy)
    pred_rot = jnp.concatenate([legs_pred_rot, torso_pred_rot], axis=1).at[:, 0].set(0.0)
    rot_depth = jnp.maximum(pred_rot + cfg.depth, 1.0)
    pred_3d_rot = reconstruct_3d(rot_2d, rot_depth)

    L3d = jnp.linalg.norm(rot_poses - pred_3d_rot.reshape(n, 51), axis=1).mean()

    re_rot_3d_pose = _rotate(R.transpose(0, 2, 1), pred_3d_rot).reshape(n, 51)
    re_rot_2d = perspective_projection(globalize(re_rot_3d_pose, cfg.depth))
    rep_rot = jnp.abs(re_rot_2d - inp_poses).sum(axis=1).mean()

    re_rot_3d = _pairwise_deformation(pred_3d, re_rot_3d_pose)
    bl_prior = _bl_prior(pred_3d, bone_relations_mean)

    loss = (
        cfg.weight_likeli * likeli
        + cfg.weight_2d * rep_rot
        + cfg.weight_3d * L3d
        + cfg.weight_velocity * re_rot_3d
        + cfg.weight_bl * bl_prior
    )
    aux = {
        "likeli": likeli,
        "leg_likeli": leg_likeli,
        "torso_likeli": torso_likeli,
        "L3d": L3d,
        "rep_rot": rep_rot,
        "re_rot_3d": re_rot_3d,
        "bl_prior": bl_prior,
        "loss": loss,
    }
    return loss, aux


def lift_left_right_eval(stacked_lifter_params, poses_2d, depth_offset: float = 10.0,
                         choice: str = "right", policy: nn.Policy = nn.F32):
    """Validation/eval forward (train_left_right_lifter.py:446-468,
    eval_h36m.py:50-78): lift, combine with ``choice``, add depth (no
    clamp at eval), reconstruct camera-space 3D. Returns (N, 51)."""
    n = poses_2d.shape[0]
    left_inp, right_inp = split_data_left_right(poses_2d)
    left_pred, right_pred, _, _ = _stacked_side_apply(
        stacked_lifter_params, left_inp, right_inp, policy
    )
    pred = combine_left_right_pred_1d(left_pred, right_pred, choice).reshape(n, 17)
    pred = pred.at[:, 0].set(0.0)
    depth = pred + depth_offset
    p2 = poses_2d.reshape(n, 2, 17)
    return jnp.concatenate(
        [(p2 * depth[:, None, :]).reshape(n, 34), depth], axis=1
    )


def lift_leg_torso_eval(leg_params, torso_params, poses_2d,
                        depth_offset: float = 10.0, policy: nn.Policy = nn.F32):
    """Validation/eval forward for the leg/torso pair
    (train_leg_torso_lifter.py:295-309). Returns (N, 51)."""
    n = poses_2d.shape[0]
    inp_legs, inp_torso = split_data_legs_torso(poses_2d)
    legs_pred, _ = lifter_apply(leg_params, inp_legs, policy)
    torso_pred, _ = lifter_apply(torso_params, inp_torso, policy)
    pred = jnp.concatenate([legs_pred, torso_pred], axis=1).at[:, 0].set(0.0)
    depth = pred + depth_offset
    p2 = poses_2d.reshape(n, 2, 17)
    return jnp.concatenate(
        [(p2 * depth[:, None, :]).reshape(n, 34), depth], axis=1
    )
