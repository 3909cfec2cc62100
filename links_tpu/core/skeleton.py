"""Skeleton index maps and part split/combine operations.

The 17-joint H36M subset (selection order fixed by the reference
preprocessing, data_utils/pre_process_h36m_fetch.py:17):

    0  pelvis/root        7  spine
    1  right hip          8  thorax
    2  right knee         9  neck/nose
    3  right ankle       10  head
    4  left hip          11  left shoulder
    5  left knee         12  left elbow
    6  left ankle        13  left wrist
                         14  right shoulder
                         15  right elbow
                         16  right wrist

2D poses are flattened ``(B, 34)`` laid out ``(2, 17)`` — all x then all y;
3D poses ``(B, 51)`` laid out ``(3, 17)`` (reference utils/helpers.py:56,143).

TPU-first design: every split/combine in the reference is a chain of
``torch.stack`` column copies (utils/helpers.py:7-136). Here each one is a
single constant-index gather on the trailing joint axis, which XLA fuses
into surrounding elementwise work for free.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

NUM_JOINTS = 17

# Part index sets (reference utils/helpers.py:55-91).
# The left/right splits share the root (0) and torso column (7,8,9,10).
RIGHT_IDX = np.array([0, 1, 2, 3, 7, 8, 9, 10, 14, 15, 16])
LEFT_IDX = np.array([0, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13])
# v2 swaps which side owns the arms (utils/helpers.py:68-78).
RIGHT_IDX_V2 = np.array([0, 1, 2, 3, 7, 8, 9, 10, 11, 12, 13])
LEFT_IDX_V2 = np.array([0, 4, 5, 6, 7, 8, 9, 10, 14, 15, 16])
# Legs = joints [0,7); torso = joints [7,17) (train_leg_torso_lifter.py:147-148).
LEG_IDX = np.arange(0, 7)
TORSO_IDX = np.arange(7, 17)

# Inverse gather for combine_left_right_pred_{1d,2d,3d}
# (utils/helpers.py:7-53): full joint j is drawn from column _COMBINE_LR_COL[j]
# of either the left or the right 11-joint split. The column index is the same
# for both sides; only the side selection differs between choice='left' and
# choice='right' (shared root/torso columns come from the chosen side).
_COMBINE_LR_COL = np.array([0, 1, 2, 3, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 8, 9, 10])
# 1 where the joint is sourced from the right split.
_COMBINE_FROM_RIGHT_LEFT = np.array(
    [0, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1], dtype=bool
)  # choice='left'
_COMBINE_FROM_RIGHT_RIGHT = np.array(
    [1, 1, 1, 1, 0, 0, 0, 1, 1, 1, 1, 0, 0, 0, 1, 1, 1], dtype=bool
)  # choice='right'

# combine_left_right_occluded_3d (utils/helpers.py:121-136): permutation over
# concat([visible(11), occluded(6)]) on the joint axis.
_OCCLUDED_COMBINE_RIGHT = np.array(
    [0, 11, 12, 13, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 14, 15, 16]
)  # part_occluded='right': occluded supplies right leg + right arm
_OCCLUDED_COMBINE_LEFT = np.array(
    [0, 1, 2, 3, 11, 12, 13, 4, 5, 6, 7, 14, 15, 16, 8, 9, 10]
)  # part_occluded='left': occluded supplies left leg + left arm

# Bone edge maps (utils/helpers.py:139-195).
BONE_MAP_ALL = np.array(
    [[0, 1], [1, 2], [2, 3], [0, 4], [4, 5], [5, 6], [0, 7], [7, 8], [8, 9],
     [9, 10], [8, 11], [11, 12], [12, 13], [8, 14], [14, 15], [15, 16]]
)
BONE_MAP_LEGS = np.array([[0, 1], [1, 2], [2, 3], [0, 4], [4, 5], [5, 6]])
# Torso bones computed after prepending a zero root column (helpers.py:168-171).
BONE_MAP_TORSO = np.array(
    [[0, 1], [1, 2], [2, 3], [3, 4], [2, 5], [5, 6], [6, 7], [2, 8], [8, 9], [9, 10]]
)
BONE_MAP_LEFT_RIGHT = np.array(
    [[0, 1], [1, 2], [2, 3], [0, 4], [4, 5], [5, 6], [6, 7], [5, 8], [8, 9], [9, 10]]
)

# H36M mean relative bone lengths (train_left_right_lifter.py:76-79).
BONE_RELATIONS_MEAN_H36M = np.array(
    [0.5180581, 1.73711136, 1.72285805, 0.5180552, 1.73710543,
     1.72285651, 0.92087518, 0.98792375, 0.44812302, 0.44502545,
     0.57462, 1.08121276, 0.9651687, 0.57461556, 1.08122523, 0.9651657]
)
# MPI-INF-3DHP "vnect cameras interesting" mean (train_leg_torso_lifter.py:97-100).
BONE_RELATIONS_MEAN_MPI_VNECT_INTERESTING = np.array(
    [0.48069107, 1.84637771, 1.49564841, 0.48069107, 1.84301997,
     1.4956484, 0.90757932, 0.99706493, 0.34679742, 0.69380255,
     0.57843534, 1.20698327, 0.92306225, 0.5741528, 1.20698326, 0.92306223]
)


def _split(data, ncoords, idx_left, idx_right):
    x = data.reshape(-1, ncoords, NUM_JOINTS)
    left = x[:, :, idx_left].reshape(-1, ncoords * len(idx_left))
    right = x[:, :, idx_right].reshape(-1, ncoords * len(idx_right))
    return left, right


def split_data_left_right(data):
    """(B, 34) → (left (B,22), right (B,22)); reference utils/helpers.py:55-65."""
    return _split(data, 2, LEFT_IDX, RIGHT_IDX)


def split_data_left_right_v2(data):
    """Arm-swapped variant; reference utils/helpers.py:68-78."""
    return _split(data, 2, LEFT_IDX_V2, RIGHT_IDX_V2)


def split_data_left_right_3d(data):
    """(B, 51) → two (B, 33).

    Note the reference reshapes to (-1, 2, 17) even for 3D input
    (utils/helpers.py:82), so a (B, 51) batch yields 1.5*B rows of
    interleaved coordinate pairs. Call sites only ever pass (B, 3, 17)
    tensors whose reshape(-1, 2, 17) is re-flattened consistently at
    (train_occlusion_models.py:191,235). We implement the *intended*
    semantics — a joint gather on (B, 3, 17) — which produces identical
    values for every call site in the reference.
    """
    return _split(data, 3, LEFT_IDX, RIGHT_IDX)


def temporal_split_data_left_right(data):
    """2-frame temporal variant: (B, 68) laid out (2 frames, 2 coords, 17)
    → two (B, 44); reference utils/helpers.py:106-116 (defined but unused by
    the five entry points — kept for API parity)."""
    x = data.reshape(-1, 2, 2, NUM_JOINTS)
    left = x[:, :, :, LEFT_IDX].reshape(-1, 44)
    right = x[:, :, :, RIGHT_IDX].reshape(-1, 44)
    return left, right


def split_data_legs_torso(data):
    """(B, 34) → (legs (B,14), torso (B,20)); train_leg_torso_lifter.py:147-148."""
    x = data.reshape(-1, 2, NUM_JOINTS)
    return x[:, :, :7].reshape(-1, 14), x[:, :, 7:].reshape(-1, 20)


def _combine_lr(left_split, right_split, choice, ncoords):
    l = left_split.reshape(-1, ncoords, 11)[:, :, _COMBINE_LR_COL]
    r = right_split.reshape(-1, ncoords, 11)[:, :, _COMBINE_LR_COL]
    mask = _COMBINE_FROM_RIGHT_RIGHT if choice == "right" else _COMBINE_FROM_RIGHT_LEFT
    return jnp.where(jnp.asarray(mask), r, l)


def combine_left_right_pred_3d(left_split, right_split, choice):
    """Merge (B,33)+(B,33) part predictions → (B,51); utils/helpers.py:7-20."""
    return _combine_lr(left_split, right_split, choice, 3).reshape(-1, 51)


def combine_left_right_pred_2d(left_split, right_split, choice):
    """Merge (B,22)+(B,22) → (B,34); utils/helpers.py:23-38."""
    return _combine_lr(left_split, right_split, choice, 2).reshape(-1, 34)


def combine_left_right_pred_1d(left_split, right_split, choice):
    """Merge (B,11)+(B,11) per-joint depths → (B,1,17); utils/helpers.py:40-53."""
    return _combine_lr(left_split, right_split, choice, 1)


def combine_left_right_occluded_3d(occluded_part, visible_part, part_occluded):
    """Merge a predicted occluded side (B,3,6) into the visible side (B,3,11)
    → (B,3,17); reference utils/helpers.py:121-136."""
    occ = occluded_part.reshape(-1, 3, 6)
    vis = visible_part.reshape(-1, 3, 11)
    cat = jnp.concatenate([vis, occ], axis=2)
    perm = _OCCLUDED_COMBINE_RIGHT if part_occluded == "right" else _OCCLUDED_COMBINE_LEFT
    return cat[:, :, perm]


def combine_pose_and_limb(pose, limb, which_limb):
    """Insert a 3-joint limb (B,9) into a 14-joint pose (B,42) → (B,51);
    reference train_occlusion_models.py:67-78."""
    limb = limb.reshape(-1, 3, 3)
    pose = pose.reshape(-1, 3, 14)
    if which_limb == "ll":  # left leg: joints 4-6
        full = jnp.concatenate([pose[:, :, :4], limb, pose[:, :, 4:]], axis=2)
    elif which_limb == "rl":  # right leg: joints 1-3
        full = jnp.concatenate([pose[:, :, :1], limb, pose[:, :, 1:]], axis=2)
    elif which_limb == "la":  # left arm: joints 11-13
        full = jnp.concatenate([pose[:, :, :11], limb, pose[:, :, 11:]], axis=2)
    elif which_limb == "ra":  # right arm: joints 14-16
        full = jnp.concatenate([pose, limb], axis=2)
    else:
        raise ValueError(f"unknown limb {which_limb!r}")
    return full.reshape(-1, 51)


def _bone_lengths(poses, njoints, bone_map):
    p = poses.reshape(-1, 3, njoints)
    bones = p[:, :, bone_map[:, 0]] - p[:, :, bone_map[:, 1]]
    return jnp.linalg.norm(bones, axis=1)


def get_bone_lengths_all(poses):
    """(B,51) → (B,16) bone lengths; reference utils/helpers.py:139-151."""
    return _bone_lengths(poses, 17, BONE_MAP_ALL)


def get_bone_lengths_legs(poses):
    """(B,21) → (B,6); reference utils/helpers.py:153-164."""
    return _bone_lengths(poses, 7, BONE_MAP_LEGS)


def get_bone_lengths_torso(poses):
    """(B,30) → (B,10); reference utils/helpers.py:166-181 (device-neutral:
    the reference hard-codes `.cuda()` for the prepended zero root)."""
    p = poses.reshape(-1, 3, 10)
    root = jnp.zeros((p.shape[0], 3, 1), dtype=p.dtype)
    return _bone_lengths(jnp.concatenate([root, p], axis=2), 11, BONE_MAP_TORSO)


def get_bone_lengths_left_right(poses):
    """(B,33) → (B,10); reference utils/helpers.py:183-195."""
    return _bone_lengths(poses, 11, BONE_MAP_LEFT_RIGHT)
