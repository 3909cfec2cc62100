"""Geometry primitives: Euler rotations, perspective projection, 2D pose
normalization, latent perturbation, and simulated keypoint occlusion.

All functions are pure jnp ops, shape-static and jit/vmap safe.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

# Hard-coded test-time normalization scales (reference utils/helpers.py:222-259).
H36M_TEST_SCALE_INTERESTING = 145.40964
H36M_TEST_SCALE_ALL = 142.34154
H36M_TRAIN_GT_SCALE = 145.5329587164913
MPI_TEST_SCALE_CHEST = 318.79249520730474
MPI_TEST_SCALE_VNECT = 302.8530630720979
H36M_TEST_SCALE_TEMPORAL = 145.40419


def _axis_angle_rotation(axis: str, angle):
    """Rotation matrices about one axis, (...,) → (..., 3, 3).

    Matches reference utils/rotation_conversions.py:11-36 (PyTorch3D
    convention).
    """
    cos = jnp.cos(angle)
    sin = jnp.sin(angle)
    one = jnp.ones_like(angle)
    zero = jnp.zeros_like(angle)
    if axis == "X":
        flat = (one, zero, zero, zero, cos, -sin, zero, sin, cos)
    elif axis == "Y":
        flat = (cos, zero, sin, zero, one, zero, -sin, zero, cos)
    elif axis == "Z":
        flat = (cos, -sin, zero, sin, cos, zero, zero, zero, one)
    else:
        raise ValueError(f"invalid axis {axis!r}")
    return jnp.stack(flat, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(euler_angles, convention: str = "XYZ"):
    """Euler angles (..., 3) → rotation matrices (..., 3, 3).

    R = R_c0 @ R_c1 @ R_c2, matching reference
    utils/rotation_conversions.py:39-61.
    """
    if euler_angles.shape[-1] != 3:
        raise ValueError("Invalid input euler angles.")
    if len(convention) != 3 or convention[1] in (convention[0], convention[2]):
        raise ValueError(f"Invalid convention {convention}.")
    mats = [
        _axis_angle_rotation(axis, euler_angles[..., i])
        for i, axis in enumerate(convention)
    ]
    # Tiny 3x3 matmuls: force full precision so TPU default bf16 matmul
    # passes don't perturb rotation matrices used by losses and metrics.
    return jnp.matmul(
        jnp.matmul(mats[0], mats[1], precision="highest"), mats[2], precision="highest"
    )


def rotation_about_x(angle):
    """(B, 1) elevation angles → (B, 3, 3); shortcut for the XYZ-Euler matrix
    with only the x angle nonzero (train_left_right_lifter.py:159-164)."""
    return _axis_angle_rotation("X", angle[..., 0])


def rotation_about_y(angle):
    """(B, 1) azimuth angles → (B, 3, 3)."""
    return _axis_angle_rotation("Y", angle[..., 0])


def _perspective(pose_3d, njoints):
    p = pose_3d.reshape(-1, 3 * njoints)
    xy = p[:, : 2 * njoints].reshape(-1, 2, njoints)
    z = p[:, 2 * njoints :].reshape(-1, 1, njoints)
    return (xy / z).reshape(-1, 2 * njoints)


def perspective_projection(pose_3d):
    """(B,51) camera-frame 3D → (B,34) 2D by x/z, y/z; utils/helpers.py:262-267."""
    return _perspective(pose_3d, 17)


def perspective_projection_legs(pose_3d):
    """(B,21) → (B,14); utils/helpers.py:269-274."""
    return _perspective(pose_3d, 7)


def perspective_projection_torso(pose_3d):
    """(B,30) → (B,20); utils/helpers.py:276-281."""
    return _perspective(pose_3d, 10)


def perspective_projection_left_right(pose_3d):
    """(B,33) → (B,22); utils/helpers.py:283-288."""
    return _perspective(pose_3d, 11)


def normalize_head(poses_2d, root_joint: int = 0):
    """Training 2D normalization (reference utils/helpers.py:198-207):
    root-center every pose, divide by the *dataset-mean* root→head distance,
    then scale by 1/10. Operates on (B, 34).
    """
    p2d = poses_2d.reshape(-1, 2, 17)
    p2d = p2d - p2d[:, :, root_joint : root_joint + 1]
    scale = jnp.linalg.norm(p2d[:, :, 0] - p2d[:, :, 10], axis=1)
    return p2d.reshape(-1, 34) / scale.mean() * 0.1


def normalize_head_test(poses_2d, scale: float = H36M_TEST_SCALE_INTERESTING):
    """Test 2D normalization with a fixed scale (utils/helpers.py:222-230)."""
    p2d = poses_2d.reshape(-1, 2, 17)
    p2d = p2d - p2d[:, :, 0:1]
    return p2d.reshape(-1, 34) / scale * 0.1


def normalize_head_test_mpi_chest(poses_2d, scale: float = MPI_TEST_SCALE_CHEST):
    """MPI-INF-3DHP chest-camera variant (utils/helpers.py:232-239)."""
    return normalize_head_test(poses_2d, scale)


def normalize_head_test_mpi_vnect(poses_2d, scale: float = MPI_TEST_SCALE_VNECT):
    """MPI-INF-3DHP vnect-camera variant (utils/helpers.py:242-249)."""
    return normalize_head_test(poses_2d, scale)


def normalize_head_test_temporal(poses_2d, scale: float = H36M_TEST_SCALE_TEMPORAL):
    """Temporal variant (utils/helpers.py:251-259)."""
    return normalize_head_test(poses_2d, scale)


def normalize_maxabs(poses_2d):
    """Per-pose max-abs fallback normalization used when no normalize_func is
    given (reference utils/h36m_dataset_class.py:29-41). Input (B, 17, 2)
    raw keypoints; returns (B, 34) in the (2,17) flat layout.

    The reference loops over poses in Python; here it is one vectorized op.
    """
    kp = poses_2d - poses_2d[:, 0:1, :]
    pose_max = jnp.max(jnp.abs(kp), axis=(1, 2), keepdims=True)
    return (kp / pose_max).transpose(0, 2, 1).reshape(-1, 34)


def add_noise(key, latent_vars, noise_factor: float):
    """Latent perturbation for generative sampling: z + f·(ε ⊙ z), ε~N(0,1)
    (reference utils/helpers.py:298-308). Explicit PRNG key instead of torch
    global RNG."""
    noise = jax.random.normal(key, latent_vars.shape, latent_vars.dtype)
    return latent_vars + noise_factor * noise * latent_vars


def interpolate_gaussian_batch(latent_variables, t):
    """Pairwise linear interpolation of 34-dim latents (utils/helpers.py:209-220).
    Requires even batch size."""
    if latent_variables.shape[0] % 2 != 0:
        raise ValueError("Batch size must be even for interpolation.")
    pairs = latent_variables.reshape(-1, 2, 34)
    return (1 - t) * pairs[:, 0] + t * pairs[:, 1]


# Keypoint-suffix masks for occlusion_create (utils/helpers.py:313-340):
# limb l ∈ {left_leg, right_leg, left_arm, right_arm}, count c ∈ {1,2,3}
# joints zeroed. Table shape (4, 3, 17): mask[l, c-1, j] = 1 if joint j kept.
_LIMBS = ("left_leg", "right_leg", "left_arm", "right_arm")
_OCC_SETS = {
    "left_leg": ([6], [5, 6], [4, 5, 6]),
    "right_leg": ([3], [2, 3], [1, 2, 3]),
    "left_arm": ([11], [11, 12], [11, 12, 13]),
    "right_arm": ([14], [14, 15], [14, 15, 16]),
}
_OCC_MASKS = np.ones((4, 3, 17), dtype=np.float32)
for _l, _name in enumerate(_LIMBS):
    for _c, _joints in enumerate(_OCC_SETS[_name]):
        _OCC_MASKS[_l, _c, _joints] = 0.0


def occlusion_create(key, poses_2d, limbs=("left_leg",)):
    """Simulated 2D keypoint dropout (reference utils/helpers.py:313-340).

    The reference loops over the batch in Python with `random.choice`; here a
    single categorical draw per sample picks (limb, count) and indexes a
    constant (4,3,17) keep-mask table — fully vectorized and jit-safe.

    The reference is currently hardwired to occlude only the left leg
    (helpers.py:321); `limbs` defaults to that but accepts any subset of
    ('left_leg','right_leg','left_arm','right_arm').
    """
    b = poses_2d.shape[0]
    limb_ids = np.array([_LIMBS.index(l) for l in limbs])
    k1, k2 = jax.random.split(key)
    limb = jnp.asarray(limb_ids)[jax.random.randint(k1, (b,), 0, len(limb_ids))]
    count = jax.random.randint(k2, (b,), 0, 3)
    mask = jnp.asarray(_OCC_MASKS)[limb, count]  # (B, 17)
    return (poses_2d.reshape(-1, 2, 17) * mask[:, None, :]).reshape(-1, 34)


PI = math.pi
