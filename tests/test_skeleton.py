import numpy as np
import jax.numpy as jnp
import pytest

from links_tpu.core import skeleton as sk

B = 5


def _pose2d(rng, b=B):
    return rng.normal(size=(b, 34)).astype(np.float32)


def _pose3d(rng, b=B):
    return rng.normal(size=(b, 51)).astype(np.float32)


def test_split_left_right_indices(rng):
    x = _pose2d(rng)
    left, right = sk.split_data_left_right(x)
    xr = x.reshape(B, 2, 17)
    np.testing.assert_allclose(np.asarray(left).reshape(B, 2, 11), xr[:, :, sk.LEFT_IDX])
    np.testing.assert_allclose(np.asarray(right).reshape(B, 2, 11), xr[:, :, sk.RIGHT_IDX])


def test_split_left_right_v2_swaps_arms(rng):
    x = _pose2d(rng)
    left, right = sk.split_data_left_right_v2(x)
    xr = x.reshape(B, 2, 17)
    np.testing.assert_allclose(np.asarray(right).reshape(B, 2, 11)[:, :, 8:], xr[:, :, 11:14])
    np.testing.assert_allclose(np.asarray(left).reshape(B, 2, 11)[:, :, 8:], xr[:, :, 14:17])


@pytest.mark.parametrize("choice", ["left", "right"])
def test_combine_2d_roundtrip(rng, choice):
    x = _pose2d(rng)
    left, right = sk.split_data_left_right(x)
    full = sk.combine_left_right_pred_2d(left, right, choice)
    np.testing.assert_allclose(np.asarray(full), x, rtol=1e-6)


@pytest.mark.parametrize("choice", ["left", "right"])
def test_combine_3d_roundtrip(rng, choice):
    x = _pose3d(rng)
    left, right = sk.split_data_left_right_3d(x.reshape(B, 3, 17))
    full = sk.combine_left_right_pred_3d(left, right, choice)
    np.testing.assert_allclose(np.asarray(full), x, rtol=1e-6)


def test_combine_1d_choice_selects_shared_columns(rng):
    # Shared root/torso columns (0, 7-10 of the full pose) must come from the
    # chosen side; distinct limbs always come from their own side.
    left = rng.normal(size=(B, 11)).astype(np.float32)
    right = rng.normal(size=(B, 11)).astype(np.float32)
    out_l = np.asarray(sk.combine_left_right_pred_1d(left, right, "left")).reshape(B, 17)
    out_r = np.asarray(sk.combine_left_right_pred_1d(left, right, "right")).reshape(B, 17)
    shared_full = [0, 7, 8, 9, 10]
    shared_split = [0, 4, 5, 6, 7]
    np.testing.assert_allclose(out_l[:, shared_full], left[:, shared_split])
    np.testing.assert_allclose(out_r[:, shared_full], right[:, shared_split])
    # limbs identical regardless of choice
    for out in (out_l, out_r):
        np.testing.assert_allclose(out[:, 1:4], right[:, 1:4])   # right leg
        np.testing.assert_allclose(out[:, 4:7], left[:, 1:4])    # left leg
        np.testing.assert_allclose(out[:, 11:14], left[:, 8:11])  # left arm
        np.testing.assert_allclose(out[:, 14:17], right[:, 8:11])  # right arm


@pytest.mark.parametrize("part", ["left", "right"])
def test_combine_occluded_roundtrip(rng, part):
    x = _pose3d(rng).reshape(B, 3, 17)
    if part == "right":
        visible = x[:, :, sk.LEFT_IDX]  # the visible side is the left split
        occluded = np.concatenate([x[:, :, 1:4], x[:, :, 14:17]], axis=2)
    else:
        visible = x[:, :, sk.RIGHT_IDX]
        occluded = np.concatenate([x[:, :, 4:7], x[:, :, 11:14]], axis=2)
    full = sk.combine_left_right_occluded_3d(jnp.asarray(occluded), jnp.asarray(visible), part)
    np.testing.assert_allclose(np.asarray(full), x, rtol=1e-6)


@pytest.mark.parametrize(
    "which,joints", [("ll", (4, 7)), ("rl", (1, 4)), ("la", (11, 14)), ("ra", (14, 17))]
)
def test_combine_pose_and_limb_roundtrip(rng, which, joints):
    x = _pose3d(rng).reshape(B, 3, 17)
    lo, hi = joints
    limb = x[:, :, lo:hi]
    rest = np.concatenate([x[:, :, :lo], x[:, :, hi:]], axis=2)
    full = sk.combine_pose_and_limb(jnp.asarray(rest), jnp.asarray(limb), which)
    np.testing.assert_allclose(np.asarray(full).reshape(B, 3, 17), x, rtol=1e-6)


def test_bone_lengths_all(rng):
    x = _pose3d(rng)
    got = np.asarray(sk.get_bone_lengths_all(x))
    p = x.reshape(B, 3, 17)
    want = np.stack(
        [np.linalg.norm(p[:, :, a] - p[:, :, b], axis=1) for a, b in sk.BONE_MAP_ALL],
        axis=1,
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)
    assert got.shape == (B, 16)


def test_bone_lengths_parts(rng):
    legs = rng.normal(size=(B, 21)).astype(np.float32)
    torso = rng.normal(size=(B, 30)).astype(np.float32)
    side = rng.normal(size=(B, 33)).astype(np.float32)
    assert sk.get_bone_lengths_legs(legs).shape == (B, 6)
    assert sk.get_bone_lengths_torso(torso).shape == (B, 10)
    assert sk.get_bone_lengths_left_right(side).shape == (B, 10)
    # torso: first bone is root(0,0,0)→first torso joint
    got = np.asarray(sk.get_bone_lengths_torso(torso))
    p = torso.reshape(B, 3, 10)
    np.testing.assert_allclose(got[:, 0], np.linalg.norm(p[:, :, 0], axis=1), rtol=1e-5)


def test_split_legs_torso(rng):
    x = _pose2d(rng)
    legs, torso = sk.split_data_legs_torso(x)
    xr = x.reshape(B, 2, 17)
    np.testing.assert_allclose(np.asarray(legs), xr[:, :, :7].reshape(B, 14))
    np.testing.assert_allclose(np.asarray(torso), xr[:, :, 7:].reshape(B, 20))
