import jax
import jax.numpy as jnp
import numpy as np
import pytest

from links_tpu import flows, models
from links_tpu.config import LifterTrainConfig
from links_tpu.objectives import (
    LifterFrozen,
    augment_with_samples,
    left_right_loss,
    leg_torso_loss,
    lift_left_right_eval,
    lift_leg_torso_eval,
    occlusion_loss,
    part_inputs,
    part_targets,
    pseudo_3d_from_lifters,
    reconstruct_3d,
    sample_rotation,
)

HID = 32  # tiny hidden width for fast tests


def _synthetic_poses(rng, n=16):
    """2D poses in the normalized regime (root at 0, ~0.1 scale)."""
    p = rng.normal(size=(n, 2, 17)).astype(np.float32) * 0.1
    p[:, :, 0] = 0.0
    return jnp.asarray(p.reshape(n, 34))


def _lr_setup(key=0):
    keys = jax.random.split(jax.random.PRNGKey(key), 5)
    stacked = jax.tree.map(
        lambda a, b: jnp.stack([a, b]),
        models.init_lifter(keys[0], 11, hidden=HID),
        models.init_lifter(keys[1], 11, hidden=HID),
    )
    frozen = LifterFrozen(
        full_flow=flows.init_flow(keys[2], 34, hidden=HID),
        part_a=flows.init_flow(keys[3], 22, hidden=HID),
        part_b=flows.init_flow(keys[4], 22, hidden=HID),
    )
    return stacked, frozen


def test_reconstruct_3d_matches_manual(rng):
    poses = _synthetic_poses(rng)
    depth = jnp.asarray(rng.uniform(5, 15, size=(16, 17)).astype(np.float32))
    got = np.asarray(reconstruct_3d(poses, depth))
    p2 = np.asarray(poses).reshape(16, 2, 17)
    xyz = np.concatenate([p2 * np.asarray(depth)[:, None, :], np.asarray(depth)[:, None, :]], 1)
    want = xyz - xyz[:, :, 0:1]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got[:, :, 0], 0.0, atol=1e-6)


def test_sample_rotation_is_valid_rotation(rng):
    props = jnp.asarray(rng.normal(size=(32, 1)).astype(np.float32) * 0.1)
    R = np.asarray(sample_rotation(jax.random.PRNGKey(0), props))
    np.testing.assert_allclose(
        R @ R.transpose(0, 2, 1), np.eye(3)[None].repeat(32, 0), atol=1e-5
    )
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_sample_rotation_elevation_statistics():
    # with constant props, R_comp is a fixed x-rotation and the random
    # elevation collapses to -mean (std=0) => Rx(-m) @ Ry @ Rx(m)
    props = jnp.full((64, 1), 0.3)
    R = np.asarray(sample_rotation(jax.random.PRNGKey(1), props))
    # the y-column behavior: R @ [0,1,0] should equal Rx(-0.3) @ Ry @ Rx(0.3) @ e_y
    from links_tpu.core.geometry import rotation_about_x

    rx = np.asarray(rotation_about_x(jnp.full((64, 1), 0.3)))
    rx_inv = np.asarray(rotation_about_x(jnp.full((64, 1), -0.3)))
    # extract implied Ry = Rx(+0.3)... can't directly; just check structure:
    # M = rx_inv^T R rx^T should be a pure y-rotation (middle row/col = e_y)
    M = np.einsum("bij,bjk,bkl->bil", rx_inv.transpose(0, 2, 1), R, rx.transpose(0, 2, 1))
    np.testing.assert_allclose(M[:, 1, 1], 1.0, atol=1e-4)
    np.testing.assert_allclose(M[:, 1, 0], 0.0, atol=1e-4)
    np.testing.assert_allclose(M[:, 0, 1], 0.0, atol=1e-4)


def test_augment_with_samples_doubles_batch(rng):
    poses = _synthetic_poses(rng)
    flow = flows.init_flow(jax.random.PRNGKey(0), 34, hidden=HID)
    out = augment_with_samples(flow, poses, jax.random.PRNGKey(1))
    assert out.shape == (32, 34)
    np.testing.assert_allclose(np.asarray(out[:16]), np.asarray(poses))


def test_left_right_loss_finite_and_grads_flow(rng):
    stacked, frozen = _lr_setup()
    poses = _synthetic_poses(rng)
    cfg = LifterTrainConfig()

    def f(params):
        loss, aux = left_right_loss(params, frozen, poses, jax.random.PRNGKey(2), cfg)
        return loss, aux

    (loss, aux), grads = jax.value_and_grad(f, has_aux=True)(stacked)
    assert np.isfinite(float(loss))
    for k in ("likeli", "L3d", "rep_rot", "re_rot_3d", "bl_prior", "loss"):
        assert np.isfinite(float(aux[k])), k
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads))
    assert gnorm > 0.0


def test_left_right_loss_weights_compose(rng):
    stacked, frozen = _lr_setup()
    poses = _synthetic_poses(rng)
    key = jax.random.PRNGKey(3)
    cfg = LifterTrainConfig()
    _, aux = left_right_loss(stacked, frozen, poses, key, cfg)
    want = (
        cfg.weight_likeli * aux["likeli"]
        + cfg.weight_2d * aux["rep_rot"]
        + cfg.weight_3d * aux["L3d"]
        + cfg.weight_velocity * aux["re_rot_3d"]
        + cfg.weight_bl * aux["bl_prior"]
    )
    np.testing.assert_allclose(float(aux["loss"]), float(want), rtol=1e-5)


def test_leg_torso_loss_finite(rng):
    keys = jax.random.split(jax.random.PRNGKey(7), 4)
    leg = models.init_lifter(keys[0], 7, hidden=HID)
    torso = models.init_lifter(keys[1], 10, hidden=HID)
    frozen = LifterFrozen(
        full_flow=flows.init_flow(keys[2], 34, hidden=HID),
        part_a=flows.init_flow(keys[3], 14, hidden=HID),
        part_b=flows.init_flow(jax.random.fold_in(keys[3], 1), 20, hidden=HID),
    )
    poses = _synthetic_poses(rng)
    cfg = LifterTrainConfig()
    loss, aux = leg_torso_loss(leg, torso, frozen, poses, jax.random.PRNGKey(4), cfg)
    assert np.isfinite(float(loss))
    assert {"leg_likeli", "torso_likeli"} <= set(aux)


def test_lift_eval_shapes_and_depth(rng):
    stacked, _ = _lr_setup()
    poses = _synthetic_poses(rng)
    out = lift_left_right_eval(stacked, poses, 10.0, "right")
    assert out.shape == (16, 51)
    # root depth must be exactly depth_offset (pred root pinned to 0)
    np.testing.assert_allclose(np.asarray(out).reshape(16, 3, 17)[:, 2, 0], 10.0, atol=1e-5)

    leg = models.init_lifter(jax.random.PRNGKey(0), 7, hidden=HID)
    torso = models.init_lifter(jax.random.PRNGKey(1), 10, hidden=HID)
    out2 = lift_leg_torso_eval(leg, torso, poses)
    assert out2.shape == (16, 51)
    np.testing.assert_allclose(np.asarray(out2).reshape(16, 3, 17)[:, 2, 0], 10.0, atol=1e-5)


def test_part_slices_cover_reference_layout(rng):
    pose = jnp.asarray(rng.normal(size=(4, 3, 17)).astype(np.float32))
    tg = part_targets(pose)
    inp = part_inputs(pose)
    p = np.asarray(pose)
    np.testing.assert_allclose(np.asarray(tg["left_arm"]), p[:, :, 11:14].reshape(4, 9))
    np.testing.assert_allclose(np.asarray(tg["torso"]), p[:, :, 7:].reshape(4, 30))
    np.testing.assert_allclose(np.asarray(inp["right_arm"]), p[:, :, :14].reshape(4, 42))
    np.testing.assert_allclose(np.asarray(inp["torso"]), p[:, :, :7].reshape(4, 21))
    # left_side input = right split (pose without the left limbs)
    from links_tpu.core.skeleton import RIGHT_IDX

    np.testing.assert_allclose(
        np.asarray(inp["left_side"]).reshape(4, 3, 11), p[:, :, RIGHT_IDX]
    )


def test_dropout_eval_recovers_missing_limb(rng):
    """The dropout eval path never feeds the dropped keypoints to the
    lifters that build a scenario's input: recovered poses must be identical
    whether the dropped limb's 2D keypoints are zeroed or not."""
    from links_tpu.objectives.occlusion import (
        DROPOUT_SCENARIO_JOINTS,
        drop_keypoints,
        dropout_eval_poses,
        occlusion_validation_poses,
    )

    completers = models.init_all_completers(jax.random.PRNGKey(0), hidden=HID)
    lifters = {
        "left": models.init_lifter(jax.random.PRNGKey(1), 11, hidden=HID),
        "right": models.init_lifter(jax.random.PRNGKey(2), 11, hidden=HID),
        "legs": models.init_lifter(jax.random.PRNGKey(3), 7, hidden=HID),
        "torso": models.init_lifter(jax.random.PRNGKey(4), 10, hidden=HID),
    }
    poses = _synthetic_poses(rng, n=8)
    clean = occlusion_validation_poses(completers, lifters, poses)
    dropped = dropout_eval_poses(completers, lifters, poses)
    assert set(dropped) == set(DROPOUT_SCENARIO_JOINTS)
    for name, (recovered, naive) in dropped.items():
        np.testing.assert_allclose(
            np.asarray(recovered), np.asarray(clean[name]), atol=1e-5,
            err_msg=name,
        )
        # the naive full lift DOES see the zeros — it must differ
        assert not np.allclose(np.asarray(naive), np.asarray(clean[name]))

    # drop_keypoints zeroes exactly the requested joints
    occ2d = drop_keypoints(poses, (4, 5, 6))
    o = np.asarray(occ2d).reshape(-1, 2, 17)
    np.testing.assert_allclose(o[:, :, 4:7], 0.0)
    np.testing.assert_allclose(o[:, :, 7:], np.asarray(poses).reshape(-1, 2, 17)[:, :, 7:])


def test_occlusion_loss_finite_and_sums(rng):
    completers = models.init_all_completers(jax.random.PRNGKey(0), hidden=HID)
    leg = models.init_lifter(jax.random.PRNGKey(1), 7, hidden=HID)
    torso = models.init_lifter(jax.random.PRNGKey(2), 10, hidden=HID)
    poses = _synthetic_poses(rng)
    pose3d = pseudo_3d_from_lifters(leg, torso, poses)
    assert pose3d.shape == (16, 3, 17)
    loss, aux = occlusion_loss(completers, pose3d, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    parts = [v for k, v in aux.items() if k.startswith("threed_loss_")]
    assert len(parts) == 8
    np.testing.assert_allclose(float(loss), float(sum(parts)), rtol=1e-5)

    # augmentation knobs: defaults reproduce the reference recipe exactly;
    # extra rotations / input noise genuinely change the objective
    loss_ref, _ = occlusion_loss(completers, pose3d, jax.random.PRNGKey(3),
                                 n_rot=2, input_noise=0.0)
    np.testing.assert_allclose(float(loss_ref), float(loss), rtol=0)
    loss_rot, _ = occlusion_loss(completers, pose3d, jax.random.PRNGKey(3),
                                 n_rot=5)
    loss_noise, _ = occlusion_loss(completers, pose3d, jax.random.PRNGKey(3),
                                   input_noise=0.1)
    assert np.isfinite(float(loss_rot)) and np.isfinite(float(loss_noise))
    assert float(loss_rot) != float(loss)
    assert float(loss_noise) != float(loss)
