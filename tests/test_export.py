"""Serving-artifact export (ckpt/export_io.py): round-trip parity,
symbolic batch, multi-platform lowering, inspection metadata."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from links_tpu import ckpt, models
from links_tpu.objectives import lift_left_right_eval, lift_leg_torso_eval

HID = 32


def _stacked(key):
    k1, k2 = jax.random.split(key)
    return jax.tree.map(
        lambda a, b: jnp.stack([a, b]),
        models.init_lifter(k1, 11, hidden=HID),
        models.init_lifter(k2, 11, hidden=HID),
    )


def _probe(rng, n):
    p = rng.normal(size=(n, 34)).astype(np.float32)
    p[:, 0] = 0.0
    return p


def test_export_roundtrip_symbolic_batch(tmp_path, rng):
    stacked = _stacked(jax.random.PRNGKey(0))

    def fwd(p2d):
        return lift_left_right_eval(stacked, p2d, 10.0, "right")

    out = tmp_path / "lr.stablehlo"
    exp, nbytes = ckpt.export_serving(fwd, str(out), platforms=("cpu",))
    assert out.exists() and out.stat().st_size == nbytes

    served = ckpt.load_exported(str(out))
    # one symbolic-batch artifact serves several request sizes
    for n in (1, 5, 32):
        probe = _probe(rng, n)
        got = np.asarray(served(probe))
        want = np.asarray(jax.jit(fwd)(jnp.asarray(probe)))
        assert got.shape == (n, 51)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_export_fixed_batch_and_mlir(tmp_path, rng):
    legs = models.init_lifter(jax.random.PRNGKey(1), 7, hidden=HID)
    torso = models.init_lifter(jax.random.PRNGKey(2), 10, hidden=HID)

    def fwd(p2d):
        return lift_leg_torso_eval(legs, torso, p2d, 10.0)

    out = tmp_path / "lt.stablehlo"
    mlir = tmp_path / "lt.mlir"
    ckpt.export_serving(fwd, str(out), batch=8, platforms=("cpu",),
                        mlir_out=str(mlir))
    text = mlir.read_text()
    assert "stablehlo" in text and "8x34" in text

    served = ckpt.load_exported(str(out))
    probe = _probe(rng, 8)
    np.testing.assert_allclose(
        np.asarray(served(probe)),
        np.asarray(jax.jit(fwd)(jnp.asarray(probe))),
        rtol=1e-5, atol=1e-6)
    # a fixed-batch artifact rejects other batch sizes loudly
    with pytest.raises(Exception):
        served(_probe(rng, 4))


def test_export_occlusion_scenario_path(tmp_path, rng):
    """The links-export --scenario program (drop keypoints → lift visible
    part → completer infill) also exports with a symbolic batch."""
    from links_tpu.objectives import occlusion as occ

    keys = jax.random.split(jax.random.PRNGKey(4), 5)
    lifters = {
        "left": models.init_lifter(keys[0], 11, hidden=HID),
        "right": models.init_lifter(keys[1], 11, hidden=HID),
        "legs": models.init_lifter(keys[2], 7, hidden=HID),
        "torso": models.init_lifter(keys[3], 10, hidden=HID),
    }
    completers = models.init_all_completers(keys[4], hidden=HID)
    joints = occ.DROPOUT_SCENARIO_JOINTS["torso"]

    def fwd(p2d):
        occluded = occ.drop_keypoints(p2d, joints)
        poses = occ.occlusion_validation_poses(
            completers, lifters, occluded, 10.0,
            scenarios=("torso",))["torso"]
        return poses.reshape(p2d.shape[0], 51)

    out = tmp_path / "occ.stablehlo"
    ckpt.export_serving(fwd, str(out), platforms=("cpu",))
    served = ckpt.load_exported(str(out))
    probe = _probe(rng, 6)
    got = np.asarray(served(probe))
    want = np.asarray(jax.jit(fwd)(jnp.asarray(probe)))
    assert got.shape == (6, 51)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_exported_info(tmp_path):
    stacked = _stacked(jax.random.PRNGKey(3))

    def fwd(p2d):
        return lift_left_right_eval(stacked, p2d, 10.0, "left")

    out = tmp_path / "lr.stablehlo"
    ckpt.export_serving(fwd, str(out), platforms=("tpu", "cpu"))
    info = ckpt.exported_info(str(out))
    assert info["platforms"] == ["tpu", "cpu"]
    assert info["bytes"] == out.stat().st_size
    assert any("34" in s for s in info["inputs"])
    assert any("51" in s for s in info["outputs"])
