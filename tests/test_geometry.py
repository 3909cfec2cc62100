import numpy as np
import jax
import jax.numpy as jnp
import pytest

from links_tpu.core import geometry as geo

B = 7


def test_euler_angles_to_matrix_vs_scipy(rng):
    scipy = pytest.importorskip("scipy")
    from scipy.spatial.transform import Rotation

    angles = rng.uniform(-np.pi, np.pi, size=(B, 3)).astype(np.float64)
    got = np.asarray(geo.euler_angles_to_matrix(jnp.asarray(angles), "XYZ"))
    # PyTorch3D 'XYZ' == intrinsic XYZ: R = Rx @ Ry @ Rz
    want = Rotation.from_euler("XYZ", angles[:, ::-1]).as_matrix()
    # scipy intrinsic 'XYZ' applies X first... construct explicitly instead:
    def rx(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

    def ry(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

    def rz(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    want = np.stack([rx(a[0]) @ ry(a[1]) @ rz(a[2]) for a in angles])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rotation_shortcuts_match_full_euler(rng):
    ang = rng.uniform(-np.pi, np.pi, size=(B, 1)).astype(np.float32)
    zeros = np.zeros_like(ang)
    rx_full = geo.euler_angles_to_matrix(jnp.concatenate([jnp.asarray(ang), zeros, zeros], 1))
    ry_full = geo.euler_angles_to_matrix(jnp.concatenate([zeros, jnp.asarray(ang), zeros], 1))
    np.testing.assert_allclose(np.asarray(geo.rotation_about_x(ang)), np.asarray(rx_full), atol=1e-6)
    np.testing.assert_allclose(np.asarray(geo.rotation_about_y(ang)), np.asarray(ry_full), atol=1e-6)


def test_rotation_is_orthonormal(rng):
    angles = rng.uniform(-np.pi, np.pi, size=(B, 3)).astype(np.float32)
    R = np.asarray(geo.euler_angles_to_matrix(jnp.asarray(angles)))
    eye = np.eye(3)[None].repeat(B, 0)
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(B), atol=1e-5)


def test_perspective_projection(rng):
    pose = rng.normal(size=(B, 51)).astype(np.float32)
    pose[:, 34:] = np.abs(pose[:, 34:]) + 5.0  # positive depths
    got = np.asarray(geo.perspective_projection(jnp.asarray(pose)))
    p = pose.reshape(B, 3, 17)
    want = (p[:, :2] / p[:, 2:3]).reshape(B, 34)
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize(
    "fn,nj",
    [
        (geo.perspective_projection_legs, 7),
        (geo.perspective_projection_torso, 10),
        (geo.perspective_projection_left_right, 11),
    ],
)
def test_perspective_projection_parts(rng, fn, nj):
    pose = rng.normal(size=(B, 3 * nj)).astype(np.float32)
    pose[:, 2 * nj :] = np.abs(pose[:, 2 * nj :]) + 5.0
    got = np.asarray(fn(jnp.asarray(pose)))
    p = pose.reshape(B, 3, nj)
    np.testing.assert_allclose(got, (p[:, :2] / p[:, 2:3]).reshape(B, 2 * nj), rtol=1e-5)


def test_normalize_head(rng):
    raw = rng.normal(size=(B, 34)).astype(np.float64) * 100
    got = np.asarray(geo.normalize_head(jnp.asarray(raw)))
    p = raw.reshape(B, 2, 17).copy()
    p -= p[:, :, 0:1]
    scale = np.linalg.norm(p[:, :, 0] - p[:, :, 10], axis=1).mean()
    want = p.reshape(B, 34) / scale * 0.1
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # root joint lands at origin
    np.testing.assert_allclose(np.asarray(got).reshape(B, 2, 17)[:, :, 0], 0.0, atol=1e-7)


def test_normalize_head_test_fixed_scale(rng):
    raw = rng.normal(size=(B, 34)).astype(np.float64) * 100
    got = np.asarray(geo.normalize_head_test(jnp.asarray(raw)))
    p = raw.reshape(B, 2, 17).copy()
    p -= p[:, :, 0:1]
    want = p.reshape(B, 34) / 145.40964 * 0.1
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_normalize_maxabs(rng):
    raw = rng.normal(size=(B, 17, 2)).astype(np.float64) * 50
    got = np.asarray(geo.normalize_maxabs(jnp.asarray(raw)))
    assert got.shape == (B, 34)
    assert np.all(np.abs(got) <= 1.0 + 1e-6)
    # root at 0 and layout (2, 17)
    np.testing.assert_allclose(got.reshape(B, 2, 17)[:, :, 0], 0.0, atol=1e-7)


def test_add_noise_statistics():
    key = jax.random.PRNGKey(0)
    z = jnp.ones((100_000,), jnp.float32) * 2.0
    noisy = geo.add_noise(key, z, 0.2)
    # z + 0.2 * eps * z: mean 2.0, std 0.4
    assert abs(float(noisy.mean()) - 2.0) < 0.01
    assert abs(float(noisy.std()) - 0.4) < 0.01


def test_occlusion_create_left_leg_only(rng):
    poses = jnp.asarray(rng.normal(size=(64, 34)).astype(np.float32)) + 10.0
    out = np.asarray(geo.occlusion_create(jax.random.PRNGKey(1), poses)).reshape(-1, 2, 17)
    # only joints 4,5,6 may be zeroed; joint 6 always zeroed for left_leg
    zero = out == 0.0
    assert zero[:, :, 6].all()
    untouched = [j for j in range(17) if j not in (4, 5, 6)]
    assert not zero[:, :, untouched].any()
    # each sample zeroes a contiguous suffix of (4,5,6)
    counts = zero[:, 0, 4:7].sum(axis=1)
    assert set(np.unique(counts)) <= {1, 2, 3}


def test_occlusion_create_all_limbs(rng):
    poses = jnp.asarray(rng.normal(size=(512, 34)).astype(np.float32)) + 10.0
    limbs = ("left_leg", "right_leg", "left_arm", "right_arm")
    out = np.asarray(geo.occlusion_create(jax.random.PRNGKey(2), poses, limbs)).reshape(-1, 2, 17)
    zero = (out == 0.0)[:, 0]
    # each sample occludes exactly one limb, 1-3 joints
    assert ((zero.sum(axis=1) >= 1) & (zero.sum(axis=1) <= 3)).all()
    # all four terminal joints get hit somewhere in the batch
    for j in (6, 3, 11, 14):
        assert zero[:, j].any()


def test_interpolate_gaussian_batch(rng):
    z = jnp.asarray(rng.normal(size=(8, 34)).astype(np.float32))
    mid = np.asarray(geo.interpolate_gaussian_batch(z, 0.5))
    want = 0.5 * (np.asarray(z)[0::2] + np.asarray(z)[1::2])
    np.testing.assert_allclose(mid, want, rtol=1e-6)
    with pytest.raises(ValueError):
        geo.interpolate_gaussian_batch(z[:7], 0.5)
