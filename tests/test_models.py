import jax
import jax.numpy as jnp
import numpy as np
import pytest

from links_tpu import models
from links_tpu.core import nn


@pytest.mark.parametrize("nj", [7, 10, 11, 17])
def test_lifter_shapes(nj):
    p = models.init_lifter(jax.random.PRNGKey(0), nj)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 2 * nj))
    xd, xa = models.lifter_apply(p, x)
    assert xd.shape == (4, nj)
    assert xa.shape == (4, 1)


def test_res_block_is_residual():
    p = models.init_res_block(jax.random.PRNGKey(0), 32)
    # zero weights -> pure skip: f(x) = leaky stuff of 0 + x = x + const path
    p0 = jax.tree.map(jnp.zeros_like, p)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 32))
    y = models.res_block_apply(p0, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_linear_init_matches_torch_bounds():
    p = nn.init_linear(jax.random.PRNGKey(0), 64, 128)
    bound = 1 / np.sqrt(64)
    assert float(jnp.abs(p["w"]).max()) <= bound
    assert float(jnp.abs(p["b"]).max()) <= bound
    # roughly uniform: std ~ bound/sqrt(3)
    assert abs(float(p["w"].std()) - bound / np.sqrt(3)) < 0.01 * bound


def test_leaky_relu_matches_torch_default():
    x = jnp.array([-2.0, -0.5, 0.0, 0.5, 2.0])
    np.testing.assert_allclose(
        np.asarray(nn.leaky_relu(x)), [-0.02, -0.005, 0.0, 0.5, 2.0], atol=1e-7
    )


def test_lifters_stack_and_vmap():
    # left + right lifters as one stacked pytree under vmap
    pl = models.init_lifter(jax.random.PRNGKey(0), 11)
    pr = models.init_lifter(jax.random.PRNGKey(1), 11)
    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), pl, pr)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 22))
    xd, xa = jax.vmap(models.lifter_apply)(stacked, x)
    assert xd.shape == (2, 8, 11)
    xd_l, _ = models.lifter_apply(pl, x[0])
    np.testing.assert_allclose(np.asarray(xd[0]), np.asarray(xd_l), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("name,spec", list(models.COMPLETER_SPECS.items()))
def test_completer_shapes(name, spec):
    in_j, out_j = spec
    p = models.init_completer(jax.random.PRNGKey(0), in_j, out_j)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3 * in_j))
    y = models.completer_apply(p, x)
    assert y.shape == (4, 3 * out_j)


def test_init_all_completers_distinct():
    cs = models.init_all_completers(jax.random.PRNGKey(0))
    assert set(cs) == set(models.COMPLETER_SPECS)
    a = np.asarray(cs["left_leg"]["upscale"]["w"])
    b = np.asarray(cs["right_leg"]["upscale"]["w"])
    assert not np.allclose(a, b)


def test_attention_lifter_shapes():
    p = models.init_attention_lifter(jax.random.PRNGKey(0), 11, num_heads=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 22))
    xd, xa = models.attention_lifter_apply(p, x)
    assert xd.shape == (4, 11)
    assert xa.shape == (4, 1)


def test_attention_num_heads_shape_encoded():
    """The head count is carried by the qkv param shape, so a 4-head
    lifter actually runs 4-head attention (and differs from 2-head on the
    same input distribution)."""
    p4 = models.init_attention_lifter(jax.random.PRNGKey(0), 11, num_heads=4)
    assert p4["qkv"]["w"].shape == (64, 3, 4, 16)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 22))
    xd, xa = models.attention_lifter_apply(p4, x)
    assert xd.shape == (4, 11) and xa.shape == (4, 1)
    import pytest

    with pytest.raises(ValueError, match="must divide"):
        models.init_attention_lifter(jax.random.PRNGKey(0), 11, num_heads=5)


def test_bf16_policy_close_to_f32():
    p = models.init_lifter(jax.random.PRNGKey(0), 11)
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 22))
    xd32, _ = models.lifter_apply(p, x, nn.F32)
    xd16, _ = models.lifter_apply(p, x, nn.BF16)
    assert xd16.dtype == jnp.float32  # outputs cast back
    err = float(jnp.abs(xd32 - xd16).max() / (jnp.abs(xd32).max() + 1e-6))
    assert err < 0.1


def test_pose_discriminator():
    p = models.init_pose_discriminator(jax.random.PRNGKey(0), 16)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32))
    y = models.pose_discriminator_apply(p, x)
    assert y.shape == (4, 1)
