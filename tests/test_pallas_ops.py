"""Pallas fused res-block (links_tpu.experimental — demoted from the
flagship path, VERDICT r1 next #6): interpret-mode parity with the jnp
reference, forward and all five gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from links_tpu.experimental import (
    experimental_res_block_apply,
    fused_res_block,
    res_block_reference,
)

D = 128  # small width for interpreter speed; kernel is width-generic
TILE = 64


def _setup(b=96, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.normal(keys[0], (b, D))
    w1 = jax.random.normal(keys[1], (D, D)) * 0.03
    b1 = jax.random.normal(keys[2], (D,)) * 0.01
    w2 = jax.random.normal(keys[3], (D, D)) * 0.03
    b2 = jax.random.normal(keys[4], (D,)) * 0.01
    return x, w1, b1, w2, b2


def test_forward_matches_reference():
    x, w1, b1, w2, b2 = _setup()
    got = fused_res_block(x, w1, b1, w2, b2, TILE, True)
    want = res_block_reference(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_forward_ragged_batch_padding():
    x, w1, b1, w2, b2 = _setup(b=70)  # not a multiple of TILE
    got = fused_res_block(x, w1, b1, w2, b2, TILE, True)
    want = res_block_reference(x, w1, b1, w2, b2)
    assert got.shape == (70, D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_gradients_match_reference():
    x, w1, b1, w2, b2 = _setup()

    def loss_fused(*args):
        return (fused_res_block(*args, TILE, True) ** 2).sum()

    def loss_ref(*args):
        return (res_block_reference(*args) ** 2).sum()

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for gf, gr, name in zip(g_fused, g_ref, ("dx", "dw1", "db1", "dw2", "db2")):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=2e-4, rtol=2e-4, err_msg=name)


def test_experimental_apply_matches_dense_path():
    """The experimental wrapper matches the production res_block_apply, and
    gradients flow through the custom VJP identically."""
    from links_tpu.core import nn
    from links_tpu.models.lifters import init_res_block, res_block_apply

    p = init_res_block(jax.random.PRNGKey(0), num_neurons=D)
    x = jax.random.normal(jax.random.PRNGKey(1), (32, D))
    want = res_block_apply(p, x, nn.Policy())
    got = experimental_res_block_apply(p, x, tile=TILE)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    g_want = jax.grad(lambda q: res_block_apply(q, x, nn.Policy()).sum())(p)
    g_got = jax.grad(
        lambda q: experimental_res_block_apply(q, x, tile=TILE).sum())(p)
    for a, b in zip(jax.tree.leaves(g_want), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)

    # layernorm blocks are rejected, not silently mis-handled
    p_ln = init_res_block(jax.random.PRNGKey(2), num_neurons=D, use_layernorm=True)
    with pytest.raises(ValueError):
        experimental_res_block_apply(p_ln, x, tile=TILE)


def test_gradients_accumulate_across_tiles():
    # multiple batch tiles exercise the first-tile zeroing + accumulation
    x, w1, b1, w2, b2 = _setup(b=3 * TILE)

    def loss_fused(w):
        return fused_res_block(x, w, b1, w2, b2, TILE, True).sum()

    def loss_ref(w):
        return res_block_reference(x, w, b1, w2, b2).sum()

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_fused)(w1)),
        np.asarray(jax.grad(loss_ref)(w1)),
        atol=2e-4, rtol=2e-4,
    )
