"""Pallas fused res-block: interpret-mode parity with the jnp reference
(forward and all five gradients). Compiled-mode numbers are exercised on
real TPU by bench_pallas.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from links_tpu.ops import fused_res_block, res_block_reference

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
