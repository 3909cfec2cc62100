"""Optional attention lifter.

The reference instantiates an ``Attention_Left_Right_Lifter(..., num_heads=2)``
that is defined nowhere in the repo (train_left_right_lifter.py:67-68); the
shipped weights and eval path use the plain MLP ``Left_Right_Lifter``
(eval_h36m.py:27-28). The MLP lifter is therefore canonical
(models/lifters.py); this module provides the missing attention variant as a
flagged extension: per-joint token embeddings, ``num_heads``-head
self-attention over the J joint tokens, then the standard pose/angle heads.

Attention over J ≤ 17 tokens is tiny; the heavy compute stays in the
1024-wide dense layers, so the MXU profile matches the MLP lifter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from links_tpu.core import nn
from links_tpu.models.lifters import HIDDEN, init_res_block, res_block_apply

TOKEN_DIM = 64


def init_attention_lifter(key, num_joints: int, num_heads: int = 2):
    if TOKEN_DIM % num_heads:
        raise ValueError(
            f"num_heads={num_heads} must divide TOKEN_DIM={TOKEN_DIM}")
    keys = jax.random.split(key, 12)
    qkv = nn.init_linear(keys[2], TOKEN_DIM, 3 * TOKEN_DIM)
    # num_heads is encoded in the qkv weight shape (D, 3, H, D/H) so apply
    # (and any checkpoint round-trip) recovers it without a side channel.
    qkv = {
        "w": qkv["w"].reshape(TOKEN_DIM, 3, num_heads, TOKEN_DIM // num_heads),
        "b": qkv["b"].reshape(3, num_heads, TOKEN_DIM // num_heads),
    }
    return {
        "embed": nn.init_linear(keys[0], 2, TOKEN_DIM),
        "pos": jax.random.normal(keys[1], (num_joints, TOKEN_DIM)) * 0.02,
        "qkv": qkv,
        "proj": nn.init_linear(keys[3], TOKEN_DIM, TOKEN_DIM),
        "upscale": nn.init_linear(keys[4], num_joints * TOKEN_DIM, HIDDEN),
        "res_common": init_res_block(keys[5]),
        "res_pose1": init_res_block(keys[6]),
        "res_pose2": init_res_block(keys[7]),
        "res_angle1": init_res_block(keys[8]),
        "res_angle2": init_res_block(keys[9]),
        "downscale": nn.init_linear(keys[10], HIDDEN, num_joints),
        "angles": nn.init_linear(keys[11], HIDDEN, 1),
    }


def attention_lifter_apply(p, x, policy: nn.Policy = nn.F32):
    """(B, 2J) → ((B, J) depth offsets, (B, 1) angle). The head count is
    read from the qkv weight shape, so the dispatch in
    ``models.lifter_apply`` needs no extra argument and a checkpoint
    trained at any head count evaluates with the same partitioning."""
    b = x.shape[0]
    nh = p["qkv"]["w"].shape[2]
    j = p["pos"].shape[0]
    tokens = x.reshape(b, 2, j).transpose(0, 2, 1)  # (B, J, 2)
    t = nn.dense(p["embed"], tokens, policy) + p["pos"]
    qkv_flat = {
        "w": p["qkv"]["w"].reshape(TOKEN_DIM, 3 * TOKEN_DIM),
        "b": p["qkv"]["b"].reshape(3 * TOKEN_DIM),
    }
    qkv = nn.dense(qkv_flat, t, policy).reshape(b, j, 3, nh, TOKEN_DIM // nh)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, J, H, Dh)
    att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(TOKEN_DIM // nh)
    att = jax.nn.softmax(att, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, j, TOKEN_DIM)
    t = t + nn.dense(p["proj"], o, policy)

    h = nn.dense(p["upscale"], t.reshape(b, j * TOKEN_DIM), policy)
    h = nn.leaky_relu(res_block_apply(p["res_common"], h, policy))
    xd = nn.leaky_relu(res_block_apply(p["res_pose1"], h, policy))
    xd = nn.leaky_relu(res_block_apply(p["res_pose2"], xd, policy))
    xd = nn.dense(p["downscale"], xd, policy)
    xa = nn.leaky_relu(res_block_apply(p["res_angle1"], h, policy))
    xa = nn.leaky_relu(res_block_apply(p["res_angle2"], xa, policy))
    xa = nn.dense(p["angles"], xa, policy)
    return xd, xa
