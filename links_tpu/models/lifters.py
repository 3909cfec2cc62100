"""Residual-MLP part lifters.

One parametric lifter covers the reference's four structurally identical
classes — ``DepthAngleEstimator`` (models_def.py:65-107), ``Leg_Lifter``
(:111-152), ``Torso_Lifter`` (:155-196), ``Left_Right_Lifter`` (:198-239):

    upscale: Linear(2J → 1024)
    trunk:   LeakyReLU(res_common(x))
    pose:    3 × LeakyReLU(res_block) → Linear(1024 → J)   (depth offsets)
    angle:   3 × LeakyReLU(res_block) → Linear(1024 → 1)   (elevation angle)

``res_block`` (models_def.py:10-39): Linear→[LN]→LeakyReLU→[drop]→Linear→
[LN]→LeakyReLU→[drop] + skip. Every entry point runs with layernorm and
dropout off; both are still supported for API parity (the reference's
``use_batchnorm`` flag actually gates LayerNorm — models_def.py:17).

The undefined ``Attention_Left_Right_Lifter`` referenced at
train_left_right_lifter.py:67 resolves to this MLP lifter, the class the
shipped weights and eval script actually use (SURVEY.md §2.4); an optional
attention variant lives in models/attention.py.

TPU notes: parameters of same-shape lifters (left+right) stack on a leading
axis and apply under ``jax.vmap`` so the two sides run as one batched matmul
chain on the MXU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from links_tpu.core import nn

HIDDEN = 1024


def init_res_block(key, num_neurons: int = HIDDEN, use_layernorm: bool = False):
    k1, k2 = jax.random.split(key)
    p = {
        "l1": nn.init_linear(k1, num_neurons, num_neurons),
        "l2": nn.init_linear(k2, num_neurons, num_neurons),
    }
    if use_layernorm:
        p["ln1"] = nn.init_layernorm(num_neurons)
        p["ln2"] = nn.init_layernorm(num_neurons)
    return p


def res_block_apply(p, x, policy: nn.Policy = nn.F32, *,
                    dropout_rate: float = 0.0, key: Optional[jax.Array] = None,
                    deterministic: bool = True):
    """models_def.py:23-39 — two Linear+LeakyReLU with a residual skip.

    Plain XLA only: the stage-3a step is HBM-bound on the res-block weight
    traffic, which no fusion can reduce, and the measured Pallas kernel
    loses to XLA at every flagship batch size (PERF.md). The kernel lives
    on as ``links_tpu.experimental`` with its own apply wrapper; the
    flagship path carries zero Pallas branching (VERDICT r1 next #6)."""
    h = nn.dense(p["l1"], x, policy)
    if "ln1" in p:
        h = nn.layernorm(p["ln1"], h)
    h = nn.leaky_relu(h)
    if dropout_rate and not deterministic:
        key, sub = jax.random.split(key)
        h = nn.dropout(sub, h, dropout_rate, deterministic)
    h = nn.dense(p["l2"], h, policy)
    if "ln2" in p:
        h = nn.layernorm(p["ln2"], h)
    h = nn.leaky_relu(h)
    if dropout_rate and not deterministic:
        h = nn.dropout(key, h, dropout_rate, deterministic)
    return h + x


def init_lifter(key, num_joints: int, use_layernorm: bool = False,
                hidden: int = HIDDEN):
    """Parametric lifter: num_joints ∈ {7 legs, 10 torso, 11 side, 17 full}.
    ``hidden`` defaults to the reference's fixed 1024 (models_def.py:202);
    smaller widths are useful for fast tests — apply fns are width-agnostic."""
    keys = jax.random.split(key, 9)
    return {
        "upscale": nn.init_linear(keys[0], 2 * num_joints, hidden),
        "res_common": init_res_block(keys[1], hidden, use_layernorm=use_layernorm),
        "res_pose1": init_res_block(keys[2], hidden, use_layernorm=use_layernorm),
        "res_pose2": init_res_block(keys[3], hidden, use_layernorm=use_layernorm),
        "res_pose3": init_res_block(keys[4], hidden, use_layernorm=use_layernorm),
        "res_angle1": init_res_block(keys[5], hidden, use_layernorm=use_layernorm),
        "res_angle2": init_res_block(keys[6], hidden, use_layernorm=use_layernorm),
        "res_angle3": init_res_block(keys[7], hidden, use_layernorm=use_layernorm),
        "downscale": nn.init_linear(keys[8], hidden, num_joints),
        "angles": nn.init_linear(jax.random.fold_in(keys[8], 1), hidden, 1),
    }


def lifter_apply(p, x, policy: nn.Policy = nn.F32):
    """(B, 2J) 2D part pose → ((B, J) depth offsets, (B, 1) elevation angle);
    reference models_def.py:88-107.

    Dispatches on the param-tree structure: an attention-lifter pytree
    (models/attention.py, carries a 'qkv' leaf) routes to
    ``attention_lifter_apply`` so every consumer — training objectives,
    eval, validation — works with either variant. The structure is static
    under jit/vmap, so the branch costs nothing at trace time."""
    if "qkv" in p:
        from links_tpu.models.attention import attention_lifter_apply

        return attention_lifter_apply(p, x, policy)
    h = nn.dense(p["upscale"], x, policy)
    h = nn.leaky_relu(res_block_apply(p["res_common"], h, policy))

    xd = nn.leaky_relu(res_block_apply(p["res_pose1"], h, policy))
    xd = nn.leaky_relu(res_block_apply(p["res_pose2"], xd, policy))
    xd = nn.leaky_relu(res_block_apply(p["res_pose3"], xd, policy))
    xd = nn.dense(p["downscale"], xd, policy)

    xa = nn.leaky_relu(res_block_apply(p["res_angle1"], h, policy))
    xa = nn.leaky_relu(res_block_apply(p["res_angle2"], xa, policy))
    xa = nn.leaky_relu(res_block_apply(p["res_angle3"], xa, policy))
    xa = nn.dense(p["angles"], xa, policy)
    return xd, xa


def init_pose_discriminator(key, num_joints: int = 16, use_layernorm: bool = False,
                            hidden: int = HIDDEN):
    """PoseDiscriminator (models_def.py:42-63): upscale + res_common + head.
    Unused by the five entry points but part of the model surface."""
    keys = jax.random.split(key, 5)
    return {
        "upscale": nn.init_linear(keys[0], 2 * num_joints, hidden),
        "res_common": init_res_block(keys[1], hidden, use_layernorm=use_layernorm),
        "res_pose1": init_res_block(keys[2], hidden, use_layernorm=use_layernorm),
        "res_pose2": init_res_block(keys[3], hidden, use_layernorm=use_layernorm),
        "downscale": nn.init_linear(keys[4], hidden, 1),
    }


def pose_discriminator_apply(p, x, policy: nn.Policy = nn.F32):
    """models_def.py:55-63 (res_pose1/2 constructed but bypassed there; same
    forward here)."""
    h = nn.dense(p["upscale"], x, policy)
    h = nn.leaky_relu(res_block_apply(p["res_common"], h, policy))
    return nn.dense(p["downscale"], h, policy)
