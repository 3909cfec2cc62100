"""Occlusion-completion MLPs.

One parametric completer covers the reference's four classes
(models_def.py:243-327); all share the topology

    Linear(3·in_joints → 1024) → 3 × LeakyReLU(res_block) → Linear(→ 3·out_joints)

with (in_joints, out_joints):
    limb predictors (left/right arm/leg):  (14, 3)   models_def.py:243-263
    both-legs predictor:                   (11, 6)   models_def.py:266-286
    torso predictor:                       (7, 10)   models_def.py:289-306
    left/right side predictors:            (11, 6)   models_def.py:309-327

(The reference constructs an unused ``res_common`` in each; omitted here —
the .pt importer tolerates the extra keys.)

TPU notes: completers with equal shapes stack on a leading axis and apply
under vmap — the 8-model training step (train_occlusion_models.py:193-210)
becomes three vmapped groups: 4 limb predictors, {legs,left,right} sides,
and the torso predictor.
"""

from __future__ import annotations

import jax

from links_tpu.core import nn
from links_tpu.models.lifters import HIDDEN, init_res_block, res_block_apply

# (in_joints, out_joints) per completer name, in training-step order
# (train_occlusion_models.py:90-97).
COMPLETER_SPECS = {
    "left_leg": (14, 3),
    "right_leg": (14, 3),
    "left_arm": (14, 3),
    "right_arm": (14, 3),
    "both_legs": (11, 6),
    "torso": (7, 10),
    "left_side": (11, 6),
    "right_side": (11, 6),
}


def init_completer(key, in_joints: int, out_joints: int, use_layernorm: bool = False,
                   hidden: int = HIDDEN):
    keys = jax.random.split(key, 5)
    return {
        "upscale": nn.init_linear(keys[0], 3 * in_joints, hidden),
        "res_pose1": init_res_block(keys[1], hidden, use_layernorm=use_layernorm),
        "res_pose2": init_res_block(keys[2], hidden, use_layernorm=use_layernorm),
        "res_pose3": init_res_block(keys[3], hidden, use_layernorm=use_layernorm),
        "downscale": nn.init_linear(keys[4], hidden, 3 * out_joints),
    }


def completer_apply(p, x, policy: nn.Policy = nn.F32):
    """(B, 3·in_joints) partial 3D pose → (B, 3·out_joints) infilled part
    (models_def.py:253-263)."""
    h = nn.dense(p["upscale"], x, policy)
    h = nn.leaky_relu(res_block_apply(p["res_pose1"], h, policy))
    h = nn.leaky_relu(res_block_apply(p["res_pose2"], h, policy))
    h = nn.leaky_relu(res_block_apply(p["res_pose3"], h, policy))
    return nn.dense(p["downscale"], h, policy)


def init_all_completers(key, use_layernorm: bool = False, hidden: int = HIDDEN):
    """All eight completers keyed by name (train_occlusion_models.py:90-97)."""
    keys = jax.random.split(key, len(COMPLETER_SPECS))
    return {
        name: init_completer(k, *spec, use_layernorm=use_layernorm, hidden=hidden)
        for k, (name, spec) in zip(keys, COMPLETER_SPECS.items())
    }
