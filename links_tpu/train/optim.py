"""Optimizer construction matching the reference recipe: torch
Adam(lr=2e-4, weight_decay=1e-5) + per-epoch ExponentialLR(0.95)
(train_full_pose_norm_flow.py:53-54, train_left_right_lifter.py:109-112).

torch Adam's ``weight_decay`` is *coupled* L2 (added to the gradient before
the moment updates), so the optax chain puts ``add_decayed_weights`` before
``scale_by_adam``. The per-epoch LR schedule becomes a staircase
exponential decay over step count.

The reference creates one Adam per model; Adam is per-leaf, so a single
optimizer over the combined trainable pytree is exactly equivalent — and
keeps the whole update a single fused jit region.
"""

from __future__ import annotations

import optax

from links_tpu.config import OptimConfig


def make_optimizer(cfg: OptimConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    schedule = optax.exponential_decay(
        init_value=cfg.learning_rate,
        transition_steps=max(steps_per_epoch, 1),
        decay_rate=cfg.lr_gamma,
        staircase=True,
    )
    steps = []
    if cfg.clip_grad_norm:
        # optional robustness guard (OptimConfig.clip_grad_norm docstring);
        # clips the raw gradient BEFORE coupled weight decay, so the decay
        # term matches torch semantics on the clipped gradient path
        steps.append(optax.clip_by_global_norm(cfg.clip_grad_norm))
    steps += [
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(schedule),
    ]
    return optax.chain(*steps)
