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

import jax
import jax.numpy as jnp
import optax

from links_tpu.config import OptimConfig


def _cast_moments(state, dtype):
    """Cast the mu/nu moment pytrees of a ScaleByAdamState; counts and any
    non-float leaves pass through."""

    def leaf(x):
        if isinstance(x, jnp.ndarray) and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    def one(s):
        if isinstance(s, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(
                count=s.count,
                mu=jax.tree.map(leaf, s.mu),
                nu=jax.tree.map(leaf, s.nu),
            )
        return s

    return jax.tree.map(one, state,
                        is_leaf=lambda s: isinstance(s, optax.ScaleByAdamState))


def bf16_moments(inner: optax.GradientTransformation) -> optax.GradientTransformation:
    """Store Adam's first/second moments in bfloat16 at rest.

    The flagship step is HBM-bound on optimizer traffic (PERF.md ablation:
    the Adam update alone chains at 1.8 ms/step at batch 256); halving the
    moment bytes removes ~230 MB/step of that. The update math still runs
    in f32 — moments are upcast entering `inner.update` and downcast on the
    way out, and XLA fuses both casts into the elementwise update, so the
    only change is the at-rest precision (~3 decimal digits for nu ⇒
    ~0.4% relative noise on the per-coordinate step size). Opt-in
    (`OptimConfig.bf16_moments` / `--bf16-opt-state`); the default keeps
    the reference's f32 Adam bit-for-bit.
    """

    def init(params):
        return _cast_moments(inner.init(params), jnp.bfloat16)

    def update(grads, state, params=None):
        updates, new_state = inner.update(
            grads, _cast_moments(state, jnp.float32), params)
        return updates, _cast_moments(new_state, jnp.bfloat16)

    return optax.GradientTransformation(init, update)


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
    adam = optax.scale_by_adam()
    if cfg.bf16_moments:
        adam = bf16_moments(adam)
    steps += [
        optax.add_decayed_weights(cfg.weight_decay),
        adam,
        optax.scale_by_learning_rate(schedule),
    ]
    return optax.chain(*steps)
