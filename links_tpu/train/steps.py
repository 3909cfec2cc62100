"""Fused training steps for the five pipeline stages.

Each builder returns ``step(state, batch, key) -> (state, aux)`` — a single
differentiable, jit-compatible function covering sampling augmentation,
forward, all losses, gradients, and the optimizer update. Frozen models
(flows, lifters) are closed over as pytrees of constants; XLA keeps them
device-resident.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from links_tpu import flows
from links_tpu.config import (
    FlowTrainConfig,
    LifterTrainConfig,
    OcclusionTrainConfig,
    PartFlowTrainConfig,
)
from links_tpu.core import nn
from links_tpu.objectives import flow_nll, lifter as lifter_obj, occlusion as occ_obj


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def init_state(params, optimizer) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def _policy(cfg) -> nn.Policy:
    import jax.numpy as _jnp

    return nn.Policy(
        compute_dtype=_jnp.bfloat16 if cfg.bf16 else _jnp.float32,
    )


def _make_step(loss_fn: Callable, optimizer) -> Callable:
    """Generic (state, batch, key) step from a (params, batch, key)->(loss, aux)
    loss function."""

    def step(state: TrainState, batch, key):
        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, key
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), aux

    return step


def build_full_flow_step(perm, optimizer, cfg: FlowTrainConfig):
    """Stage 1: full-pose flow NLL + self-sample NLL
    (train_full_pose_norm_flow.py:67-98). ``perm`` is the flow's fixed
    mixing stack — non-trainable, threaded as a closure constant."""
    policy = _policy(cfg)

    def loss_fn(params, batch, key):
        return flow_nll.full_flow_loss(params, perm, batch, key,
                                       cfg.noise_factor, policy, cfg.nll_cap)

    return _make_step(loss_fn, optimizer)


def build_part_flows_step(part_perms, full_flow: flows.Flow, optimizer,
                          cfg: PartFlowTrainConfig):
    """Stage 2: four part flows against real data + frozen-full-flow samples
    (train_leg_torso_left_right_norm_flow.py:100-176)."""
    policy = _policy(cfg)

    def loss_fn(params, batch, key):
        return flow_nll.part_flows_loss(params, part_perms, full_flow, batch,
                                        key, cfg.noise_factor, policy,
                                        cfg.nll_cap)

    return _make_step(loss_fn, optimizer)


def build_left_right_step(frozen: lifter_obj.LifterFrozen, optimizer,
                          cfg: LifterTrainConfig, bone_relations_mean=None):
    """Stage 3a: both side lifters in one step
    (train_left_right_lifter.py:121-427). ``state.params`` is the (left,
    right) lifter stack. The batch is augmented with frozen-flow samples
    inside the step (so the whole thing is one device program)."""
    policy = _policy(cfg)

    def loss_fn(params, batch, key):
        k_sample, k_rot = jax.random.split(key)
        inp = lifter_obj.augment_with_samples(
            frozen.full_flow, batch, k_sample, cfg.noise_factor, policy
        )
        return lifter_obj.left_right_loss(
            params, frozen, inp, k_rot, cfg, policy, bone_relations_mean
        )

    return _make_step(loss_fn, optimizer)


def build_leg_torso_step(frozen: lifter_obj.LifterFrozen, optimizer,
                         cfg: LifterTrainConfig, bone_relations_mean=None):
    """Stage 3b (train_leg_torso_lifter.py:123-277). ``state.params`` is
    {'legs': ..., 'torso': ...}."""
    policy = _policy(cfg)

    def loss_fn(params, batch, key):
        k_sample, k_rot = jax.random.split(key)
        inp = lifter_obj.augment_with_samples(
            frozen.full_flow, batch, k_sample, cfg.noise_factor, policy
        )
        return lifter_obj.leg_torso_loss(
            params["legs"], params["torso"], frozen, inp, k_rot, cfg, policy,
            bone_relations_mean,
        )

    return _make_step(loss_fn, optimizer)


def build_occlusion_step(leg_params, torso_params, optimizer,
                         cfg: OcclusionTrainConfig):
    """Stage 4: 8 completers against frozen leg/torso pseudo-3D
    (train_occlusion_models.py:144-307). ``state.params`` is the completer
    dict from ``init_all_completers``."""
    policy = _policy(cfg)

    def loss_fn(params, batch, key):
        pose_3d = occ_obj.pseudo_3d_from_lifters(
            leg_params, torso_params, batch, cfg.depth, policy
        )
        pose_3d = jax.lax.stop_gradient(pose_3d)
        return occ_obj.occlusion_loss(params, pose_3d, key, policy,
                                      n_rot=cfg.n_rot,
                                      input_noise=cfg.input_noise)

    return _make_step(loss_fn, optimizer)
