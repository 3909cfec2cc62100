"""Epoch-level training loop.

The reference iterates a torch DataLoader and crosses the host↔device
boundary every 256-row batch (SURVEY.md §3.1). Here the whole training set
lives in HBM; an epoch is ONE device program: shuffle (device-side
permutation), reshape to (num_batches, B, D), ``lax.scan`` the fused train
step across it, and return per-epoch loss means. Host sync happens once per
epoch (for logging), not once per step.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def build_epoch(step_fn: Callable, batch_size: int,
                batch_constraint: Callable | None = None) -> Callable:
    """Unjitted ``epoch(state, data, key) -> (state, mean_losses)`` body —
    shared by the single-device path (below) and the DP path
    (train/parallel.py:dp_epoch_fn), which jit it with their own
    donation/sharding arguments.

    data: (N, D) device array. Each epoch draws a fresh permutation,
    truncates to a whole number of batches (torch DataLoader default
    drop_last=False differs — the reference's final ragged batch is dropped
    here to keep shapes static; with shuffling every epoch the expected
    coverage is identical), and scans the step. ``batch_constraint`` (if
    given) is applied to the (nb, B, D) batch stack — the DP path uses it
    to shard the per-step batch axis over the mesh.
    """

    def epoch(state, data, key):
        n = data.shape[0]
        nb = n // batch_size
        k_perm, k_steps = jax.random.split(key)
        idx = jax.random.permutation(k_perm, n)[: nb * batch_size]
        batches = data[idx].reshape(nb, batch_size, data.shape[-1])
        if batch_constraint is not None:
            batches = batch_constraint(batches)
        step_keys = jax.random.split(k_steps, nb)

        def body(carry, xs):
            batch, k = xs
            new_state, aux = step_fn(carry, batch, k)
            return new_state, aux

        state, auxes = jax.lax.scan(body, state, (batches, step_keys))
        mean_losses = jax.tree.map(lambda x: x.mean(), auxes)
        return state, mean_losses

    return epoch


def make_epoch_fn(step_fn: Callable, batch_size: int,
                  drop_remainder: bool = True) -> Callable:
    """Jitted single-device ``epoch(state, data, key)`` — the carried train
    state (params + optimizer moments) is donated so it updates in place
    across epoch boundaries instead of being copied."""
    return jax.jit(build_epoch(step_fn, batch_size), donate_argnums=(0,))


def run_training(epoch_fn, state, data, key, n_epochs: int,
                 on_epoch_end: Callable | None = None):
    """Host-side driver: one device call per epoch; ``on_epoch_end(epoch,
    state, losses)`` hook for validation/checkpoint/logging."""
    for e in range(n_epochs):
        key, sub = jax.random.split(key)
        state, losses = epoch_fn(state, data, sub)
        if on_epoch_end is not None:
            on_epoch_end(e, state, jax.tree.map(float, losses))
    return state
