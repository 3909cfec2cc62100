"""Data-parallel execution over a TPU mesh.

The reference is single-GPU with no communication backend (SURVEY.md §2.11).
The TPU-native strategy is pure DP: models are small (lifters ≈15M params,
flows ≲1M per block stack) so parameters replicate and the batch shards over
a 1-D ``('data',)`` mesh. Two equivalent paths are provided:

* GSPMD (default): jit with NamedSharding annotations — XLA inserts the
  gradient all-reduce (psum over ICI) automatically.
* shard_map: an explicit-collective variant (``dp_shard_map_step``) where
  the gradient psum over the 'data' axis is written out — useful as
  documentation of the communication pattern and as a cross-check.

Multi-host scaling: call ``jax.distributed.initialize()`` before mesh
construction; DCN handling is transparent to this module.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), ("data",))


def data_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    spec = [None] * (batch_axis + 1)
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh, batch_axis: int = 0):
    return jax.device_put(x, data_sharding(mesh, batch_axis))


def replicate(tree, mesh: Mesh):
    sharding = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def dp_jit_step(step_fn: Callable, mesh: Mesh):
    """GSPMD data-parallel step: state replicated, batch sharded on axis 0.
    XLA derives the psum for the gradient reduction."""
    return jax.jit(
        step_fn,
        in_shardings=(replicated(mesh), data_sharding(mesh), replicated(mesh)),
        out_shardings=(replicated(mesh), replicated(mesh)),
    )


def dp_epoch_fn(step_fn: Callable, batch_size: int, mesh: Mesh):
    """Epoch scan with the per-step batch sharded over 'data'.

    The (nb, B, D) batch stack is sharded on axis 1 (the per-step batch
    axis), the carried train state replicated. One device program per epoch.
    """

    def epoch(state, data, key):
        n = data.shape[0]
        nb = n // batch_size
        k_perm, k_steps = jax.random.split(key)
        idx = jax.random.permutation(k_perm, n)[: nb * batch_size]
        batches = data[idx].reshape(nb, batch_size, data.shape[-1])
        batches = jax.lax.with_sharding_constraint(
            batches, NamedSharding(mesh, P(None, "data"))
        )
        step_keys = jax.random.split(k_steps, nb)

        def body(carry, xs):
            batch, k = xs
            return step_fn(carry, batch, k)

        state, auxes = jax.lax.scan(body, state, (batches, step_keys))
        return state, jax.tree.map(lambda x: x.mean(), auxes)

    return jax.jit(
        epoch,
        in_shardings=(replicated(mesh), data_sharding(mesh), replicated(mesh)),
        out_shardings=(replicated(mesh), replicated(mesh)),
        donate_argnums=(0,),
    )


def dp_shard_map_step(loss_fn: Callable, optimizer, mesh: Mesh):
    """Explicit-collective DP step via shard_map.

    ``loss_fn(params, batch, key) -> (loss, aux)`` runs per shard on the
    local batch slice; gradients (and logged aux values) are psum-meaned
    over the 'data' axis before a replicated optimizer update. Numerically
    this matches the global-batch gradient because every per-sample loss in
    the pipeline is a batch mean.
    """
    shard_map = jax.shard_map

    import links_tpu.train.steps as steps

    def step(state: steps.TrainState, batch, key):
        def shard_step(params, local_batch, k):
            # decorrelate per-shard randomness (rotations, sample noise)
            k = jax.random.fold_in(k, jax.lax.axis_index("data"))
            (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, local_batch, k
            )
            grads = jax.lax.pmean(grads, "data")
            aux = jax.lax.pmean(aux, "data")
            return grads, aux

        grads, aux = shard_map(
            shard_step,
            mesh=mesh,
            in_specs=(P(), P("data"), P()),
            out_specs=(P(), P()),
        )(state.params, batch, key)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return steps.TrainState(params, opt_state, state.step + 1), aux

    return jax.jit(step)
