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
* ZeRO-style sharded optimizer (``dp_zero_step``): parameters and Adam
  moments live sharded over the 'data' axis at rest; XLA's partitioner
  places the all-gather (params into the forward) and turns the gradient
  reduction into a reduce-scatter feeding the sharded elementwise update.
  On TPU, ZeRO is a *sharding annotation*, not an algorithm — per-device
  state drops from 3×P to 3×P/N + one transient gathered copy. Irrelevant
  for these ≈15M-param lifters, but it is the recipe this framework would
  scale with, and it is equality-tested against the replicated path.
* DP×TP (``dp_tp_step`` over a 2-D ('data','model') mesh): weights
  Megatron-sharded over 'model' via ``tp_param_specs``, batch over
  'data'; the recipe for scaling model width past one chip's HBM.

Multi-host scaling: call ``jax.distributed.initialize()`` before mesh
construction; DCN handling is transparent to this module.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

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

    Same epoch body as the single-device path (train/loop.py:build_epoch);
    the (nb, B, D) batch stack is constrained to shard on axis 1 (the
    per-step batch axis), the carried train state replicated. One device
    program per epoch.
    """
    from links_tpu.train.loop import build_epoch

    def shard_steps(batches):
        return jax.lax.with_sharding_constraint(
            batches, NamedSharding(mesh, P(None, "data"))
        )

    return jax.jit(
        build_epoch(step_fn, batch_size, batch_constraint=shard_steps),
        in_shardings=(replicated(mesh), data_sharding(mesh), replicated(mesh)),
        out_shardings=(replicated(mesh), replicated(mesh)),
        donate_argnums=(0,),
    )


class ZeroState(NamedTuple):
    """Train state for the ZeRO-sharded path: the whole trainable pytree
    raveled into one flat f32 vector (padded to a multiple of the mesh
    size so it shards evenly over 'data'), plus an optax state built over
    that vector — Adam is elementwise, so moments over the flat vector are
    exactly the moments over the pytree leaves."""

    flat_params: jax.Array
    opt_state: Any
    step: jax.Array


def _zero_shardings(mesh: Mesh, flat_len: int, opt_state):
    """Sharding pytree for (flat_params, opt_state): every vector the same
    length as the flat params shards over 'data'; scalars (step counts)
    replicate."""
    shard = NamedSharding(mesh, P("data"))
    repl = replicated(mesh)

    def leaf(s):
        return shard if getattr(s, "shape", ()) == (flat_len,) else repl

    return shard, jax.tree.map(leaf, opt_state)


def init_zero_state(params, optimizer, mesh: Mesh):
    """(ZeroState, unravel_fn): ravel ``params``, pad to the mesh size,
    place params + Adam moments sharded over 'data'."""
    from jax.flatten_util import ravel_pytree

    flat, unravel = ravel_pytree(params)
    n = mesh.devices.size
    pad = (-flat.size) % n
    flat = jnp.pad(flat, (0, pad))
    opt_state = jax.eval_shape(optimizer.init, flat)
    p_shard, o_shard = _zero_shardings(mesh, flat.size, opt_state)
    flat = jax.device_put(flat, p_shard)
    opt_state = jax.jit(optimizer.init, out_shardings=o_shard)(flat)
    state = ZeroState(flat, opt_state, jnp.zeros((), jnp.int32))
    return state, unravel


def dp_zero_step(loss_fn: Callable, optimizer, mesh: Mesh, params_template):
    """DP step with ZeRO-sharded parameters and optimizer state.

    ``loss_fn(params, batch, key) -> (loss, aux)`` sees the ordinary
    params pytree (materialized from the sharded flat vector — XLA inserts
    the all-gather); the batch shards over 'data'; gradients flow back as
    a reduce-scatter into the sharded Adam update. Padding lanes are inert:
    their gradient is identically zero, so Adam's update there is zero and
    coupled weight decay acts on zero-valued params.
    """
    from jax.flatten_util import ravel_pytree

    flat0, unravel = ravel_pytree(params_template)
    size = flat0.size
    n = mesh.devices.size
    padded = size + ((-size) % n)
    opt_shape = jax.eval_shape(optimizer.init,
                               jax.ShapeDtypeStruct((padded,), flat0.dtype))
    p_shard, o_shard = _zero_shardings(mesh, padded, opt_shape)
    repl = replicated(mesh)

    def step(state: ZeroState, batch, key):
        def flat_loss(flat):
            return loss_fn(unravel(flat[:size]), batch, key)

        (_, aux), grads = jax.value_and_grad(flat_loss, has_aux=True)(
            state.flat_params
        )
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.flat_params)
        flat = optax.apply_updates(state.flat_params, updates)
        return ZeroState(flat, opt_state, state.step + 1), aux

    state_shardings = ZeroState(p_shard, o_shard, repl)
    return jax.jit(
        step,
        in_shardings=(state_shardings, data_sharding(mesh), repl),
        out_shardings=(state_shardings, repl),
        donate_argnums=(0,),
    )


def make_shard_grad_fn(loss_fn: Callable):
    """The per-shard gradient function dp_shard_map_step runs inside
    shard_map: (params, local_batch, key) → (global grads, pmean'd aux).

    Differentiates the GLOBAL scalar (pmean of per-shard losses): its
    gradient w.r.t. the replicated params is exactly the global-batch
    gradient. Do NOT grad the local loss and pmean afterwards — under
    vma-aware autodiff (jax ≥ 0.9) the transpose of the params broadcast
    already psums cotangents across shards, so that recipe over-scales
    gradients by the axis size (caught by test_shard_map_matches_gspmd).
    """

    def shard_step(params, local_batch, k):
        # decorrelate per-shard randomness (rotations, sample noise)
        k = jax.random.fold_in(k, jax.lax.axis_index("data"))

        def global_loss(p):
            loss, aux = loss_fn(p, local_batch, k)
            return jax.lax.pmean(loss, "data"), aux

        (_, aux), grads = jax.value_and_grad(global_loss, has_aux=True)(params)
        aux = jax.lax.pmean(aux, "data")
        return grads, aux

    return shard_step


def dp_shard_map_step(loss_fn: Callable, optimizer, mesh: Mesh):
    """Explicit-collective DP step via shard_map.

    ``loss_fn(params, batch, key) -> (loss, aux)`` runs per shard on the
    local batch slice; gradients (and logged aux values) are psum-meaned
    over the 'data' axis before a replicated optimizer update.

    Gradient semantics vs the global batch: every per-sample loss term is a
    batch mean over equal shard sizes, and the pairwise-deformation pairs
    never straddle shard boundaries (shards are contiguous blocks of even
    length), so psum-of-shard-means equals the global mean for those terms.
    The one genuinely global quantity is the elevation sampler's batch
    statistics (objectives/lifter.py `_batch_stats`): the stage-3 losses
    must be built with ``axis_name='data'`` so mean/std reduce over the mesh
    — then the deterministic part of the gradient equals the global-batch
    gradient exactly (tests/test_parallel.py::test_shard_map_matches_gspmd).
    RNG draws (rotations, sample noise) are per-shard fold_in realizations:
    identical distribution, different realization than the GSPMD path.
    """
    shard_map = jax.shard_map

    import links_tpu.train.steps as steps

    shard_step = make_shard_grad_fn(loss_fn)

    def step(state: steps.TrainState, batch, key):
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


# --------------------------------------------------------------------------
# Tensor parallelism (2-D ('data', 'model') mesh)
#
# The reference's models never need TP (1024-wide MLPs, ~15M params —
# SURVEY.md §2.11 reserves the axis in design only). This is the
# annotation-level recipe the framework scales wider models with, exactly
# as the scaling-book prescribes: pick a mesh, annotate the weight
# shardings Megatron-style, and let XLA's partitioner place the
# collectives on ICI. For each Linear→…→Linear pair in the res-block MLPs
# the first weight column-shards (fan_out over 'model'), the second
# row-shards (fan_in over 'model'): activations between them stay sharded
# on the feature axis and the only communication is one psum after the
# second matmul. Batch stays sharded over 'data', so the layout composes
# DP×TP.


_COLUMN_LINEARS = frozenset({"l1", "upscale"})     # shard fan_out
_ROW_LINEARS = frozenset({"l2", "downscale", "angles"})  # shard fan_in


def _path_names(path) -> list:
    names = []
    for p in path:
        key = getattr(p, "key", None)
        if key is None:
            key = getattr(p, "name", None)
        if isinstance(key, str):
            names.append(key)
    return names


def tp_param_specs(params):
    """PartitionSpec pytree for Megatron-style TP over the res-block MLPs.

    Sharding is decided by the linear's role in the pytree (leading stack
    axes from vmapped model families stay unsharded):

    * ``l1``/``upscale`` (the producer of a model-sharded activation):
      weight sharded on fan_out, bias sharded with its columns;
    * ``l2``/``downscale``/``angles`` (the consumer): weight sharded on
      fan_in, bias replicated (the psum output is replicated);
    * ``ln1`` (acts on the sharded activation): sharded on features;
    * anything unrecognized (attention qkv, flow leaves): replicated.
    """
    import jax.tree_util as jtu

    def spec(path, leaf):
        names = _path_names(path)
        parent = names[-2] if len(names) >= 2 else ""
        field = names[-1] if names else ""
        nd = getattr(leaf, "ndim", 0)
        if parent in _COLUMN_LINEARS and field == "w" and nd >= 2:
            return P(*([None] * (nd - 1)), "model")
        if parent in _COLUMN_LINEARS and field == "b" and nd >= 1:
            return P(*([None] * (nd - 1)), "model")
        if parent in _ROW_LINEARS and field == "w" and nd >= 2:
            return P(*([None] * (nd - 2)), "model", None)
        if field == "ln1" or parent == "ln1":
            return P(*([None] * (nd - 1)), "model") if nd >= 1 else P()
        return P()

    return jtu.tree_map_with_path(spec, params)


def tp_state_shardings(state, mesh: Mesh):
    """NamedSharding pytree for a TrainState under the TP layout: params
    (and the Adam moments, which mirror the params tree) carry
    ``tp_param_specs``; every other optimizer leaf and the step counter
    replicate."""
    import links_tpu.train.steps as steps

    repl = replicated(mesh)
    pshard = jax.tree.map(lambda s: NamedSharding(mesh, s),
                          tp_param_specs(state.params))

    def opt_entry(s):
        if isinstance(s, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(count=repl, mu=pshard, nu=pshard)
        return repl  # array leaf of a non-Adam transform state

    opt_sh = jax.tree.map(
        opt_entry, state.opt_state,
        is_leaf=lambda s: isinstance(s, optax.ScaleByAdamState))
    return steps.TrainState(pshard, opt_sh, repl)


def make_mesh_2d(n_data: int, n_model: int) -> Mesh:
    devices = jax.devices()
    need = n_data * n_model
    assert len(devices) >= need, f"need {need} devices, have {len(devices)}"
    return Mesh(np.array(devices[:need]).reshape(n_data, n_model),
                ("data", "model"))


def dp_tp_step(step_fn: Callable, mesh: Mesh, state_template):
    """DP×TP step: batch sharded over 'data', weights Megatron-sharded
    over 'model' (see tp_param_specs), optimizer state sharded with its
    params. XLA places the activation psums and keeps the Adam update
    shard-local on each weight's home devices."""
    state_sh = tp_state_shardings(state_template, mesh)
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, data_sharding(mesh), replicated(mesh)),
        out_shardings=(state_sh, replicated(mesh)),
        donate_argnums=(0,),
    )
