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


# --------------------------------------------------------------------------
# Pipeline parallelism (GPipe microbatching over a ('pipe',) mesh axis)
#
# The depth-scaling recipe, completing the portfolio (DP = batch, ZeRO =
# optimizer state, TP = width, PP = depth). The reference's lifters are 8
# res-blocks deep (models_def.py:65-107) — nowhere near needing PP — so,
# like TP, this is the annotation-level recipe the framework scales deeper
# trunks with, implemented the TPU way: a homogeneous res-block trunk's
# stacked params shard over 'pipe' (stage s holds a contiguous depth slice),
# microbatches stream through the stages inside ONE `lax.scan` device
# program, and the only communication is a `ppermute` ring shift of the
# (micro_batch, hidden) activation per tick — point-to-point on ICI.
# Fill/drain bubbles are masked with `where`; every collective is explicit.
# The whole schedule is differentiable (ppermute transposes to the inverse
# permutation), so the same function serves training.


def make_mesh_pipe(n_stages: int) -> Mesh:
    devices = jax.devices()
    assert len(devices) >= n_stages, \
        f"need {n_stages} devices, have {len(devices)}"
    return Mesh(np.array(devices[:n_stages]), ("pipe",))


def stack_blocks(blocks: list):
    """Stack a list of res-block param trees into one (depth, ...) tree —
    the layout `pp_trunk_apply` shards over 'pipe'."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def _pp_stage(local_blocks, micro, n_stages: int, n_micro: int):
    """Per-stage body run under shard_map: `local_blocks` is this stage's
    (depth/S, ...) slice of the trunk, `micro` the replicated
    (n_micro, micro_b, hidden) microbatch stack. Returns the trunk output
    for every microbatch, replicated via a final psum (only the last
    stage's buffer is nonzero)."""
    from links_tpu.core import nn
    from links_tpu.models.lifters import res_block_apply

    sid = jax.lax.axis_index("pipe")
    ring = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def run_local(h):
        def body(h, blk):
            return nn.leaky_relu(res_block_apply(blk, h)), None

        return jax.lax.scan(body, h, local_blocks)[0]

    def tick(carry, t):
        state, out = carry
        # stage 0 injects microbatch t (clipped reads past the end feed the
        # drain ticks; their results never reach a valid write slot below)
        inject = micro[jnp.clip(t, 0, n_micro - 1)]
        h = run_local(jnp.where(sid == 0, inject, state))
        # the last stage finishes microbatch t-(S-1) at tick t
        widx = t - (n_stages - 1)
        write = (sid == n_stages - 1) & (widx >= 0)
        out = jnp.where(write,
                        out.at[jnp.clip(widx, 0, n_micro - 1)].set(h),
                        out)
        state = jax.lax.ppermute(h, "pipe", ring)
        return (state, out), None

    # the carry is device-varying (each stage holds its own activation /
    # output buffer); the zero init must be cast to varying to typecheck
    init = jax.lax.pcast((jnp.zeros_like(micro[0]), jnp.zeros_like(micro)),
                         ("pipe",), to="varying")
    (_, out), _ = jax.lax.scan(tick, init,
                               jnp.arange(n_micro + n_stages - 1))
    return jax.lax.psum(out, "pipe")


def pp_trunk_apply(blocks, x, mesh: Mesh, n_micro: int):
    """GPipe forward of a depth-stacked res-block trunk.

    ``blocks``: pytree with leading depth axis (see `stack_blocks`),
    sharded over 'pipe' (depth % n_stages == 0). ``x``: (B, hidden) with
    B % n_micro == 0. Numerically identical to the sequential
    scan-over-depth apply (tests/test_parallel.py::test_pipeline_*).
    """
    n_stages = mesh.shape["pipe"]
    depth = jax.tree.leaves(blocks)[0].shape[0]
    # user-input guards: ValueError, not assert (asserts vanish under -O
    # and would let a ragged split silently produce wrong shapes)
    if depth % n_stages != 0:
        raise ValueError(
            f"trunk depth {depth} not divisible by {n_stages} pipe stages")
    if x.shape[0] % n_micro != 0:
        raise ValueError(
            f"batch {x.shape[0]} not divisible by n_micro={n_micro}")
    micro = x.reshape(n_micro, x.shape[0] // n_micro, x.shape[-1])
    fwd = jax.shard_map(
        lambda blk, m: _pp_stage(blk, m, n_stages, n_micro),
        mesh=mesh,
        in_specs=(P("pipe"), P()),
        out_specs=P(),
    )
    out = fwd(blocks, micro)
    return out.reshape(x.shape)


def pp_trunk_sharding(mesh: Mesh, blocks):
    """NamedSharding pytree placing a stacked trunk's depth axis over
    'pipe' — stage s holds blocks [s·D/S, (s+1)·D/S) and nothing else."""
    return jax.tree.map(
        lambda _: NamedSharding(mesh, P("pipe")), blocks)
