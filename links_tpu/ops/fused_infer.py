"""Fused single-kernel lifter forward for low-latency serving.

The serving forward (`links-lift`, cli/lift.py) at small batch is
launch-bound, not compute-bound: XLA schedules the two side lifters as ~28
separate 1024-wide matmul kernels whose per-kernel fixed cost dominates —
PERF.md measures 1.45 ms at batch 256 against ~0.2 ms of actual math.

This kernel runs BOTH side lifters end to end in ONE Pallas program:

* grid = (2 sides); the whole 7-res_block trunk runs in ONE grid step per
  side, with the (2, 1024, 1024) per-block weight pairs double-buffered
  HBM→VMEM by explicit async DMA inside a fori_loop — the next block's
  weights stream while the current block computes. Auto-pipelined
  per-block grid steps were measured first and their fixed per-step cost
  (~20 µs × 14) kept the kernel at XLA's ~0.3 ms; manual DMA removes it,
  leaving weight bandwidth (~58 MB bf16 for both sides ≈ 71 µs) as the
  bound.
* activations (current, residual skip, trunk fork) live in VMEM scratch
  across grid steps; the trunk output is saved once and restored when the
  angle chain forks off it (models_def.py:88-107 topology).
* upscale / downscale / angle heads are folded into the first and last
  steps of each side, so one kernel emits both (depth offsets, elevation)
  heads for both sides.

Numerics match the bf16 `nn.Policy` exactly (bf16 multiplies, f32
accumulation, f32 bias/LeakyReLU/residual) — the same policy the trainers
use; tests/test_fused_infer.py pins equality against `lifter_apply`.

Scope: inference only (the training step is HBM-bound on optimizer traffic
where kernel fusion cannot win — PERF.md tombstone), batch ≤ 512 per call
(the latency regime; larger requests are throughput-bound and XLA already
handles them well — cli/lift.py chunks requests anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from links_tpu.core.skeleton import combine_left_right_pred_1d, split_data_left_right

LANE = 128
MAX_BATCH = 512
_CHAIN = ("res_common", "res_pose1", "res_pose2", "res_pose3",
          "res_angle1", "res_angle2", "res_angle3")
_SLOPE = 0.01  # torch-default LeakyReLU (models_def.py:28)


def _leaky(x):
    return jnp.where(x >= 0, x, _SLOPE * x)


def prepare_fused_weights(stacked_params):
    """Pack a stacked (left, right) lifter pytree (models/lifters.py
    layout, leading axis 2) into the kernel's streaming tensors. Do this
    ONCE at model load; the result is an ordinary pytree to pass through
    jit boundaries.

    Chain weights go bf16 (the multiply dtype of the bf16 policy); biases
    stay f32 (added post-accumulation, exactly like `nn.dense`)."""
    if "qkv" in stacked_params:
        raise ValueError(
            "the fused serving kernel covers the MLP lifter layout only; "
            "this checkpoint holds attention-lifter params (qkv leaf) — "
            "serve it without --fused (lifter_apply dispatches on the "
            "param structure)")
    ws, bs = [], []
    for blk in _CHAIN:
        ws.append(jnp.stack([stacked_params[blk]["l1"]["w"],
                             stacked_params[blk]["l2"]["w"]], axis=1))
        bs.append(jnp.stack([stacked_params[blk]["l1"]["b"],
                             stacked_params[blk]["l2"]["b"]], axis=1))
    w_chain = jnp.stack(ws, axis=1).astype(jnp.bfloat16)   # (2, 7, 2, H, H)
    b_chain = jnp.stack(bs, axis=1)                        # (2, 7, 2, H)

    w_up = stacked_params["upscale"]["w"]                  # (2, 2J, H)
    in_dim = w_up.shape[1]
    w_up = jnp.pad(w_up, ((0, 0), (0, LANE - in_dim), (0, 0)))

    def head(name):
        w = stacked_params[name]["w"]                      # (2, H, out)
        b = stacked_params[name]["b"]                      # (2, out)
        out = w.shape[-1]
        return (jnp.pad(w, ((0, 0), (0, 0), (0, LANE - out))).astype(jnp.bfloat16),
                jnp.pad(b, ((0, 0), (0, LANE - out))))

    w_down, b_down = head("downscale")
    w_ang, b_ang = head("angles")
    return {
        "w_up": w_up.astype(jnp.bfloat16), "b_up": stacked_params["upscale"]["b"],
        "w_chain": w_chain, "b_chain": b_chain,
        "w_down": w_down, "b_down": b_down,
        "w_ang": w_ang, "b_ang": b_ang,
    }


def _kernel(x_ref, wup_ref, bup_ref, wc_hbm, bc_ref, wd_ref, bd_ref,
            wa_ref, ba_ref, xd_ref, xa_ref, cur, trunk, wbuf, sem):
    s = pl.program_id(0)  # side 0/1
    n_blocks = bc_ref.shape[0] // 2

    def side_row(ref):
        # biases are full-resident (tiny); TPU blocks can't have a
        # 1-sublane dim, so select the side's row with static indices
        return jnp.where(s == 0, ref[0], ref[1])[None, :]

    def block_dma(slot, j):
        # weights stay in HBM; stream block j's (2, H, H) matmul pair
        return pltpu.make_async_copy(wc_hbm.at[s, j], wbuf.at[slot],
                                     sem.at[slot])

    block_dma(0, 0).start()

    # upscale prologue: raw dense output is block 0's input
    cur[:] = (jnp.dot(x_ref[0].astype(jnp.bfloat16), wup_ref[0],
                      preferred_element_type=jnp.float32)
              + side_row(bup_ref))

    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * n_blocks), 1)

    def body(j, _):
        slot = j % 2

        @pl.when(j + 1 < n_blocks)
        def _():
            block_dma((j + 1) % 2, j + 1).start()

        block_dma(slot, j).wait()

        @pl.when(j == 4)
        def _():  # the angle chain forks off the trunk activation
            cur[:] = trunk[:]

        # one-hot bias row for (side, block) from the resident
        # (2*n_blocks, 2, H) table — no dynamic sublane indexing
        sel = (iota == s * n_blocks + j).astype(jnp.float32)
        b1 = jnp.dot(sel, bc_ref[:, 0, :], preferred_element_type=jnp.float32)
        b2 = jnp.dot(sel, bc_ref[:, 1, :], preferred_element_type=jnp.float32)

        x = cur[:]
        h = _leaky(jnp.dot(x.astype(jnp.bfloat16), wbuf[slot, 0],
                           preferred_element_type=jnp.float32) + b1)
        h = _leaky(jnp.dot(h.astype(jnp.bfloat16), wbuf[slot, 1],
                           preferred_element_type=jnp.float32) + b2)
        cur[:] = _leaky(h + x)  # residual + the outer LeakyReLU

        @pl.when(j == 0)
        def _():  # trunk = leaky(res_common(up)) — both heads branch here
            trunk[:] = cur[:]

        @pl.when(j == 3)
        def _():  # pose chain done → depth-offset head
            xd_ref[0] = (jnp.dot(cur[:].astype(jnp.bfloat16), wd_ref[0],
                                 preferred_element_type=jnp.float32)
                         + side_row(bd_ref))

        @pl.when(j == n_blocks - 1)
        def _():  # angle chain done → elevation head
            xa_ref[0] = (jnp.dot(cur[:].astype(jnp.bfloat16), wa_ref[0],
                                 preferred_element_type=jnp.float32)
                         + side_row(ba_ref))

        return 0

    jax.lax.fori_loop(0, n_blocks, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_sides_forward(prep, left_inp, right_inp, *, interpret: bool = False):
    """Both side lifters in one kernel: (B, 2J) × 2 →
    ((B, J), (B, J), (B, 1), (B, 1)) = (left depth, right depth,
    left angle, right angle). B ≤ 512."""
    n = left_inp.shape[0]
    if n > MAX_BATCH:
        raise ValueError(
            f"fused serving kernel is the latency path (batch <= {MAX_BATCH}); "
            f"chunk larger requests (cli/lift.py does)")
    bt = max(16, -(-n // 16) * 16)
    in_dim = left_inp.shape[1]      # 2J
    out_dim = in_dim // 2           # J depth offsets per side
    hidden = prep["w_chain"].shape[-1]
    n_blocks = prep["w_chain"].shape[1]

    x = jnp.zeros((2, bt, LANE), jnp.float32)
    x = x.at[0, :n, :in_dim].set(left_inp).at[1, :n, :in_dim].set(right_inp)

    side = lambda s: (s, 0, 0)
    xd, xa = pl.pallas_call(
        _kernel,
        grid=(2,),
        in_specs=[
            pl.BlockSpec((1, bt, LANE), side, memory_space=pltpu.VMEM),       # x
            pl.BlockSpec((1, LANE, hidden), side, memory_space=pltpu.VMEM),   # w_up
            pl.BlockSpec(memory_space=pltpu.VMEM),                            # b_up
            pl.BlockSpec(memory_space=pl.ANY),                             # w_chain (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),                            # b_chain
            pl.BlockSpec((1, hidden, LANE), side, memory_space=pltpu.VMEM),   # w_down
            pl.BlockSpec(memory_space=pltpu.VMEM),                            # b_down
            pl.BlockSpec((1, hidden, LANE), side, memory_space=pltpu.VMEM),   # w_ang
            pl.BlockSpec(memory_space=pltpu.VMEM),                            # b_ang
        ],
        out_specs=(
            pl.BlockSpec((1, bt, LANE), side, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, LANE), side, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((2, bt, LANE), jnp.float32),
            jax.ShapeDtypeStruct((2, bt, LANE), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bt, hidden), jnp.float32),              # cur
            pltpu.VMEM((bt, hidden), jnp.float32),              # trunk
            pltpu.VMEM((2, 2, hidden, hidden), jnp.bfloat16),   # wbuf ×2 slots
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bt * hidden * (LANE + 2 * n_blocks * hidden
                                         + 2 * LANE),
            bytes_accessed=2 * n_blocks * 2 * hidden * hidden * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, prep["w_up"], prep["b_up"],
      prep["w_chain"], prep["b_chain"].reshape(2 * n_blocks, 2, hidden),
      prep["w_down"], prep["b_down"], prep["w_ang"], prep["b_ang"])
    return (xd[0, :n, :out_dim], xd[1, :n, :out_dim],
            xa[0, :n, :1], xa[1, :n, :1])


@functools.partial(jax.jit, static_argnames=("choice", "interpret"))
def lift_left_right_eval_fused(prep, poses_2d, depth_offset: float = 10.0,
                               choice: str = "right", *,
                               interpret: bool = False):
    """Fused-kernel twin of ``objectives.lift_left_right_eval``
    (eval_h36m.py:50-78 semantics): (N, 34) normalized 2D → (N, 51)
    camera-frame 3D."""
    n = poses_2d.shape[0]
    left_inp, right_inp = split_data_left_right(poses_2d)
    ld, rd, _, _ = fused_sides_forward(prep, left_inp, right_inp,
                                       interpret=interpret)
    pred = combine_left_right_pred_1d(ld, rd, choice).reshape(n, 17)
    pred = pred.at[:, 0].set(0.0)
    depth = pred + depth_offset
    p2 = poses_2d.reshape(n, 2, 17)
    return jnp.concatenate(
        [(p2 * depth[:, None, :]).reshape(n, 34), depth], axis=1
    )
