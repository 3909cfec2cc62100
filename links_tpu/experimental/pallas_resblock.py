"""Pallas TPU kernel: fused residual MLP block.

The res_block (models/lifters.py, reference models_def.py:10-39) is the hot
op of every model in the pipeline — 14 of them run per lifter forward:

    y = leaky_relu(leaky_relu(x @ W1 + b1) @ W2 + b2) + x        (B, 1024)

This kernel fuses both 1024×1024 matmuls, both LeakyReLUs, the bias adds
and the residual add into one VMEM-resident pass per batch tile:

* grid over batch tiles (TILE_B rows); weight blocks use a constant
  index_map so Mosaic's pipeliner fetches W1/W2 from HBM once and keeps
  them in VMEM across the whole grid;
* matmuls run on the MXU with f32 accumulation via
  ``preferred_element_type`` (inputs may be bf16);
* the hidden activation never touches HBM.

The backward pass is a second Pallas kernel using the flash-attention
trick: only ``x`` is saved as a residual and the hidden activations are
*recomputed* in VMEM, trading cheap MXU FLOPs for HBM traffic:

    dh   = (dy ⊙ lrelu'(a2)) @ W2ᵀ ⊙ lrelu'(a1)
    dx   = dy + dh @ W1ᵀ
    dW1  = xᵀ @ dh,  db1 = Σ dh
    dW2  = lrelu(a1)ᵀ @ (dy ⊙ lrelu'(a2)),  db2 = Σ (dy ⊙ lrelu'(a2))

Entry points: ``experimental_res_block_apply`` (links_tpu/experimental/
__init__.py) runs a plain res-block param dict through the kernel, or call
``fused_res_block`` directly. The production ``res_block_apply`` carries no
Pallas routing (the round-2 demotion, PERF.md tombstone). Falls back to
interpret mode off-TPU (tests compare against the reference jnp
implementation for both forward and gradients).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_SLOPE = 0.01
DEFAULT_TILE_B = 256
# the backward kernel's VMEM working set (w1, w2, dw1, dw2 blocks + tiles,
# double-buffered) exceeds Mosaic's 16M default scoped-vmem budget at
# D=1024, especially under vmap; v5e has 128M VMEM per core
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _lrelu(x):
    return jnp.where(x >= 0, x, NEG_SLOPE * x)


def _dlrelu(x):
    return jnp.where(x >= 0, 1.0, NEG_SLOPE)


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref):
    x = x_ref[:]
    a1 = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    h = _lrelu(a1)
    a2 = jnp.dot(h.astype(x.dtype), w2_ref[:],
                 preferred_element_type=jnp.float32) + b2_ref[:]
    y_ref[:] = (_lrelu(a2) + x.astype(jnp.float32)).astype(y_ref.dtype)


def _bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, dy_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
    x = x_ref[:]
    dy = dy_ref[:].astype(jnp.float32)
    # recompute forward intermediates in VMEM
    a1 = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    h = _lrelu(a1)
    a2 = jnp.dot(h.astype(x.dtype), w2_ref[:],
                 preferred_element_type=jnp.float32) + b2_ref[:]
    g2 = dy * _dlrelu(a2)                      # grad at a2
    dh = jnp.dot(g2.astype(x.dtype), w2_ref[:].T,
                 preferred_element_type=jnp.float32)
    g1 = dh * _dlrelu(a1)                      # grad at a1
    dx_ref[:] = (dy + jnp.dot(g1.astype(x.dtype), w1_ref[:].T,
                              preferred_element_type=jnp.float32)
                 ).astype(dx_ref.dtype)

    # weight grads accumulate across batch tiles: zero on first tile
    @pl.when(pl.program_id(0) == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    dw1_ref[:] += jnp.dot(x.T, g1.astype(x.dtype),
                          preferred_element_type=jnp.float32)
    db1_ref[:] += g1.sum(axis=0, keepdims=True)
    dw2_ref[:] += jnp.dot(h.astype(x.dtype).T, g2.astype(x.dtype),
                          preferred_element_type=jnp.float32)
    db2_ref[:] += g2.sum(axis=0, keepdims=True)


def _pad_batch(x, tile_b):
    b = x.shape[0]
    pad = (-b) % tile_b
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)], 0)
    return x, b


def _specs(tile_b, d, h):
    """in_specs for (x, w1, b1, w2, b2) with weights pinned to one block.
    Biases travel as (1, h)/(1, d) blocks — Mosaic requires >=2-D blocks
    whose trailing dims tile to (8, 128), and 2-D biases also keep the
    vmap batching rule lowerable on real TPU."""
    return [
        pl.BlockSpec((tile_b, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_res_block(x, w1, b1, w2, b2, tile_b: int = DEFAULT_TILE_B,
                    interpret: bool = False):
    """y = lrelu(lrelu(x@w1+b1)@w2+b2) + x, fused on TPU. x: (B, D)."""
    return _forward(x, w1, b1, w2, b2, tile_b, interpret)


def _forward(x, w1, b1, w2, b2, tile_b, interpret):
    d, h = w1.shape
    xp, b = _pad_batch(x, tile_b)
    grid = xp.shape[0] // tile_b
    y = pl.pallas_call(
        _fwd_kernel,
        grid=(grid,),
        in_specs=_specs(tile_b, d, h),
        out_specs=pl.BlockSpec((tile_b, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        compiler_params=None if interpret else _COMPILER_PARAMS,
        interpret=interpret,
    )(xp, w1, b1.reshape(1, h), w2, b2.reshape(1, d))
    return y[:b]


def _fwd_rule(x, w1, b1, w2, b2, tile_b, interpret):
    y = _forward(x, w1, b1, w2, b2, tile_b, interpret)
    return y, (x, w1, b1, w2, b2)


def _bwd_rule(tile_b, interpret, res, dy):
    x, w1, b1, w2, b2 = res
    d, h = w1.shape
    # the backward kernel holds four weight-sized buffers (w1, w2, dw1, dw2)
    # in VMEM — at D=1024 f32 that is 16MB by itself, so the batch tile must
    # stay small to fit under the VMEM cap
    tile_b = max(64, tile_b // 4)
    xp, b = _pad_batch(x, tile_b)
    dyp, _ = _pad_batch(dy, tile_b)
    grid = xp.shape[0] // tile_b
    out_shapes = (
        jax.ShapeDtypeStruct(xp.shape, x.dtype),            # dx
        jax.ShapeDtypeStruct((d, h), jnp.float32),           # dw1
        jax.ShapeDtypeStruct((1, h), jnp.float32),           # db1
        jax.ShapeDtypeStruct((h, d), jnp.float32),           # dw2
        jax.ShapeDtypeStruct((1, d), jnp.float32),           # db2
    )
    out_specs = (
        pl.BlockSpec((tile_b, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
    )
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        _bwd_kernel,
        grid=(grid,),
        in_specs=_specs(tile_b, d, h) + [
            pl.BlockSpec((tile_b, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=None if interpret else _COMPILER_PARAMS,
        interpret=interpret,
    )(xp, w1, b1.reshape(1, h), w2, b2.reshape(1, d), dyp)
    return (dx[:b], dw1.astype(w1.dtype), db1.reshape(h).astype(b1.dtype),
            dw2.astype(w2.dtype), db2.reshape(d).astype(b2.dtype))


fused_res_block.defvjp(_fwd_rule, _bwd_rule)


def res_block_reference(x, w1, b1, w2, b2):
    """Plain-jnp reference of the same computation (for tests/fallback)."""
    h = _lrelu(x @ w1 + b1)
    return _lrelu(h @ w2 + b2) + x
