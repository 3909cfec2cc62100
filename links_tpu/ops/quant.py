"""Int8 quantized serving (w8a8) — the v5e MXU's 2× rate path.

The reference has no quantization story (fp16 training only,
train_left_right_lifter.py:555). For *serving*, the lifters' 1024-wide
matmuls are exactly the shape TPU int8 excels at: v5e multiplies
s8×s8→s32 on the MXU at twice the bf16 rate, and int8 weights quarter the
HBM weight traffic that dominates small-batch latency.

Scheme (standard symmetric post-training quantization):

* weights: per-output-channel scale ``max|w[:, j]| / 127``, rounded to
  int8 once, offline (``quantize_params``);
* activations: dynamic per-row scale ``max|x[i, :]| / 127`` computed at
  run time inside the jitted program (no calibration set needed — the
  LeakyReLU MLP's activation ranges are batch-dependent);
* accumulate in int32 (``preferred_element_type``), rescale in f32, add
  the f32 bias.

Quantized params keep the pytree *structure* of the originals with each
standard linear's ``w`` replaced by ``w_q``/``w_scale`` — ``nn.dense``
dispatches on that, so every apply function serves quantized weights
unchanged. Only plain ``nn.init_linear``-shaped weights (2-D, or 3-D
from a vmap-stacked model pair) are converted; leaves with bespoke
layouts that apply code reads directly — the attention lifter's 4-D
``qkv`` tensor (models/attention.py:33-36) — pass through untouched and
keep running in the float policy. Training is untouched: nothing
produces quantized trees except this module, and gradients through them
are unsupported by design.

Accuracy/throughput: measured in PERF.md ("Int8 serving") — the PA-MPJPE
delta vs f32 on a converged run and the real-chip batch-throughput rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["quantize_params", "is_quantized"]


def _quantize_linear(lin: dict) -> dict:
    w = lin["w"]
    scale = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    w_q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    out = dict(lin)
    del out["w"]
    out["w_q"] = w_q
    out["w_scale"] = scale.astype(jnp.float32)
    return out


def quantize_params(params):
    """Quantize every linear ``{"w", "b"}`` dict in a model pytree to the
    int8 serving format; all other leaves (biases, layernorms, stacked
    leading axes) pass through untouched. Works on any model family in
    this package — single lifters, vmap-stacked pairs, the completer
    stack — because they all share ``nn.init_linear``'s layout."""
    if isinstance(params, dict):
        # only nn.init_linear layouts: (fan_in, fan_out) or one stacked
        # leading axis. Bespoke tensors apply code indexes directly (the
        # attention qkv's (D, 3, H, D/H)) must survive unchanged.
        if set(params) == {"w", "b"} and getattr(params["w"], "ndim", 0) in (2, 3):
            return _quantize_linear(params)
        return {k: quantize_params(v) for k, v in params.items()}
    if isinstance(params, (list, tuple)):
        return type(params)(quantize_params(v) for v in params)
    return params


def is_quantized(params) -> bool:
    return any(
        getattr(leaf, "dtype", None) == jnp.int8
        for leaf in jax.tree.leaves(params)
    )
