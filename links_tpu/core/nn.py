"""Minimal functional NN primitives shared by flows and models.

Models are plain pytrees (nested dicts of jnp arrays) with pure
``init(key, ...) -> params`` / ``apply(params, x) -> y`` functions — the
idiomatic JAX shape for vmapping whole model families (e.g. stacking the 8
occlusion completers or the 8 flow blocks on a leading axis).

Initialization matches torch.nn.Linear defaults (kaiming-uniform with
a=sqrt(5) reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and
bias) so training trajectories are comparable with the reference.

Mixed precision: TPU MXU natively multiplies bf16 with f32 accumulation.
``dense`` casts activations/weights to a compute dtype and requests f32
accumulation via ``preferred_element_type`` — params stay f32 (the
TPU-native analogue of the reference's PL ``precision=16``,
train_left_right_lifter.py:555, without loss scaling).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Dtype policy: params in ``param_dtype``, matmuls in ``compute_dtype``
    with f32 accumulation, outputs back in ``output_dtype``."""

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    output_dtype: jnp.dtype = jnp.float32


F32 = Policy()
BF16 = Policy(compute_dtype=jnp.bfloat16)


def init_linear(key, fan_in: int, fan_out: int, dtype=jnp.float32):
    """torch.nn.Linear-default initialization. Weight stored (fan_in, fan_out)
    so forward is x @ w (row-major batch on the MXU)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (fan_out,), dtype, -bound, bound),
    }


# Activation-range recording for static int8 calibration
# (ops/quant.py:quantize_params_static). When a dict is installed here,
# every EAGER (un-jitted, un-vmapped) ``dense`` call records the max |x| it
# saw, keyed by id() of its param sub-dict — valid because apply functions
# index the pytree directly (p["upscale"], ...), so eager calls receive the
# exact dict objects of the tree being calibrated.
_CALIB = None


def record_activation_ranges():
    """Context manager yielding the {id(linear_dict): max|x|} record."""
    import contextlib

    @contextlib.contextmanager
    def _cm():
        global _CALIB
        prev, _CALIB = _CALIB, {}
        try:
            yield _CALIB
        finally:
            _CALIB = prev

    return _cm()


def dense(params, x, policy: Policy = F32):
    """y = x @ w + b under the dtype policy (bf16 multiply / f32 accumulate
    when policy.compute_dtype == bf16).

    Dispatches on the param layout: an int8-quantized linear
    (``w_q``/``w_scale`` from ops/quant.py:quantize_params) runs the
    s8×s8→s32 MXU path — activations quantized with either dynamic per-row
    scales or a calibrated static per-tensor scale (``x_scale`` present) —
    so every model apply serves quantized weights without code changes."""
    if "w_q" in params:
        return _dense_int8(params, x, policy)
    if _CALIB is not None and "w" in params:
        key = id(params)
        amax = float(jnp.max(jnp.abs(x)))
        _CALIB[key] = max(_CALIB.get(key, 0.0), amax)
    w = params["w"].astype(policy.compute_dtype)
    xc = x.astype(policy.compute_dtype)
    y = jnp.dot(xc, w, preferred_element_type=jnp.float32)
    return (y + params["b"]).astype(policy.output_dtype)


def _dense_int8(params, x, policy: Policy = F32):
    """w8a8 serving matmul (ops/quant.py scheme): per-output-channel weight
    scales; activation scales either dynamic per-row (default) or static
    per-tensor from offline calibration (``x_scale`` leaf) — the static
    path removes the per-row |max| reduction + divide from the serving
    program entirely (PERF.md int8 section). int32 MXU accumulation."""
    x = x.astype(jnp.float32)
    if "x_scale" in params:
        x_scale = params["x_scale"]
    else:
        x_scale = jnp.maximum(
            jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-12) / 127.0
    x_q = jnp.clip(jnp.round(x / x_scale), -127, 127).astype(jnp.int8)
    acc = jnp.dot(x_q, params["w_q"], preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (x_scale * params["w_scale"])
    return (y + params["b"]).astype(policy.output_dtype)


def leaky_relu(x, negative_slope: float = 0.01):
    """torch default LeakyReLU (reference models_def.py:28)."""
    return jnp.where(x >= 0, x, negative_slope * x)


def init_layernorm(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layernorm(params, x, eps: float = 1e-5):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * params["scale"] + params["bias"]


def dropout(key: Optional[jax.Array], x, rate: float, deterministic: bool):
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)
