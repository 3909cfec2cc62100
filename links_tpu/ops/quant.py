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

__all__ = ["quantize_params", "quantize_params_static", "is_quantized"]


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


def quantize_params_static(params, run_calibration):
    """Int8 quantization with *static* per-tensor activation scales.

    The dynamic scheme (``quantize_params``) computes a per-row ``max|x|``
    reduction + divide inside the serving program; at large batch that VPU
    work outgrows the int8 weight-traffic saving and inverts the speedup
    (PERF.md int8 table, 16k row). Static calibration measures each
    linear's activation range offline on representative data and bakes a
    single per-tensor scale into the quantized params (the standard w8a8
    static-activation scheme), leaving only quantize→matmul→rescale at
    serving time.

    ``run_calibration(params)``: a callable that runs representative
    forward passes EAGERLY (no jit, no vmap) using the exact sub-dict
    objects of ``params`` — e.g. ``lambda p: lifter_apply(p, calib_x)``.
    Eagerness is required because the recorder keys on the identity of the
    param sub-dicts (core/nn.py:record_activation_ranges); jit/vmap
    re-build the pytree and break the keying. Linears never reached by the
    calibration run fall back to dynamic per-row scales (and are reported
    by the returned coverage counter).

    Returns ``(quantized_params, n_static, n_dynamic)``.
    """
    import contextlib

    import numpy as np

    from links_tpu.core import nn

    # Calibration is eager, and on the tunnel-attached TPU every eager op
    # costs seconds — so move the params to host numpy (same tree, same
    # values) and pin the default device to the CPU backend when one
    # exists; the recorded ranges are identical wherever they're computed.
    host = jax.tree.map(lambda a: np.asarray(a), params)
    try:
        ctx = jax.default_device(jax.devices("cpu")[0])
    except RuntimeError:
        ctx = contextlib.nullcontext()
    with nn.record_activation_ranges() as rec, ctx:
        run_calibration(host)

    counts = [0, 0]  # static, dynamic

    def walk(p):
        if isinstance(p, dict):
            if set(p) == {"w", "b"} and getattr(p["w"], "ndim", 0) in (2, 3):
                out = _quantize_linear(
                    {k: jnp.asarray(v) for k, v in p.items()})
                amax = rec.get(id(p))
                if amax is not None and amax > 0.0:
                    counts[0] += 1
                    out["x_scale"] = jnp.float32(amax / 127.0)
                else:
                    counts[1] += 1
                return out
            return {k: walk(v) for k, v in p.items()}
        if isinstance(p, (list, tuple)):
            return type(p)(walk(v) for v in p)
        return jnp.asarray(p) if isinstance(p, np.ndarray) else p

    q = walk(host)
    return q, counts[0], counts[1]


def quantize_stacked_static(stacked, run_calibration_single):
    """``quantize_params_static`` for a leading-axis-stacked model family
    (e.g. the (left, right) lifter pair serving trees stack on axis 0 and
    apply under vmap — lifters.py module docstring). Each slice is
    calibrated with its own plain eager apply
    (``run_calibration_single(params_i, i)``), then the quantized slices
    re-stack; the per-slice 0-d ``x_scale`` leaves stack to (n,) and come
    back 0-d under the serving vmap. If calibration coverage differs
    between slices (e.g. one side's activation range recorded, its
    sibling's not — an all-zero activation falls back to dynamic), the
    slices' pytree structures would differ and the stack would die with an
    opaque structure-mismatch error; instead the affected linears are
    uniformly demoted to dynamic scales across ALL slices and counted as
    such (ADVICE r3). Returns ``(stacked_q, n_static, n_dynamic)`` summed
    over slices."""
    n = jax.tree.leaves(stacked)[0].shape[0]
    slices, tot_s, tot_d = [], 0, 0
    for i in range(n):
        p_i = jax.tree.map(lambda a: a[i], stacked)
        q_i, s, d = quantize_params_static(
            p_i, lambda p: run_calibration_single(p, i))
        slices.append(q_i)
        tot_s += s
        tot_d += d

    # uniform coverage: an x_scale present in only SOME slices is dropped
    # everywhere (that linear serves dynamic in every slice)
    def _xscale_paths(p, prefix=()):
        if isinstance(p, dict):
            if "x_scale" in p:
                yield prefix
            for k, v in p.items():
                yield from _xscale_paths(v, prefix + (k,))
        elif isinstance(p, (list, tuple)):
            for j, v in enumerate(p):
                yield from _xscale_paths(v, prefix + (j,))

    per_slice = [set(_xscale_paths(q)) for q in slices]
    common = set.intersection(*per_slice) if per_slice else set()
    for q, have in zip(slices, per_slice):
        for path in have - common:
            node = q
            for k in path:
                node = node[k]
            del node["x_scale"]
            tot_s -= 1
            tot_d += 1
    return jax.tree.map(lambda *xs: jnp.stack(xs), *slices), tot_s, tot_d


def is_quantized(params) -> bool:
    return any(
        getattr(leaf, "dtype", None) == jnp.int8
        for leaf in jax.tree.leaves(params)
    )
