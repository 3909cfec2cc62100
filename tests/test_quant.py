"""Int8 post-training quantization (ops/quant.py + nn.dense dispatch)."""

import jax
import jax.numpy as jnp
import numpy as np

from links_tpu import models
from links_tpu.core import nn
from links_tpu.objectives import lift_left_right_eval
from links_tpu.ops.quant import is_quantized, quantize_params

HID = 128


def test_dense_int8_matches_manual(rng):
    lin = nn.init_linear(jax.random.PRNGKey(0), 64, 32)
    q = quantize_params(lin)
    assert q["w_q"].dtype == jnp.int8
    assert q["w_scale"].shape == (1, 32)
    # int8 weights reconstruct the f32 weights to within half a step
    w_back = np.asarray(q["w_q"], np.float32) * np.asarray(q["w_scale"])
    step = np.asarray(q["w_scale"])
    assert np.all(np.abs(w_back - np.asarray(lin["w"])) <= 0.5 * step + 1e-8)

    x = rng.normal(size=(16, 64)).astype(np.float32)
    got = np.asarray(nn.dense(q, jnp.asarray(x)))
    # manual reference computation of the w8a8 path
    xs = np.maximum(np.abs(x).max(-1, keepdims=True), 1e-12) / 127.0
    xq = np.clip(np.round(x / xs), -127, 127).astype(np.int8)
    want = (xq.astype(np.int32) @ np.asarray(q["w_q"], np.int32)).astype(
        np.float32) * (xs * np.asarray(q["w_scale"])) + np.asarray(lin["b"])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    # and it approximates the f32 dense closely on tame inputs
    exact = np.asarray(nn.dense(lin, jnp.asarray(x)))
    rel = np.linalg.norm(got - exact) / np.linalg.norm(exact)
    assert rel < 0.02, rel


def test_quantize_params_structure_and_passthrough():
    lifter = models.init_lifter(jax.random.PRNGKey(1), 11, hidden=HID,
                                use_layernorm=True)
    q = quantize_params(lifter)
    assert is_quantized(q) and not is_quantized(lifter)
    # structure preserved: same top-level modules, layernorms untouched
    assert set(q) == set(lifter)
    np.testing.assert_array_equal(
        np.asarray(q["res_common"]["ln1"]["scale"]),
        np.asarray(lifter["res_common"]["ln1"]["scale"]))
    # every linear converted, biases kept f32
    assert "w" not in q["upscale"] and q["upscale"]["w_q"].dtype == jnp.int8
    assert q["downscale"]["b"].dtype == jnp.float32
    # idempotent-safe: a quantized tree has no {"w","b"} linears left
    assert not any(getattr(l, "dtype", None) == jnp.float64
                   for l in jax.tree.leaves(q))


def test_quantized_lifter_forward_close_to_f32(rng):
    """The full serving forward (vmapped stacked side lifters, 7 res
    blocks deep) stays close to f32 under w8a8 — the PERF.md accuracy
    claim at unit-test scale."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    stacked = jax.tree.map(
        lambda a, b: jnp.stack([a, b]),
        models.init_lifter(k1, 11, hidden=HID),
        models.init_lifter(k2, 11, hidden=HID),
    )
    qstacked = quantize_params(stacked)
    assert qstacked["upscale"]["w_q"].shape == (2, 22, HID)
    assert qstacked["upscale"]["w_scale"].shape == (2, 1, HID)

    p = rng.normal(size=(32, 2, 17)).astype(np.float32) * 0.1
    p[:, :, 0] = 0.0
    poses = jnp.asarray(p.reshape(32, 34))

    exact = np.asarray(jax.jit(lift_left_right_eval)(stacked, poses))
    quant = np.asarray(jax.jit(lift_left_right_eval)(qstacked, poses))
    assert quant.shape == (32, 51)
    rel = np.linalg.norm(quant - exact) / np.linalg.norm(exact)
    assert rel < 0.02, rel


def test_quantize_skips_attention_qkv(rng):
    """The attention lifter's bespoke 4-D qkv tensor (read directly by
    attention_lifter_apply, not through nn.dense) must survive
    quantization untouched — and the quantized tree must still apply."""
    from links_tpu.models.attention import init_attention_lifter
    from links_tpu.models.lifters import lifter_apply

    p = models_attention = init_attention_lifter(
        jax.random.PRNGKey(6), 11, num_heads=2)
    q = quantize_params(models_attention)
    # qkv kept verbatim (4-D w indexed by shape in apply), pos kept
    np.testing.assert_array_equal(np.asarray(q["qkv"]["w"]),
                                  np.asarray(p["qkv"]["w"]))
    assert q["qkv"]["w"].dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(q["pos"]), np.asarray(p["pos"]))
    # standard linears did convert
    assert q["proj"]["w_q"].dtype == jnp.int8
    assert q["upscale"]["w_q"].dtype == jnp.int8

    x = jnp.asarray(rng.normal(size=(4, 22)).astype(np.float32) * 0.1)
    exact, _ = lifter_apply(p, x)
    quant, _ = lifter_apply(q, x)
    rel = np.linalg.norm(np.asarray(quant) - np.asarray(exact)) / max(
        np.linalg.norm(np.asarray(exact)), 1e-9)
    assert rel < 0.1, rel


def test_static_quant_dense_and_coverage(rng):
    """quantize_params_static: linears reached by the eager calibration
    forward get a per-tensor x_scale (static path — no per-row reduction in
    the serving program); unreached ones fall back to dynamic."""
    from links_tpu.models.lifters import lifter_apply
    from links_tpu.ops.quant import quantize_params_static

    lifter = models.init_lifter(jax.random.PRNGKey(7), 11, hidden=HID)
    calib = rng.normal(size=(64, 22)).astype(np.float32) * 0.1

    q, n_static, n_dynamic = quantize_params_static(
        lifter, lambda p: lifter_apply(p, calib))
    # the lifter forward touches every one of its 17 linears
    assert n_static == 17 and n_dynamic == 0
    assert q["upscale"]["x_scale"].shape == ()
    # calibrated scale = max|calib| / 127 for the input layer
    np.testing.assert_allclose(float(q["upscale"]["x_scale"]),
                               np.abs(calib).max() / 127.0, rtol=1e-6)

    # static forward ≈ f32 forward on data from the calibration distribution
    x = jnp.asarray(rng.normal(size=(16, 22)).astype(np.float32) * 0.1)
    exact, _ = lifter_apply(lifter, x)
    stat, _ = jax.jit(lifter_apply)(q, x)
    rel = np.linalg.norm(np.asarray(stat) - np.asarray(exact)) / np.linalg.norm(
        np.asarray(exact))
    assert rel < 0.03, rel

    # a runner that touches nothing → all-dynamic fallback, still applies
    q2, s2, d2 = quantize_params_static(lifter, lambda p: None)
    assert s2 == 0 and d2 == 17
    assert "x_scale" not in q2["upscale"]
    dyn, _ = jax.jit(lifter_apply)(q2, x)
    assert np.isfinite(np.asarray(dyn)).all()


def test_static_quant_stacked_pair(rng):
    """quantize_stacked_static calibrates each slice with its own eager
    apply and restacks; the full vmapped serving forward stays close to
    f32 (the int8-static serving configuration, VERDICT r2 next #5)."""
    from links_tpu.core.skeleton import split_data_left_right
    from links_tpu.models.lifters import lifter_apply
    from links_tpu.ops.quant import quantize_stacked_static

    k1, k2 = jax.random.split(jax.random.PRNGKey(8))
    stacked = jax.tree.map(
        lambda a, b: jnp.stack([a, b]),
        models.init_lifter(k1, 11, hidden=HID),
        models.init_lifter(k2, 11, hidden=HID),
    )
    p = rng.normal(size=(64, 2, 17)).astype(np.float32) * 0.1
    p[:, :, 0] = 0.0
    calib = p.reshape(64, 34)

    def run(params, i):
        sides = split_data_left_right(calib)
        lifter_apply(params, np.asarray(sides[i]))

    qstacked, ns, nd = quantize_stacked_static(stacked, run)
    assert ns == 34 and nd == 0
    assert qstacked["upscale"]["x_scale"].shape == (2,)
    assert qstacked["upscale"]["w_q"].shape == (2, 22, HID)

    poses = jnp.asarray(calib[:16])
    exact = np.asarray(jax.jit(lift_left_right_eval)(stacked, poses))
    stat = np.asarray(jax.jit(lift_left_right_eval)(qstacked, poses))
    rel = np.linalg.norm(stat - exact) / np.linalg.norm(exact)
    assert rel < 0.03, rel


def test_static_quant_stacked_nonuniform_coverage(rng):
    """Coverage mismatch between slices (ADVICE r3): when a linear is
    calibrated in one slice but falls back to dynamic in its sibling, the
    pytree structures differ and the naive stack would die with an opaque
    structure-mismatch error. quantize_stacked_static must demote such
    linears to dynamic uniformly and still produce a servable stack."""
    from links_tpu.models.lifters import lifter_apply
    from links_tpu.ops.quant import quantize_stacked_static

    k1, k2 = jax.random.split(jax.random.PRNGKey(9))
    stacked = jax.tree.map(
        lambda a, b: jnp.stack([a, b]),
        models.init_lifter(k1, 11, hidden=HID),
        models.init_lifter(k2, 11, hidden=HID),
    )
    calib = rng.normal(size=(32, 22)).astype(np.float32) * 0.1

    def run(params, i):
        if i == 0:  # slice 1 never calibrated → zero coverage there
            lifter_apply(params, calib)

    qstacked, ns, nd = quantize_stacked_static(stacked, run)
    # slice 0 covered all 17 linears, slice 1 none → all demoted to dynamic
    assert ns == 0 and nd == 34
    assert "x_scale" not in qstacked["upscale"]
    assert qstacked["upscale"]["w_q"].shape == (2, 22, HID)
    poses = jnp.asarray(rng.normal(size=(8, 34)).astype(np.float32) * 0.1)
    out = np.asarray(jax.jit(lift_left_right_eval)(qstacked, poses))
    assert np.isfinite(out).all()


def test_bf16_policy_close_to_f32(rng):
    """--policy bf16 (serving CLIs): bf16 multiplies / f32 accumulation
    must stay within bf16 rounding of the f32 forward — the 'free' half
    of the PERF.md serving-dtype matrix."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    stacked = jax.tree.map(
        lambda a, b: jnp.stack([a, b]),
        models.init_lifter(k1, 11, hidden=HID),
        models.init_lifter(k2, 11, hidden=HID),
    )
    p = rng.normal(size=(16, 2, 17)).astype(np.float32) * 0.1
    p[:, :, 0] = 0.0
    poses = jnp.asarray(p.reshape(16, 34))
    f32 = np.asarray(jax.jit(lift_left_right_eval, static_argnums=(2, 3, 4))(
        stacked, poses, 10.0, "right", nn.F32))
    bf16 = np.asarray(jax.jit(lift_left_right_eval, static_argnums=(2, 3, 4))(
        stacked, poses, 10.0, "right", nn.BF16))
    assert not np.array_equal(f32, bf16)  # the policy genuinely applied
    rel = np.linalg.norm(bf16 - f32) / np.linalg.norm(f32)
    assert rel < 5e-3, rel


def test_quantized_completers_apply(rng):
    """The stage-4 completer stack serves quantized too (the --scenario
    infill path loads it through the same dispatch)."""
    from links_tpu.models.completers import completer_apply

    comps = models.init_all_completers(jax.random.PRNGKey(3), hidden=HID)
    qcomps = quantize_params(comps)
    x = jnp.asarray(rng.normal(size=(8, 33)).astype(np.float32) * 0.1)
    exact = np.asarray(completer_apply(comps["left_side"], x))
    quant = np.asarray(completer_apply(qcomps["left_side"], x))
    rel = np.linalg.norm(quant - exact) / max(np.linalg.norm(exact), 1e-9)
    assert rel < 0.05, rel
