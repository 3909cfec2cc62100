"""Fused serving kernel (links_tpu/ops/fused_infer.py) parity vs the
composed lifter forward — interpret mode, so it runs on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from links_tpu import models
from links_tpu.core import nn
from links_tpu.core.skeleton import split_data_left_right
from links_tpu.objectives import lift_left_right_eval
from links_tpu.ops import (
    fused_sides_forward,
    lift_left_right_eval_fused,
    prepare_fused_weights,
)

HID = 128  # kernel requires lane-aligned hidden; 128 keeps interpret fast


def _stacked(hidden=HID):
    k0, k1 = jax.random.split(jax.random.PRNGKey(0))
    return jax.tree.map(
        lambda a, b: jnp.stack([a, b]),
        models.init_lifter(k0, 11, hidden=hidden),
        models.init_lifter(k1, 11, hidden=hidden),
    )


def _poses(rng, n):
    p = rng.normal(size=(n, 2, 17)).astype(np.float32) * 0.1
    p[:, :, 0] = 0.0
    return jnp.asarray(p.reshape(n, 34))


@pytest.mark.parametrize("batch", [1, 20, 32])
def test_fused_matches_lifter_apply(rng, batch):
    """The kernel must reproduce `lifter_apply` under the bf16 policy —
    same multiply dtype, f32 accumulation/bias/LeakyReLU/residual — for
    both sides, including non-16-multiple batches (padding lanes)."""
    stacked = _stacked()
    prep = prepare_fused_weights(stacked)
    left, right = split_data_left_right(_poses(rng, batch))

    ld, rd, la, ra = fused_sides_forward(prep, left, right, interpret=True)

    want = {}
    for s, inp in ((0, left), (1, right)):
        side_params = jax.tree.map(lambda a: a[s], stacked)
        want[s] = models.lifter_apply(side_params, inp, nn.BF16)
    np.testing.assert_allclose(ld, want[0][0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(rd, want[1][0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(la, want[0][1], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ra, want[1][1], rtol=1e-4, atol=1e-5)
    assert ld.shape == (batch, 11) and la.shape == (batch, 1)


def test_fused_eval_matches_composed(rng):
    """End-to-end serving twin: fused lift == `lift_left_right_eval` with
    the bf16 policy (combine/root-pin/depth/projection included)."""
    stacked = _stacked()
    prep = prepare_fused_weights(stacked)
    poses = _poses(rng, 24)
    got = lift_left_right_eval_fused(prep, poses, 10.0, "right",
                                     interpret=True)
    want = lift_left_right_eval(stacked, poses, 10.0, "right",
                                policy=nn.BF16)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fused_rejects_oversize_batch(rng):
    stacked = _stacked()
    prep = prepare_fused_weights(stacked)
    left, right = split_data_left_right(_poses(rng, 600))
    with pytest.raises(ValueError, match="latency path"):
        fused_sides_forward(prep, left, right, interpret=True)
