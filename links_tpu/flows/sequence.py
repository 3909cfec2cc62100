"""Flow sequence: scan-composed coupling blocks + likelihood / sampling
helpers. Equivalent surface to FrEIA's ``SequenceINN`` call convention
``z, log_jac_det = inn(x)`` / ``inn(z, rev=True)``
(train_full_pose_norm_flow.py:75,83)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from links_tpu.core import nn
from links_tpu.core.geometry import add_noise
from links_tpu.flows.coupling import Flow, block_forward, block_inverse, init_flow  # noqa: F401


def forward(flow: Flow, x, policy: nn.Policy = nn.F32):
    """x → (z, log|detJ|), scanning the block stack front to back."""

    def body(carry, blk):
        h, ld = carry
        params, w = blk
        y, j = block_forward(params, w, h, policy)
        return (y, ld + j), None

    # derive the zero carry from x so its varying manual axes match under
    # shard_map (a plain jnp.zeros constant is unvarying and breaks the scan)
    init = (x, (x[..., 0] * 0.0).astype(jnp.float32))
    # unroll: the 8 blocks are tiny matmul chains; unrolling lets XLA
    # overlap them instead of serializing the scan (+17% on the full
    # stage-3a train step, PERF.md)
    (z, logdet), _ = jax.lax.scan(body, init, (flow.params, flow.perm),
                                  unroll=True)
    return z, logdet


def inverse(flow: Flow, z, policy: nn.Policy = nn.F32):
    """z → (x, log|detJ⁻¹|), scanning the block stack back to front."""

    def body(carry, blk):
        h, ld = carry
        params, w = blk
        y, j = block_inverse(params, w, h, policy)
        return (y, ld + j), None

    init = (z, (z[..., 0] * 0.0).astype(jnp.float32))
    (x, logdet), _ = jax.lax.scan(body, init, (flow.params, flow.perm),
                                  reverse=True, unroll=True)
    return x, logdet


def nll(z, logdet):
    """Per-sample negative log-likelihood up to constants:
    0.5·Σz² − log|detJ| (train_full_pose_norm_flow.py:77)."""
    return 0.5 * jnp.sum(z**2, axis=-1) - logdet


def draw_samples(flow: Flow, x, key, noise_factor: float = 0.2,
                 zero_root: bool = True, policy: nn.Policy = nn.F32):
    """Generative sampling around a data batch (train_full_pose_norm_flow.py:81-87):
    encode → perturb latents with magnitude-scaled noise → decode → pin the
    root joint to the origin. Gradients must not flow into the sampler
    (reference wraps it in no_grad); callers apply ``lax.stop_gradient`` —
    done here for safety."""
    z, _ = forward(flow, x, policy)
    z = add_noise(key, z, noise_factor)
    samples, _ = inverse(flow, z, policy)
    if zero_root:
        nj = samples.shape[-1] // 2
        s = samples.reshape(-1, 2, nj)
        samples = s.at[:, :, 0].set(0.0).reshape(-1, 2 * nj)
    return jax.lax.stop_gradient(samples)
