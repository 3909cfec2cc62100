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


def soft_cap_nll(v, cap: float):
    """Robust per-sample NLL: identity below ``cap``, logarithmic above
    (cap + log1p(v − cap)).

    Monotone and C¹ (slope 1 at the junction), so ordering is preserved and
    near-manifold samples train exactly as before, while an off-manifold
    sample's gradient is damped by 1/(1 + v − cap) instead of growing with
    0.5·‖z‖² — which reaches ~1e13 when a coupling stack (exp(s) ≤ e² per
    block, 8 blocks) meets a heavy-tailed input. Detector-2D corpora have
    exactly those tails (data/synthetic.py confident-miss model; the paper's
    supplementary §1 failure profile), and the unclamped MLE flow
    demonstrably destabilizes on them at scale (runs/r4/models_det round-4
    first pass: self-sample NLL oscillating 5e5–1.4e7 at epochs 97–99,
    which then detonated both stage-3 lifters). ``cap`` ≫ any healthy NLL
    (those sit near −100) leaves the reference recipe numerically intact.
    """
    over = jnp.maximum(v - cap, 0.0)
    return jnp.where(v > cap, cap + jnp.log1p(over), v)


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
