"""Flow NLL objectives — stages 1 and 2.

Stage 1 (train_full_pose_norm_flow.py:67-98): the full-pose flow minimizes
NLL on real 2D poses plus NLL on its own perturbed-latent samples
(self-sampling regularization; the sampler runs under stop_gradient).

Stage 2 (train_leg_torso_left_right_norm_flow.py:100-176): four part flows
(left/right sides 22-dim, legs 14, torso 20) minimize NLL on the
corresponding splits of real poses *and* of samples drawn from the frozen
full-pose flow.
"""

from __future__ import annotations

import jax

from links_tpu import flows
from links_tpu.core import nn
from links_tpu.core.skeleton import split_data_left_right, split_data_legs_torso


def _nll_reduce(z, logdet, nll_cap: float):
    v = flows.nll(z, logdet)
    if nll_cap:
        v = flows.soft_cap_nll(v, nll_cap)
    return v.mean()


def full_flow_loss(params, perm, poses_2d, key, noise_factor: float = 0.2,
                   policy: nn.Policy = nn.F32, nll_cap: float = 0.0):
    """Stage-1 loss: mean NLL(real) + mean NLL(self-samples).

    Returns (loss, aux) with the reference's loss keys
    (train_full_pose_norm_flow.py:78,91,93). ``nll_cap`` > 0 winsorizes the
    per-sample NLLs (both terms) through ``flows.soft_cap_nll`` — the
    robust-training path for heavy-tailed detector corpora; 0 keeps the
    reference's raw MLE.
    """
    flow = flows.Flow(params, perm)
    z, logdet = flows.forward(flow, poses_2d, policy)
    dist_2d = _nll_reduce(z, logdet, nll_cap)

    samples = flows.draw_samples(flow, poses_2d, key, noise_factor, policy=policy)
    z_s, logdet_s = flows.forward(flow, samples, policy)
    dist_2d_sample = _nll_reduce(z_s, logdet_s, nll_cap)

    loss = dist_2d + dist_2d_sample
    return loss, {"dist_2d": dist_2d, "dist_2d_sample": dist_2d_sample, "loss": loss}


def part_flows_loss(part_params, part_perms, full_flow: flows.Flow, poses_2d,
                    key, noise_factor: float = 0.2, policy: nn.Policy = nn.F32,
                    nll_cap: float = 0.0):
    """Stage-2 loss over the four part flows.

    ``part_params``/``part_perms``: dicts keyed 'left','right','legs','torso'.
    The left/right flows share dimensionality (22) and are evaluated as one
    stacked vmap; legs (14) and torso (20) run separately.

    Returns (loss, aux) with the reference loss keys
    (train_leg_torso_left_right_norm_flow.py:126-166). ``nll_cap`` as in
    ``full_flow_loss``.
    """
    import jax.numpy as jnp

    samples = flows.draw_samples(full_flow, poses_2d, key, noise_factor, policy=policy)

    def _nll_mean(name, x):
        flow = flows.Flow(part_params[name], part_perms[name])
        z, ld = flows.forward(flow, x, policy)
        return _nll_reduce(z, ld, nll_cap)

    def _per_source(x):
        left, right = split_data_left_right(x)
        legs, torso = split_data_legs_torso(x)
        # left/right flows: identical shapes -> stack + vmap one matmul chain
        lr_params = jax.tree.map(
            lambda a, b: jnp.stack([a, b]), part_params["left"], part_params["right"]
        )
        lr_perms = jnp.stack([part_perms["left"], part_perms["right"]])

        def one_side(p, w, xs):
            z, ld = flows.forward(flows.Flow(p, w), xs, policy)
            return _nll_reduce(z, ld, nll_cap)

        lr = jax.vmap(one_side)(lr_params, lr_perms, jnp.stack([left, right]))
        return {
            "left": lr[0],
            "right": lr[1],
            "legs": _nll_mean("legs", legs),
            "torso": _nll_mean("torso", torso),
        }

    real = _per_source(poses_2d)
    samp = _per_source(samples)
    aux = {f"dist_2d_{k}": v for k, v in real.items()}
    aux.update({f"dist_2d_{k}_sample": v for k, v in samp.items()})
    loss = sum(real.values()) + sum(samp.values())
    aux["loss"] = loss
    return loss, aux
