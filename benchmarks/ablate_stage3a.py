"""Ablate the stage-3a train step's 2.9 ms (batch 256, bf16) into its
components on the real chip.

PERF.md's roofline puts the param+Adam HBM traffic floor at ~1.5 ms; this
script measures where the rest goes by timing scan chains (one dispatch,
SCAN_STEPS dependent iterations — the same methodology as bench.py) of
progressively smaller pieces of the step:

  full        loss + grad + Adam update          (the flagship step)
  grad        loss + grad only (no optimizer)
  loss        forward losses only (no backward)
  augment     frozen-flow sample augmentation only
  lift_fwd    the two lifter forwards only (no flows/losses)
  adam        optimizer.update + apply_updates on fixed grads

Each piece carries the train state (or params) through the scan so XLA
cannot dead-code it. Prints one JSON line per row.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# NOTE: do not launch this with PYTHONPATH=/root/repo — that breaks the
# axon TPU plugin's registration on this host; the sys.path shim above is
# the supported way to make links_tpu importable.

import jax
import jax.numpy as jnp
import optax

from links_tpu import flows, models, train
from links_tpu.config import LifterTrainConfig
from links_tpu.objectives import LifterFrozen, lifter as lifter_obj
from links_tpu.core import nn

BATCH = 256
SCAN_STEPS = 64
REPEATS = 3


def _chain(body, init_carry, xs):
    """Time a jitted lax.scan chain; returns ms per iteration."""

    @jax.jit
    def run(carry, xs):
        out, _ = jax.lax.scan(body, carry, xs)
        return out

    out = run(init_carry, xs)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = run(init_carry, xs)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        best = min(best, (time.perf_counter() - t0) / SCAN_STEPS)
    return best * 1e3


def main():
    cfg = LifterTrainConfig(batch_size=BATCH, bf16=True)
    policy = nn.Policy(compute_dtype=jnp.bfloat16)
    keys = jax.random.split(jax.random.PRNGKey(0), 6)
    stacked = jax.tree.map(
        lambda a, b: jnp.stack([a, b]),
        models.init_lifter(keys[0], 11),
        models.init_lifter(keys[1], 11),
    )
    frozen = LifterFrozen(
        full_flow=flows.init_flow(keys[2], 34),
        part_a=flows.init_flow(keys[3], 22),
        part_b=flows.init_flow(keys[4], 22),
    )
    optimizer = train.make_optimizer(cfg.optim, steps_per_epoch=SCAN_STEPS)
    step = train.build_left_right_step(frozen, optimizer, cfg)
    state = train.init_state(stacked, optimizer)

    data = jax.random.normal(keys[5], (SCAN_STEPS, BATCH, 34), jnp.float32) * 0.1
    data = data.reshape(-1, 2, 17).at[:, :, 0].set(0.0).reshape(
        SCAN_STEPS, BATCH, 34)
    step_keys = jax.random.split(jax.random.PRNGKey(1), SCAN_STEPS)

    rows = {}

    # full step
    rows["full"] = _chain(lambda s, xs: step(s, xs[0], xs[1]),
                          state, (data, step_keys))

    # loss + grad only: carry params, add grads scaled by 0 so the chain depends
    def loss_fn(params, batch, key):
        k_sample, k_rot = jax.random.split(key)
        inp = lifter_obj.augment_with_samples(
            frozen.full_flow, batch, k_sample, cfg.noise_factor, policy)
        return lifter_obj.left_right_loss(params, frozen, inp, k_rot, cfg, policy)

    def grad_body(params, xs):
        batch, k = xs
        (_, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch, k)
        new = jax.tree.map(lambda p, g: p + 0.0 * g, params, grads)
        return new, ()

    rows["grad"] = _chain(grad_body, stacked, (data, step_keys))

    # forward losses only
    def fwd_body(params, xs):
        batch, k = xs
        loss, _ = loss_fn(params, batch, k)
        new = jax.tree.map(lambda p: p + 0.0 * loss, params)
        return new, ()

    rows["loss"] = _chain(fwd_body, stacked, (data, step_keys))

    # augmentation only
    def aug_body(carry, xs):
        batch, k = xs
        inp = lifter_obj.augment_with_samples(
            frozen.full_flow, batch, k, cfg.noise_factor, policy)
        return carry + 0.0 * inp.sum(), ()

    rows["augment"] = _chain(aug_body, jnp.zeros(()), (data, step_keys))

    # both lifter forwards only (augmented batch size, like the step's 1st call)
    from links_tpu.core.skeleton import split_data_left_right

    def lift_body(params, xs):
        batch, k = xs
        inp = jnp.concatenate([batch, batch], axis=0)
        l, r = split_data_left_right(inp)
        ld, rd, la, ra = lifter_obj._stacked_side_apply(params, l, r, policy)
        s = ld.sum() + rd.sum() + la.sum() + ra.sum()
        return jax.tree.map(lambda p: p + 0.0 * s, params), ()

    rows["lift_fwd"] = _chain(lift_body, stacked, (data, step_keys))

    # Adam update only on fixed grads
    fixed_grads = jax.tree.map(lambda p: jnp.ones_like(p) * 1e-6, stacked)

    def adam_body(carry, _):
        params, opt_state = carry
        updates, opt_state = optimizer.update(fixed_grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), ()

    rows["adam"] = _chain(adam_body, (stacked, optimizer.init(stacked)),
                          jnp.zeros((SCAN_STEPS,)))

    for k, v in rows.items():
        print(json.dumps({"piece": k, "ms_per_step": round(v, 3),
                          "batch": BATCH, "bf16": True}))


if __name__ == "__main__":
    main()
