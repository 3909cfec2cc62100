"""Benchmark driver: prints ONE JSON line
``{"metric", "value", "unit", "vs_baseline"}``.

Metric: poses/sec/chip of the flagship stage-3a train step (left+right
lifters + three frozen flows + all five losses + Adam), the BASELINE.json
parity config, at the reference batch size (256 loader rows per step).
Steady-state throughput is measured by scanning many steps in one device
program (links_tpu/train/loop.py), mirroring how the framework actually
trains.

Baseline: the same computation in torch fp32 on CPU (the reference is a
single-device torch program; it is not runnable as shipped — FrEIA missing,
broken imports — so benchmarks/torch_baseline.py reimplements the identical
step). Measured once and cached in BENCH_BASELINE.json.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

BATCH = 256          # reference loader batch (train_left_right_lifter.py:43)
SCAN_STEPS = 64      # steps fused into one device program
REPEATS = 3
BASELINE_CACHE = Path(__file__).parent / "BENCH_BASELINE.json"


def _measure_tpu(batch: int = BATCH, bf16: bool = True) -> float:
    import jax
    import jax.numpy as jnp

    from links_tpu import flows, models, train
    from links_tpu.config import LifterTrainConfig
    from links_tpu.objectives import LifterFrozen

    cfg = LifterTrainConfig(batch_size=batch, bf16=bf16)
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

    data = jax.random.normal(keys[5], (batch * SCAN_STEPS, 34), jnp.float32) * 0.1
    data = data.reshape(-1, 2, 17).at[:, :, 0].set(0.0).reshape(-1, 34)
    epoch_fn = train.make_epoch_fn(step, batch_size=batch)

    key = jax.random.PRNGKey(1)
    # compile + warmup
    state, losses = epoch_fn(state, data, key)
    jax.block_until_ready(losses["loss"])
    best = 0.0
    for i in range(REPEATS):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        state, losses = epoch_fn(state, data, sub)
        jax.block_until_ready(losses["loss"])
        dt = time.perf_counter() - t0
        best = max(best, batch * SCAN_STEPS / dt)
    return best


def _baseline_poses_per_sec() -> float:
    if BASELINE_CACHE.exists():
        cached = json.loads(BASELINE_CACHE.read_text())
        return cached["poses_per_sec"]
    from benchmarks.torch_baseline import measure_poses_per_sec

    value = measure_poses_per_sec(batch_size=BATCH)
    BASELINE_CACHE.write_text(json.dumps({
        "poses_per_sec": value,
        "what": "torch-CPU reference-equivalent stage-3a train step, fp32, "
                f"batch {BATCH} (see benchmarks/torch_baseline.py)",
        "measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
    }, indent=2))
    return value


def main():
    baseline = _baseline_poses_per_sec()
    value = _measure_tpu()
    print(json.dumps({
        "metric": "stage3a_train_poses_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "poses/s",
        "vs_baseline": round(value / baseline, 2),
    }))


if __name__ == "__main__":
    main()
