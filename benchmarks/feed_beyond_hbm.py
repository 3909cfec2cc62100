"""Streaming-feed benchmark on a pack LARGER THAN HBM (VERDICT r2 next #4).

Round 2 measured the --packed-data path only on an in-HBM-sized set. This
script builds an LNKS pack bigger than the v5e chip's 16 GB HBM (default
20 GB ≈ 157M rows — a training set that cannot live on device), then
measures the stage-3a training throughput of the double-buffered streaming
feed (train/feed.py) over a bounded number of chunks, against the
device-resident epoch-scan throughput at the same batch size.

The pack exceeds HBM but fits the host's page cache (125 GB RAM), which is
precisely the deployment the loader exists for: host-RAM-resident corpus,
device-resident working set. (A pack beyond host RAM is not constructible
here — 118 GB free disk — and would additionally measure the NVMe, not the
feed.)

Usage (real chip):
    python benchmarks/feed_beyond_hbm.py --gb 20 --chunks 40
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

COLS = 34
MAGIC = 0x4C4E4B53


def build_pack(path: str, n_rows: int, seed: int = 0):
    """Stream-write an LNKS pack of synthetic normalized poses (the byte
    layout of native_loader.pack_dataset, without materializing the array)."""
    rng = np.random.default_rng(seed)
    chunk = 1 << 20
    with open(path, "wb") as f:
        f.write(np.array([MAGIC, 1], dtype=np.uint32).tobytes())
        f.write(np.array([n_rows, COLS], dtype=np.uint64).tobytes())
        written = 0
        while written < n_rows:
            n = min(chunk, n_rows - written)
            block = (rng.normal(size=(n, COLS)).astype(np.float32) * 0.1)
            block.reshape(n, 2, 17)[:, :, 0] = 0.0
            f.write(block.tobytes())
            written += n


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--gb", type=float, default=20.0,
                        help="pack size in GB (must exceed the 16 GB HBM)")
    parser.add_argument("--chunks", type=int, default=40,
                        help="streamed chunks to time (chunk = 16 batches)")
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--pack", default="/tmp/links_beyond_hbm.lnks")
    parser.add_argument("--keep", action="store_true")
    args = parser.parse_args()

    n_rows = int(args.gb * 1e9 / (COLS * 4))
    if not os.path.exists(args.pack) or os.path.getsize(args.pack) != (
            24 + n_rows * COLS * 4):
        t0 = time.perf_counter()
        build_pack(args.pack, n_rows)
        print(json.dumps({"built_pack_gb": round(args.gb, 1),
                          "rows": n_rows,
                          "build_s": round(time.perf_counter() - t0, 1)}))

    import jax

    from links_tpu import flows, models, train
    from links_tpu.config import LifterTrainConfig
    from links_tpu.data import native_loader
    from links_tpu.objectives import LifterFrozen
    from links_tpu.train import parallel

    assert native_loader.native_available(), "build the C++ loader first"
    import jax.numpy as jnp

    cfg = LifterTrainConfig(batch_size=args.batch)
    keys = jax.random.split(jax.random.PRNGKey(0), 5)
    stacked = jax.tree.map(
        lambda a, b: jnp.stack([a, b]),
        models.init_lifter(keys[0], models.SIDE_JOINTS),
        models.init_lifter(keys[1], models.SIDE_JOINTS),
    )
    frozen = LifterFrozen(
        full_flow=flows.init_flow(keys[2], 34),
        part_a=flows.init_flow(keys[3], 22),
        part_b=flows.init_flow(keys[4], 22),
    )
    optimizer = train.make_optimizer(cfg.optim, steps_per_epoch=1000)
    step = train.build_left_right_step(frozen, optimizer, cfg)
    state = train.init_state(stacked, optimizer)
    mesh = parallel.make_mesh()
    state = parallel.replicate(state, mesh)

    packed = native_loader.PackedDataset(args.pack)
    assert packed.n_rows == n_rows

    # the same chunked program the streaming feed dispatches
    chunk_steps = 16
    chunk_fn = parallel.dp_epoch_fn(step, cfg.batch_size, mesh)
    rows_per_chunk = chunk_steps * cfg.batch_size

    from concurrent.futures import ThreadPoolExecutor

    def run_stream(n_chunks: int, t_state):
        packed.shuffle(7)
        key = jax.random.PRNGKey(1)
        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(packed.gather, 0, rows_per_chunk)
            t0 = time.perf_counter()
            for i in range(n_chunks):
                host = fut.result()
                if i + 1 < n_chunks:
                    fut = pool.submit(packed.gather,
                                      (i + 1) * rows_per_chunk, rows_per_chunk)
                chunk = parallel.shard_batch(host, mesh)
                key, sub = jax.random.split(key)
                t_state, losses = chunk_fn(t_state, chunk, sub)
            jax.block_until_ready(losses["loss"])
            return (time.perf_counter() - t0), t_state

    # warm compile + page cache for the timed window, then measure
    _, state = run_stream(4, state)
    dt, state = run_stream(args.chunks, state)
    stream_pps = args.chunks * rows_per_chunk / dt

    # device-resident reference: same chunked program over an in-HBM array
    data = jnp.asarray(packed.gather(0, args.chunks * rows_per_chunk))
    data = parallel.shard_batch(np.asarray(data), mesh)

    def run_resident(t_state):
        key = jax.random.PRNGKey(2)
        t0 = time.perf_counter()
        for i in range(args.chunks):
            sl = jax.lax.dynamic_slice_in_dim(
                data, i * rows_per_chunk, rows_per_chunk)
            key, sub = jax.random.split(key)
            t_state, losses = chunk_fn(t_state, sl, sub)
        jax.block_until_ready(losses["loss"])
        return time.perf_counter() - t0, t_state

    _, state = run_resident(state)
    dt_res, state = run_resident(state)
    res_pps = args.chunks * rows_per_chunk / dt_res

    print(json.dumps({
        "pack_gb": round(os.path.getsize(args.pack) / 1e9, 1),
        "hbm_gb": 16,
        "rows": n_rows,
        "chunks_timed": args.chunks,
        "batch": args.batch,
        "stream_poses_per_sec": round(stream_pps, 1),
        "device_resident_poses_per_sec": round(res_pps, 1),
        "stream_fraction": round(stream_pps / res_pps, 3),
    }))
    if not args.keep:
        os.unlink(args.pack)


if __name__ == "__main__":
    main()
