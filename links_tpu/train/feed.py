"""Streaming host→device feed for larger-than-HBM training sets.

Every stage trainer consumes the same ``epoch_fn(state, carry, key)``
driver (the device-resident scan from train/parallel.py:dp_epoch_fn). This
module provides the drop-in alternative: batches stream from the native
packed loader (data/native_loader.py — mmap + C++ thread-pool gather), so
the training split never materializes in host RAM or HBM. Same step
function, same mesh sharding; only the feed differs.

The feed ships CHUNKS of ``chunk_steps`` shuffled batches and runs the
same scanned multi-step device program over each chunk that the
device-resident path runs over the whole epoch. Two reasons:

* dispatch amortization — one device program per ``chunk_steps`` steps
  instead of per step, and one large host→device transfer instead of many
  small ones (jax's async dispatch overlaps the C++ gather of chunk i+1
  with the device executing chunk i);
* program shape — per-step dispatch of a DP step makes XLA's CPU
  backend rendezvous 8 independent per-device programs per batch, which
  aborts on hosts with fewer cores than mesh devices (the round-1
  MULTICHIP failure mode). The scanned chunk program is the exact shape
  the test suite and dryrun prove green on a 1-core host.

The reference holds the entire split as one torch tensor on the GPU
(h36m_dataset_class.py loads everything up front) — fine at H36M scale,
a hard wall beyond it.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from links_tpu.data import native_loader
from links_tpu.train import parallel


def open_or_pack(path, poses_2d=None) -> native_loader.PackedDataset:
    """Open an LNKS pack, creating it from ``poses_2d`` when absent
    (the explicit conversion tool is ``links-pack``, cli/pack_data.py)."""
    ppath = Path(path)
    if not ppath.exists():
        if poses_2d is None:
            raise FileNotFoundError(
                f"packed dataset {ppath} does not exist and no in-memory "
                "train split is available to pack it from — create it with "
                "links-pack first")
        ppath.parent.mkdir(parents=True, exist_ok=True)
        native_loader.pack_dataset(ppath, np.asarray(poses_2d))
    return native_loader.PackedDataset(ppath)


def shuffle_seed(key) -> int:
    """Derive the loader's int shuffle seed from a jax PRNG key (resumed
    keys are typed 0-d; fresh PRNGKey(seed) keys are raw (2,) uint32)."""
    raw = jax.random.key_data(key) if key.ndim == 0 else key
    return int(np.asarray(raw).ravel()[-1]) & 0x7FFFFFFF


def packed_epoch_fn(packed: native_loader.PackedDataset, batch_size: int,
                    step, mesh, chunk_steps: int = 16):
    """``(epoch_fn, carry)`` streaming shuffled host chunks through the
    scanned GSPMD epoch program. ``carry`` is a zero-row placeholder with
    the pack's row width — the epoch driver signature stays identical to
    the scan path's, so stage CLIs switch feeds without touching their
    loop.

    At most two program shapes compile per run: the full
    ``chunk_steps``-step chunk and the epoch's ragged tail chunk.
    """
    if packed.n_rows < batch_size:
        raise ValueError(
            f"packed dataset has {packed.n_rows} rows < batch {batch_size}")
    chunk_fn = parallel.dp_epoch_fn(step, batch_size, mesh)

    n_batches = packed.n_rows // batch_size
    steps = [chunk_steps] * (n_batches // chunk_steps)
    if n_batches % chunk_steps:
        steps.append(n_batches % chunk_steps)

    def epoch_fn(state, _unused_carry, key):
        from concurrent.futures import ThreadPoolExecutor

        packed.shuffle(shuffle_seed(key))
        total, start = None, 0
        # Double-buffered prefetch: the C++ gather of chunk i+1 runs on a
        # worker thread (ctypes foreign calls drop the GIL) WHILE the main
        # thread device_puts + dispatches chunk i and the device executes
        # it. Round-2 served the gather from the dispatch thread after the
        # async dispatch — which overlaps only as long as dispatch never
        # blocks; the worker thread makes the overlap unconditional
        # (measured: PERF.md "streaming feed" row).
        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(packed.gather, 0, steps[0] * batch_size)
            for i, nb in enumerate(steps):
                host_chunk = fut.result()
                start += nb * batch_size
                if i + 1 < len(steps):
                    fut = pool.submit(packed.gather, start,
                                      steps[i + 1] * batch_size)
                # device_put the numpy chunk straight into its sharded layout
                chunk = parallel.shard_batch(host_chunk, mesh)
                key, sub = jax.random.split(key)
                state, losses = chunk_fn(state, chunk, sub)  # async dispatch
                losses = jax.tree.map(lambda v, n=nb: v * n, losses)
                total = losses if total is None else jax.tree.map(
                    jnp.add, total, losses)
        # epoch mean, matching the device-resident scan's aux mean
        return state, jax.tree.map(lambda v: v / n_batches, total)

    carry = jnp.zeros((0, packed.n_cols), jnp.float32)
    return epoch_fn, carry
