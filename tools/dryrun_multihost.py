"""Two-process `jax.distributed` dryrun — the multi-host (DCN) claim,
executed.

SURVEY.md §2.11 commits to "multi-host DCN handled transparently by
``jax.distributed.initialize``"; rounds 1-2 only ever ran single-process
meshes. This tool spawns TWO local processes, each with 4 forced CPU host
devices, initializes the distributed runtime (coordinator on 127.0.0.1),
builds the GLOBAL 8-device ('data',) mesh, and runs one full stage-3a DP
training step (frozen flows + both lifters + five losses + Adam) with the
batch sharded across both processes — the exact GSPMD program
``__graft_entry__.dryrun_multichip`` proves single-process, now spanning a
process boundary so the gradient all-reduce rides the cross-process
collective transport instead of intra-process XLA.

It then runs the SAME computation single-process on an 8-device mesh and
asserts the loss and updated-parameter norm match (tolerance covers
cross-process reduction-order float drift). Usage:

    python tools/dryrun_multihost.py            # parent: spawns + compares
    python tools/dryrun_multihost.py --out f.json

Exit 0 + a MULTIHOST json artifact = the multi-host path compiles, runs,
and is numerically equivalent to the single-process mesh.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# scripts outside the repo root must make links_tpu importable themselves
# (never via PYTHONPATH, which breaks the axon PJRT plugin registration)
if REPO not in sys.path:
    sys.path.insert(0, REPO)
DEVICES_PER_PROC = 4
N_PROC = 2
HIDDEN = 64  # tiny shapes: this validates transport + layout, not capacity


def _compute(mesh, make_global):
    """One deterministic stage-3a DP step on ``mesh``; every process calls
    this with identical seeds so the global arrays agree. ``make_global(x,
    spec)`` places a host value into the (possibly multi-process) mesh.
    Returns (loss, l2 norm of the updated params)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from links_tpu import flows, models, train
    from links_tpu.config import LifterTrainConfig
    from links_tpu.objectives import LifterFrozen
    from links_tpu.train import parallel

    cfg = LifterTrainConfig(batch_size=16, bf16=False)
    keys = jax.random.split(jax.random.PRNGKey(0), 7)
    stacked = jax.tree.map(
        lambda a, b: jnp.stack([a, b]),
        models.init_lifter(keys[0], models.SIDE_JOINTS, hidden=HIDDEN),
        models.init_lifter(keys[1], models.SIDE_JOINTS, hidden=HIDDEN),
    )
    frozen = LifterFrozen(
        full_flow=flows.init_flow(keys[2], 34, hidden=HIDDEN),
        part_a=flows.init_flow(keys[3], 22, hidden=HIDDEN),
        part_b=flows.init_flow(keys[4], 22, hidden=HIDDEN),
    )
    optimizer = train.make_optimizer(cfg.optim, steps_per_epoch=1)
    step = train.build_left_right_step(frozen, optimizer, cfg)
    state = train.init_state(stacked, optimizer)

    batch = jax.random.normal(keys[5], (cfg.batch_size, 34), jnp.float32) * 0.1
    batch = batch.reshape(-1, 2, 17).at[:, :, 0].set(0.0).reshape(-1, 34)

    state = jax.tree.map(lambda a: make_global(a, P()), state)
    batch = make_global(batch, P("data"))
    dp_step = parallel.dp_jit_step(step, mesh)
    new_state, aux = dp_step(state, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(aux["loss"])
    pnorm = jax.jit(
        lambda t: jnp.sqrt(sum(jnp.sum(l.astype(jnp.float64) ** 2)
                               for l in jax.tree.leaves(t))),
        out_shardings=parallel.replicated(mesh),
    )(new_state.params)
    return float(aux["loss"]), float(pnorm)


def _single_process():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import Mesh, NamedSharding

    mesh = Mesh(np.array(jax.devices()[: N_PROC * DEVICES_PER_PROC]), ("data",))

    def make_global(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    loss, pnorm = _compute(mesh, make_global)
    print(json.dumps({"loss": loss, "pnorm": pnorm}), flush=True)


def _child(proc_id: int, port: int):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=N_PROC,
        process_id=proc_id,
    )
    import numpy as np
    from jax.sharding import Mesh, NamedSharding

    assert jax.process_count() == N_PROC, jax.process_count()
    assert len(jax.devices()) == N_PROC * DEVICES_PER_PROC, jax.devices()
    mesh = Mesh(np.array(jax.devices()), ("data",))

    def make_global(x, spec):
        xn = np.asarray(x)
        s = NamedSharding(mesh, spec)
        # every process holds the full host value (same seeds); each
        # contributes only its addressable shards
        return jax.make_array_from_callback(xn.shape, s, lambda idx: xn[idx])

    loss, pnorm = _compute(mesh, make_global)
    print(json.dumps({"proc": proc_id, "loss": loss, "pnorm": pnorm}),
          flush=True)
    jax.distributed.shutdown()


def _spawn(args, extra_env=None):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # _child/_single pin via jax.config
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEVICES_PER_PROC}")
    # one shared on-disk compile cache would race between the two
    # concurrent children; let each run compile in-memory only
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    if extra_env:
        env.update(extra_env)
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)] + args,
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--child", type=int, default=None)
    parser.add_argument("--single", action="store_true")
    parser.add_argument("--port", type=int, default=29512)
    parser.add_argument("--out", default=None,
                        help="write the comparison artifact JSON here")
    parser.add_argument("--timeout", type=int, default=600)
    args = parser.parse_args()

    if args.child is not None:
        return _child(args.child, args.port)
    if args.single:
        return _single_process()

    # parent: 2-process distributed run ...
    procs = [_spawn(["--child", str(i), "--port", str(args.port)])
             for i in range(N_PROC)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=args.timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise SystemExit("multi-host dryrun timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        if rc != 0:
            sys.stderr.write(err[-4000:])
            raise SystemExit(f"child failed rc={rc}")
    dist = [json.loads(out.strip().splitlines()[-1]) for _, out, _ in outs]
    assert abs(dist[0]["loss"] - dist[1]["loss"]) < 1e-6, dist

    # ... vs the single-process 8-device reference
    ref_p = _spawn(["--single"],
                   extra_env={"XLA_FLAGS":
                              "--xla_force_host_platform_device_count="
                              f"{N_PROC * DEVICES_PER_PROC}"})
    out, err = ref_p.communicate(timeout=args.timeout)
    if ref_p.returncode != 0:
        sys.stderr.write(err[-4000:])
        raise SystemExit("single-process reference failed")
    ref = json.loads(out.strip().splitlines()[-1])

    dl = abs(dist[0]["loss"] - ref["loss"])
    dp = abs(dist[0]["pnorm"] - ref["pnorm"])
    ok = dl < 1e-4 * max(1.0, abs(ref["loss"])) and dp < 1e-5 * ref["pnorm"]
    result = {
        "n_processes": N_PROC,
        "devices_per_process": DEVICES_PER_PROC,
        "distributed_loss": dist[0]["loss"],
        "single_process_loss": ref["loss"],
        "loss_abs_diff": dl,
        "distributed_pnorm": dist[0]["pnorm"],
        "single_process_pnorm": ref["pnorm"],
        "pnorm_abs_diff": dp,
        "ok": ok,
    }
    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
    if not ok:
        raise SystemExit("multi-host result diverges from single-process")


if __name__ == "__main__":
    main()
