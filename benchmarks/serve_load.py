"""Concurrent-load benchmark for links-serve's cross-request batching.

Starts the serving daemon in-process (same make_server the CLI uses),
fires N concurrent HTTP clients each posting M requests of R poses, and
reports aggregate throughput + latency percentiles — once with the
coalescing dispatcher (default) and once with the round-2 lock-serialized
path (--no-coalesce). The delta is the measured value of merging queued
requests into shared padded chunks (PERF.md "Serving under concurrency").

Usage (real chip):
    python benchmarks/serve_load.py --clients 8 --requests 20 --rows 50
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _bench(base: str, clients: int, requests: int, rows: int):
    poses = (np.random.default_rng(0).normal(size=(rows, 34)) * 0.1).astype(
        np.float32)
    body = json.dumps({"poses_2d": poses.tolist()}).encode()
    lat = [[] for _ in range(clients)]
    errs = [0] * clients

    def client(i):
        for _ in range(requests):
            t0 = time.perf_counter()
            req = urllib.request.Request(
                base + "/lift", data=body,
                headers={"Content-Type": "application/json"})
            try:
                with urllib.request.urlopen(req, timeout=120) as resp:
                    resp.read()
            except Exception:
                errs[i] += 1
                continue
            lat[i].append(time.perf_counter() - t0)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    alllat = np.array(sorted(sum(lat, [])))
    n = alllat.size
    return {
        "clients": clients, "requests_per_client": requests, "rows": rows,
        "completed": n, "errors": sum(errs), "wall_s": round(wall, 3),
        "req_per_s": round(n / wall, 1),
        "poses_per_s": round(n * rows / wall, 1),
        "p50_ms": round(float(alllat[n // 2]) * 1e3, 2) if n else None,
        "p95_ms": round(float(alllat[int(n * 0.95)]) * 1e3, 2) if n else None,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--clients", type=int, default=8)
    parser.add_argument("--requests", type=int, default=20)
    parser.add_argument("--rows", type=int, default=50)
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--model-dir", default=None,
                        help="serve real checkpoints from here; default: a "
                             "randomly initialized lifter pair (throughput "
                             "is weight-value independent)")
    parser.add_argument("--data", default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from links_tpu import models
    from links_tpu.objectives import lift_left_right_eval

    if args.model_dir:
        import argparse as ap

        from links_tpu.cli import _common as C
        from links_tpu.cli.lift import add_serving_flags, build_serving_fn

        p2 = ap.ArgumentParser()
        add_serving_flags(p2)
        C.add_common_flags(p2)
        C.add_lr_pt_flags(p2)
        C.add_use_best_flag(p2)
        sargs = p2.parse_args(["--model-dir", args.model_dir]
                              + (["--data", args.data] if args.data else []))
        fn, batch = build_serving_fn(sargs, args.batch)
    else:
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        stacked = jax.tree.map(
            lambda a, b: jnp.stack([a, b]),
            models.init_lifter(k1, models.SIDE_JOINTS),
            models.init_lifter(k2, models.SIDE_JOINTS),
        )
        _lift = jax.jit(lift_left_right_eval, static_argnums=(2, 3))
        fn = lambda p2d: _lift(stacked, p2d, 10.0, "right")
        batch = args.batch

    # in-process server on an ephemeral port, toggling the dispatcher
    import types

    from links_tpu.cli import serve as serve_mod

    results = {}
    for mode in ("coalesce", "lock"):
        srv_args = types.SimpleNamespace(
            artifact=None, host="127.0.0.1", port=0, warmup=True,
            verbose=False, coalesce=(mode == "coalesce"),
            coalesce_wait_ms=0.0, batch_size=batch)
        # bypass build_serving_fn: hand make_server a prebuilt fn via a
        # tiny shim (the HTTP/dispatch path under test is identical)
        orig = serve_mod.build_serving_fn
        serve_mod.build_serving_fn = lambda a, b: (fn, batch)
        try:
            srv_args.mode, srv_args.scenario = "left_right", None
            srv_args.quant, srv_args.fused = None, False
            srv_args.model_dir = args.model_dir or "models"
            srv = serve_mod.make_server(srv_args)
        finally:
            serve_mod.build_serving_fn = orig
        thread = threading.Thread(target=srv.serve_forever, daemon=True)
        thread.start()
        host, port = srv.server_address[:2]
        base = f"http://{host}:{port}"
        _bench(base, 2, 3, args.rows)  # warm the executable + threads
        results[mode] = _bench(base, args.clients, args.requests, args.rows)
        if getattr(srv, "links_coalescer", None) is not None:
            results[mode]["device_batches"] = srv.links_coalescer.stats[
                "device_batches"]
            results[mode]["merged_requests"] = srv.links_coalescer.stats[
                "merged_requests"]
        srv.shutdown()
        srv.server_close()
        thread.join(timeout=5)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
