"""Concurrent-load benchmark for links-serve's cross-request batching.

Starts the serving daemon in-process (same make_server the CLI uses),
fires N concurrent HTTP clients each posting M requests of R poses, and
reports aggregate throughput + latency percentiles — once with the
coalescing dispatcher (default) and once with the round-2 lock-serialized
path (--no-coalesce). The delta is the measured value of merging queued
requests into shared padded chunks (PERF.md "Serving under concurrency").

v2 (round 4): --quant int8/int8-static and --fused select the production
serving program (same build path as links-serve); latency now reports p99;
--fault N injects N hostile clients (short-read truncated bodies + slow
byte-dribbled bodies) during the measured run to verify the Coalescer and
handler threads isolate them from healthy traffic.

Usage (real chip):
    python benchmarks/serve_load.py --clients 8 --requests 20 --rows 50
    python benchmarks/serve_load.py --model-dir runs/r4/models_gt \
        --data runs/r4/corpus.pkl --quant int8-static --fault 2
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _request_body(rows: int) -> bytes:
    poses = (np.random.default_rng(0).normal(size=(rows, 34)) * 0.1).astype(
        np.float32)
    return json.dumps({"poses_2d": poses.tolist()}).encode()


def _fault_client(host: str, port: int, body: bytes, stop: threading.Event,
                  counts: dict):
    """One hostile client loop: alternate a short-read request (declared
    Content-Length, half the body sent, then hard close — the handler's
    rfile.read() comes up short and must 400, never crash the server or
    poison the dispatcher) and a slow-loris request (valid body dribbled
    256 B at a time — occupies one handler thread; its eventual submit
    co-batches with healthy traffic through the Coalescer)."""
    hdr = (f"POST /lift HTTP/1.1\r\nHost: {host}\r\n"
           f"Content-Type: application/json\r\n"
           f"Content-Length: {len(body)}\r\nConnection: close\r\n\r\n"
           ).encode()
    while not stop.is_set():
        try:  # short read
            s = socket.create_connection((host, port), timeout=10)
            s.sendall(hdr + body[: len(body) // 2])
            s.close()
            counts["short_read"] += 1
        except Exception:
            counts["conn_err"] += 1
        try:  # slow dribble
            s = socket.create_connection((host, port), timeout=10)
            s.sendall(hdr)
            for i in range(0, len(body), 256):
                if stop.is_set():
                    break
                s.sendall(body[i:i + 256])
                time.sleep(0.005)
            else:
                resp = s.recv(64)
                counts["slow_ok" if b"200" in resp else "slow_bad"] += 1
            s.close()
        except Exception:
            counts["conn_err"] += 1


def _bench(base: str, clients: int, requests: int, rows: int,
           fault: int = 0):
    body = _request_body(rows)
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
    stop = threading.Event()
    fcounts = {"short_read": 0, "slow_ok": 0, "slow_bad": 0, "conn_err": 0}
    host, port = base.split("//")[1].rsplit(":", 1)
    fthreads = [threading.Thread(target=_fault_client, daemon=True,
                                 args=(host, int(port), body, stop, fcounts))
                for _ in range(fault)]
    t0 = time.perf_counter()
    for t in fthreads + threads:
        t.start()
    for t in threads:
        t.join()
    stop.set()
    for t in fthreads:
        t.join(timeout=10)
    wall = time.perf_counter() - t0
    alllat = np.array(sorted(sum(lat, [])))
    n = alllat.size

    def _pct(q):
        return (round(float(alllat[min(n - 1, int(n * q))]) * 1e3, 2)
                if n else None)

    out = {
        "clients": clients, "requests_per_client": requests, "rows": rows,
        "completed": n, "errors": sum(errs), "wall_s": round(wall, 3),
        "req_per_s": round(n / wall, 1),
        "poses_per_s": round(n * rows / wall, 1),
        "p50_ms": _pct(0.50), "p95_ms": _pct(0.95), "p99_ms": _pct(0.99),
    }
    if fault:
        out["fault_clients"] = fault
        out["fault_counts"] = dict(fcounts)
    return out


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
    parser.add_argument("--quant", choices=["int8", "int8-static"],
                        default=None,
                        help="serve the quantized program (int8-static "
                             "calibrates on the train split of --data when "
                             "--model-dir is given, else on synthetic rows)")
    parser.add_argument("--fused", action="store_true",
                        help="serve the fused Pallas left_right kernel")
    parser.add_argument("--fault", type=int, default=0,
                        help="N hostile clients (short-read + slow-loris) "
                             "injected during the measured run")
    parser.add_argument("--use-best", action="store_true", default=False)
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
        sargs = p2.parse_args(
            ["--model-dir", args.model_dir]
            + (["--data", args.data] if args.data else [])
            + (["--quant", args.quant] if args.quant else [])
            + (["--fused"] if args.fused else [])
            + (["--use-best"] if args.use_best else []))
        fn, batch = build_serving_fn(sargs, args.batch)
    else:
        if args.fused:
            raise SystemExit("--fused needs --model-dir (production config)")
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        stacked = jax.tree.map(
            lambda a, b: jnp.stack([a, b]),
            models.init_lifter(k1, models.SIDE_JOINTS),
            models.init_lifter(k2, models.SIDE_JOINTS),
        )
        if args.quant == "int8-static":
            # latency is weight/scale-value independent: calibrate on
            # synthetic rows with the request distribution
            from links_tpu.core.skeleton import split_data_left_right
            from links_tpu.models import lifter_apply
            from links_tpu.ops.quant import quantize_stacked_static

            calib = (np.random.default_rng(1).normal(size=(1024, 34))
                     * 0.1).astype(np.float32)

            def _run(p, i):
                lifter_apply(p, np.asarray(split_data_left_right(calib)[i]))

            stacked, _, _ = quantize_stacked_static(stacked, _run)
        elif args.quant == "int8":
            from links_tpu.ops.quant import quantize_params

            stacked = quantize_params(stacked)
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
            srv_args.quant, srv_args.fused = args.quant, args.fused
            srv_args.model_dir = args.model_dir or "models"
            srv = serve_mod.make_server(srv_args)
        finally:
            serve_mod.build_serving_fn = orig
        thread = threading.Thread(target=srv.serve_forever, daemon=True)
        thread.start()
        host, port = srv.server_address[:2]
        base = f"http://{host}:{port}"
        _bench(base, 2, 3, args.rows)  # warm the executable + threads
        results[mode] = _bench(base, args.clients, args.requests, args.rows,
                               fault=args.fault)
        if getattr(srv, "links_coalescer", None) is not None:
            results[mode]["device_batches"] = srv.links_coalescer.stats[
                "device_batches"]
            results[mode]["merged_requests"] = srv.links_coalescer.stats[
                "merged_requests"]
        if args.fault:
            # liveness after hostile traffic + healthy clients unharmed
            with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
                results[mode]["healthz_after_fault"] = (r.status == 200)
            assert results[mode]["errors"] == 0, (
                "healthy clients saw errors under fault injection: "
                f"{results[mode]['errors']}")
        srv.shutdown()
        srv.server_close()
        thread.join(timeout=5)
    results["config"] = {"quant": args.quant, "fused": args.fused,
                         "fault": args.fault, "batch": batch,
                         "model_dir": args.model_dir}
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
