"""``links-serve`` — a stdlib-only HTTP serving daemon for 2D→3D lifting.

The reference has no serving story (prediction is matplotlib-bound,
h36m_prediction_visualiser.py:244-320). ``links-lift`` is the batch CLI;
this daemon is its long-running counterpart: load the model ONCE — either
a ``links-export`` StableHLO artifact (``--artifact``, the deployment
path: no checkpoints or model code needed) or checkpoints via the exact
``links-lift`` flags — then answer requests over HTTP.

Endpoints:

* ``POST /lift`` — body either JSON ``{"poses_2d": [[34 floats], ...]}``
  or a raw ``.npy`` (Content-Type ``application/octet-stream``) of
  normalized (N, 34) or (N, 2, 17) poses. Response JSON:
  ``{"poses_3d": [[[3×17]]...], "count": N, "ms": t}``.
* ``GET /healthz`` — liveness + model metadata + request/pose counters.

Serving discipline (the XLA requirement): requests are padded to one
fixed chunk shape so every call hits the single compiled executable —
the same discipline as links-lift's batch path. Device execution runs on
ONE dispatcher thread (one chip, one queue); HTTP threads hand their
payload to a coalescing queue and wait. Requests that arrive while the
device is busy are merged into the next padded chunk — N concurrent
50-pose requests cost one chunk execution instead of N (the
cross-request batching VERDICT r2 next #6 asked for; benchmark:
benchmarks/serve_load.py, PERF.md "Serving under concurrency").
``--no-coalesce`` restores the lock-serialized per-request path. The
first request after start is the compile; ``--warmup`` (default on) pays
it at startup instead.
"""

from __future__ import annotations

import argparse
import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from links_tpu.cli import _common as C
from links_tpu.cli.lift import _chunked, add_serving_flags, build_serving_fn

MAX_BODY = 256 * 1024 * 1024  # 256 MB ≈ 2M poses — refuse anything larger


class Coalescer:
    """Cross-request batching for the single-chip serving daemon.

    HTTP threads ``submit()`` their (N, 34) payload and block; one
    dispatcher thread owns the device. Whenever it finishes a run it
    drains everything that queued meanwhile — plus, optionally, requests
    arriving within ``max_wait_ms`` while the merged rows still fit the
    chunk — concatenates the payloads, runs ONE padded chunked execution,
    and scatters the result slices back. Solo requests therefore pay zero
    added latency (the drain is non-blocking by default); concurrent small
    requests share chunk executions instead of serializing N of them.

    ``max_merge_chunks`` bounds a merged run (memory + head-of-line
    fairness): at most that many chunk-multiples of rows merge into one
    execution; the rest stay queued for the next.

    Failure isolation: when a MERGED run raises, each co-batched request
    is retried individually so one poisoned payload cannot 500 unrelated
    concurrent requests; only the request(s) that fail solo receive the
    error (tests/test_serve.py::test_coalescer_failure_isolation).
    """

    _CLOSE = object()

    def __init__(self, fn, batch: int, max_wait_ms: float = 0.0,
                 max_merge_chunks: int = 4):
        self.fn = fn
        self.batch = batch
        self.max_wait = max_wait_ms / 1e3
        self.max_rows = max_merge_chunks * batch
        self.stats = {"device_batches": 0, "merged_requests": 0}
        self._q: queue.Queue = queue.Queue()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="links-serve-dispatch")
        self._thread.start()

    def submit(self, poses: np.ndarray) -> np.ndarray:
        ev = threading.Event()
        slot: dict = {}
        self._q.put((poses, ev, slot))
        ev.wait()
        if "err" in slot:
            raise slot["err"]
        return slot["out"]

    def close(self):
        self._q.put(self._CLOSE)
        self._thread.join(timeout=5)

    def _drain(self, pending, rows):
        """Merge queued requests into ``pending`` up to max_rows; with a
        wait window, also requests arriving before the deadline while the
        next chunk boundary is unfilled."""
        deadline = time.monotonic() + self.max_wait
        while rows < self.max_rows:
            try:
                wait = deadline - time.monotonic()
                if wait > 0 and rows < self.batch:
                    nxt = self._q.get(timeout=wait)  # fill the first chunk
                else:
                    nxt = self._q.get_nowait()
            except queue.Empty:
                break
            if nxt is self._CLOSE:
                self._q.put(self._CLOSE)  # re-post: stop after this run
                break
            pending.append(nxt)
            rows += nxt[0].shape[0]
        return pending

    def _loop(self):
        while True:
            item = self._q.get()
            if item is self._CLOSE:
                return
            pending = self._drain([item], item[0].shape[0])
            arr = (pending[0][0] if len(pending) == 1 else
                   np.concatenate([p[0] for p in pending]))
            try:
                out = _chunked(self.fn, arr, self.batch)
            except Exception as e:
                # A merged run failed. Don't 500 every co-batched waiter
                # for one poisoned request (ADVICE r3): retry each request
                # individually so only the one(s) that actually fail see
                # the error. Solo runs deliver their failure directly.
                if len(pending) == 1:
                    _, ev, slot = pending[0]
                    slot["err"] = e
                    ev.set()
                    continue
                for poses, ev, slot in pending:
                    try:
                        slot["out"] = _chunked(self.fn, poses, self.batch)
                        self.stats["device_batches"] += 1
                        self.stats["merged_requests"] += 1
                    except Exception as e_i:
                        slot["err"] = e_i
                    ev.set()
                continue
            self.stats["device_batches"] += 1
            self.stats["merged_requests"] += len(pending)
            ofs = 0
            for poses, ev, slot in pending:
                n = poses.shape[0]
                slot["out"] = out[ofs:ofs + n]
                ofs += n
                ev.set()


def _parse_poses(body: bytes, content_type: str) -> np.ndarray:
    if content_type.startswith("application/octet-stream"):
        arr = np.load(io.BytesIO(body), allow_pickle=False)
    else:
        payload = json.loads(body.decode("utf-8"))
        if not isinstance(payload, dict) or "poses_2d" not in payload:
            raise ValueError('JSON body must be {"poses_2d": [[...], ...]}')
        arr = np.asarray(payload["poses_2d"], np.float32)
    arr = np.asarray(arr, np.float32)
    if arr.ndim == 1 and arr.size == 34:
        arr = arr[None]
    if arr.ndim == 3 and arr.shape[1:] == (2, 17):
        arr = arr.reshape(-1, 34)
    if arr.ndim != 2 or arr.shape[1] != 34 or arr.shape[0] == 0:
        raise ValueError(
            f"poses_2d must be non-empty (N, 34) or (N, 2, 17) normalized "
            f"2D poses, got {arr.shape}")
    return arr


def make_server(args) -> ThreadingHTTPServer:
    """Build the HTTP server with the model loaded and (optionally)
    warmed. Separated from main() so tests can bind port 0 and drive it
    in-process."""
    batch = args.batch_size or 256
    if args.artifact:
        import sys

        from links_tpu import ckpt

        ignored = [f for f, on in (
            ("--scenario", args.scenario), ("--quant", args.quant),
            ("--fused", args.fused),
            ("--mode", args.mode != "left_right"),
            ("--policy", getattr(args, "policy", "f32") != "f32"),
        ) if on]
        if ignored:
            print(f"[links-serve] {' '.join(ignored)} ignored: the model "
                  "is baked into the artifact at export time",
                  file=sys.stderr)
        exp = ckpt.deserialize_exported(args.artifact)
        fn = exp.call
        dim0 = exp.in_avals[0].shape[0]
        if isinstance(dim0, int):
            batch = dim0  # fixed-batch artifact: chunk at its pinned shape
        model_desc = {"artifact": args.artifact,
                      "platforms": list(exp.platforms),
                      "inputs": [str(a) for a in exp.in_avals]}
    else:
        fn, batch = build_serving_fn(args, batch)
        model_desc = {"mode": args.mode, "scenario": args.scenario,
                      "quant": args.quant, "model_dir": args.model_dir}

    lock = threading.Lock()
    stats = {"requests": 0, "poses": 0, "errors": 0, "started": time.time()}

    if args.warmup:
        probe = np.zeros((batch, 34), np.float32)
        _chunked(fn, probe, batch)

    coalescer = None
    if getattr(args, "coalesce", True):
        coalescer = Coalescer(fn, batch,
                              max_wait_ms=getattr(args, "coalesce_wait_ms", 0.0))

    class Handler(BaseHTTPRequestHandler):
        # quiet by default; --verbose restores per-request stderr lines
        def log_message(self, fmt, *log_args):
            if args.verbose:
                BaseHTTPRequestHandler.log_message(self, fmt, *log_args)

        def _reply(self, code: int, obj: dict):
            data = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path not in ("/healthz", "/"):
                return self._reply(404, {"error": f"no route {self.path}"})
            with lock:
                snap = dict(stats)
            if coalescer is not None:
                snap.update(coalescer.stats)
            self._reply(200, {"ok": True, "model": model_desc,
                              "batch": batch,
                              "coalescing": coalescer is not None, **snap})

        def do_POST(self):
            if self.path != "/lift":
                return self._reply(404, {"error": f"no route {self.path}"})
            try:
                length = int(self.headers.get("Content-Length", 0))
                if not 0 < length <= MAX_BODY:
                    raise ValueError(
                        f"Content-Length must be in (0, {MAX_BODY}]")
                poses = _parse_poses(
                    self.rfile.read(length),
                    self.headers.get("Content-Type", "application/json"))
            except Exception as e:  # malformed input → 400, not a crash
                with lock:
                    stats["errors"] += 1
                return self._reply(400, {"error": str(e)})
            t0 = time.perf_counter()
            try:
                if coalescer is not None:
                    pred = coalescer.submit(poses)
                else:
                    with lock:  # one chip: serialize device execution
                        pred = _chunked(fn, poses, batch)
            except Exception as e:  # model/runtime failure → 500 + alive
                with lock:
                    stats["errors"] += 1
                return self._reply(500, {"error": f"{type(e).__name__}: {e}"})
            ms = (time.perf_counter() - t0) * 1e3
            n = poses.shape[0]
            with lock:  # ThreadingHTTPServer: counters need the lock too
                stats["requests"] += 1
                stats["poses"] += n
            self._reply(200, {
                "poses_3d": pred.reshape(n, 3, 17).tolist(),
                "count": n, "ms": round(ms, 3),
            })

    server = ThreadingHTTPServer((args.host, args.port), Handler)
    server.links_model_desc = model_desc  # introspection for main()/tests
    server.links_coalescer = coalescer  # so close paths can stop the thread
    _orig_close = server.server_close

    def _close():
        if coalescer is not None:
            coalescer.close()
        _orig_close()

    server.server_close = _close
    return server


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="HTTP serving daemon for 2D→3D pose lifting")
    parser.add_argument("--artifact", default=None,
                        help="serve a links-export StableHLO artifact "
                             "instead of loading checkpoints")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8321)
    parser.add_argument("--no-warmup", dest="warmup", action="store_false",
                        help="skip the startup compile (first request "
                             "pays it instead)")
    parser.add_argument("--verbose", action="store_true",
                        help="per-request access log on stderr")
    parser.add_argument("--no-coalesce", dest="coalesce",
                        action="store_false",
                        help="disable cross-request batching: serialize "
                             "each request's device execution behind a "
                             "lock (the pre-coalescing behavior; kept for "
                             "benchmarking)")
    parser.add_argument("--coalesce-wait-ms", type=float, default=0.0,
                        help="optional window to wait for more requests "
                             "while the next chunk is unfilled (default 0: "
                             "merge only what queued while the device was "
                             "busy — zero added solo-request latency)")
    add_serving_flags(parser)
    C.add_common_flags(parser)
    C.add_lr_pt_flags(parser)
    C.add_use_best_flag(parser)
    args = parser.parse_args(argv)

    server = make_server(args)
    host, port = server.server_address[:2]
    print(json.dumps({"serving": f"http://{host}:{port}",
                      "model": server.links_model_desc}), flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()


if __name__ == "__main__":
    main()
