"""links-serve HTTP daemon: artifact serving, JSON/npy request parsing,
health endpoint, error handling."""

import io
import json
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from links_tpu import ckpt, models
from links_tpu.objectives import lift_left_right_eval

HID = 32


def _make_artifact(tmp_path):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    stacked = jax.tree.map(
        lambda a, b: jnp.stack([a, b]),
        models.init_lifter(k1, 11, hidden=HID),
        models.init_lifter(k2, 11, hidden=HID),
    )

    def fwd(p2d):
        return lift_left_right_eval(stacked, p2d, 10.0, "right")

    out = tmp_path / "lr.stablehlo"
    ckpt.export_serving(fwd, str(out), platforms=("cpu",))
    return str(out), fwd


@pytest.fixture()
def server(tmp_path):
    import argparse

    from links_tpu.cli import _common as C
    from links_tpu.cli.lift import add_serving_flags
    from links_tpu.cli.serve import make_server as mk

    artifact, fwd = _make_artifact(tmp_path)
    # parse defaults through the real CLI flag set, binding an ephemeral port
    parser = argparse.ArgumentParser()
    parser.add_argument("--artifact", default=None)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=0)
    parser.add_argument("--no-warmup", dest="warmup", action="store_false")
    parser.add_argument("--verbose", action="store_true")
    add_serving_flags(parser)
    C.add_common_flags(parser)
    C.add_lr_pt_flags(parser)
    C.add_use_best_flag(parser)
    args = parser.parse_args(["--artifact", artifact])

    srv = mk(args)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    host, port = srv.server_address[:2]
    try:
        yield f"http://{host}:{port}", fwd
    finally:
        srv.shutdown()
        srv.server_close()
        thread.join(timeout=5)


def _post(url, data: bytes, content_type: str):
    req = urllib.request.Request(url, data=data,
                                 headers={"Content-Type": content_type})
    with urllib.request.urlopen(req, timeout=30) as resp:
        return json.loads(resp.read())


def test_serve_artifact_json_and_npy(server, rng):
    base, fwd = server

    with urllib.request.urlopen(base + "/healthz", timeout=30) as resp:
        health = json.loads(resp.read())
    assert health["ok"] and "artifact" in health["model"]

    poses = rng.normal(size=(5, 34)).astype(np.float32) * 0.1
    poses[:, 0] = 0.0
    want = np.asarray(jax.jit(fwd)(jnp.asarray(poses))).reshape(5, 3, 17)

    # JSON request
    out = _post(base + "/lift",
                json.dumps({"poses_2d": poses.tolist()}).encode(),
                "application/json")
    assert out["count"] == 5 and out["ms"] >= 0
    np.testing.assert_allclose(np.asarray(out["poses_3d"], np.float32),
                               want, rtol=1e-4, atol=1e-5)

    # raw .npy request, (N, 2, 17) layout accepted too
    buf = io.BytesIO()
    np.save(buf, poses.reshape(5, 2, 17))
    out2 = _post(base + "/lift", buf.getvalue(), "application/octet-stream")
    np.testing.assert_allclose(np.asarray(out2["poses_3d"], np.float32),
                               want, rtol=1e-4, atol=1e-5)

    # counters advanced
    with urllib.request.urlopen(base + "/healthz", timeout=30) as resp:
        health = json.loads(resp.read())
    assert health["requests"] == 2 and health["poses"] == 10


def test_serve_fixed_batch_artifact(tmp_path, rng):
    """A fixed-batch artifact sets the server's chunk size from its
    pinned input shape (no --batch-size guessing), and requests of any
    size pad through it."""
    import argparse

    from links_tpu import models as M
    from links_tpu.cli import _common as C
    from links_tpu.cli.lift import add_serving_flags
    from links_tpu.cli.serve import make_server

    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    stacked = jax.tree.map(
        lambda a, b: jnp.stack([a, b]),
        M.init_lifter(k1, 11, hidden=HID),
        M.init_lifter(k2, 11, hidden=HID),
    )

    def fwd(p2d):
        return lift_left_right_eval(stacked, p2d, 10.0, "right")

    art = tmp_path / "fixed.stablehlo"
    ckpt.export_serving(fwd, str(art), batch=8, platforms=("cpu",))

    parser = argparse.ArgumentParser()
    parser.add_argument("--artifact", default=None)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=0)
    parser.add_argument("--no-warmup", dest="warmup", action="store_false")
    parser.add_argument("--verbose", action="store_true")
    add_serving_flags(parser)
    C.add_common_flags(parser)
    C.add_lr_pt_flags(parser)
    C.add_use_best_flag(parser)
    args = parser.parse_args(["--artifact", str(art)])

    srv = make_server(args)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    host, port = srv.server_address[:2]
    base = f"http://{host}:{port}"
    try:
        with urllib.request.urlopen(base + "/healthz", timeout=30) as resp:
            assert json.loads(resp.read())["batch"] == 8
        poses = rng.normal(size=(5, 34)).astype(np.float32) * 0.1
        out = _post(base + "/lift",
                    json.dumps({"poses_2d": poses.tolist()}).encode(),
                    "application/json")
        assert out["count"] == 5
        assert np.isfinite(np.asarray(out["poses_3d"], np.float32)).all()
    finally:
        srv.shutdown()
        srv.server_close()
        thread.join(timeout=5)


def test_coalescer_merges_and_scatters(rng):
    """Coalescer correctness: concurrent submits merge into few device
    batches, each caller gets exactly its own slice back, and an executor
    failure propagates to every waiter without killing the dispatcher."""
    import time as _time

    from links_tpu.cli.serve import Coalescer

    calls = []

    def fn(chunk):
        calls.append(np.asarray(chunk).shape[0])
        _time.sleep(0.02)  # hold the "device" so submitters pile up
        return np.asarray(chunk) * 2.0

    co = Coalescer(fn, batch=16)
    try:
        payloads = [rng.normal(size=(n, 34)).astype(np.float32)
                    for n in (3, 5, 4, 7, 2, 6)]
        outs = [None] * len(payloads)

        def worker(i):
            outs[i] = co.submit(payloads[i])

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(len(payloads))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=10)
        for p, o in zip(payloads, outs):
            np.testing.assert_allclose(o, p * 2.0, rtol=1e-6)
        # 6 requests (27 rows) while the device sleeps 20ms per run must
        # coalesce into fewer executions than the serialized 6
        assert co.stats["merged_requests"] == 6
        assert co.stats["device_batches"] < 6

        # failure delivery: a poisoned fn raises in the submitter, and the
        # dispatcher survives for the next request
        def boom(chunk):
            raise RuntimeError("kaboom")

        co.fn = boom
        with pytest.raises(RuntimeError, match="kaboom"):
            co.submit(payloads[0])
        co.fn = fn
        np.testing.assert_allclose(co.submit(payloads[1]), payloads[1] * 2.0,
                                   rtol=1e-6)
    finally:
        co.close()


def test_coalescer_failure_isolation(rng):
    """A poisoned request merged with clean ones must not 500 the clean
    waiters (ADVICE r3): on a merged-run failure each request is retried
    individually — only the poisoned one raises, the rest get results."""
    import time as _time

    from links_tpu.cli.serve import Coalescer

    def fn(chunk):
        arr = np.asarray(chunk)
        if np.isnan(arr).any():
            raise RuntimeError("poisoned rows")
        _time.sleep(0.02)  # hold the device so submitters pile up
        return arr * 2.0

    co = Coalescer(fn, batch=64)
    try:
        clean = [rng.normal(size=(n, 34)).astype(np.float32)
                 for n in (3, 5, 4)]
        poison = np.full((2, 34), np.nan, dtype=np.float32)
        # a long clean request occupies the dispatcher so the rest merge
        blocker = rng.normal(size=(8, 34)).astype(np.float32)
        payloads = [blocker] + clean[:1] + [poison] + clean[1:]
        outs: list = [None] * len(payloads)

        def worker(i):
            try:
                outs[i] = co.submit(payloads[i])
            except Exception as e:
                outs[i] = e

        threads = []
        for i in range(len(payloads)):
            t = threading.Thread(target=worker, args=(i,))
            t.start()
            threads.append(t)
            if i == 0:
                _time.sleep(0.005)  # let the blocker start its run
        for t in threads:
            t.join(timeout=10)

        for i, (p, o) in enumerate(zip(payloads, outs)):
            if i == 2:  # the poisoned request
                assert isinstance(o, RuntimeError), o
            else:
                assert not isinstance(o, Exception), (i, o)
                np.testing.assert_allclose(o, p * 2.0, rtol=1e-6)
    finally:
        co.close()


def test_serve_concurrent_coalesced(server, rng):
    """End-to-end: concurrent HTTP clients get correct per-request results
    through the coalescing queue, and /healthz reports the merge stats."""
    base, fwd = server
    poses = [rng.normal(size=(n, 34)).astype(np.float32) * 0.1
             for n in (2, 3, 4, 5)]
    outs = [None] * len(poses)

    def client(i):
        outs[i] = _post(base + "/lift",
                        json.dumps({"poses_2d": poses[i].tolist()}).encode(),
                        "application/json")

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(len(poses))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    for p, o in zip(poses, outs):
        want = np.asarray(jax.jit(fwd)(jnp.asarray(p))).reshape(-1, 3, 17)
        np.testing.assert_allclose(np.asarray(o["poses_3d"], np.float32),
                                   want, rtol=1e-4, atol=1e-5)
    with urllib.request.urlopen(base + "/healthz", timeout=30) as resp:
        health = json.loads(resp.read())
    assert health["coalescing"] is True
    assert health["merged_requests"] >= 4
    assert health["device_batches"] >= 1


def test_serve_rejects_bad_input(server):
    base, _ = server
    # wrong shape → 400 with a message, server stays alive
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(base + "/lift",
              json.dumps({"poses_2d": [[1.0, 2.0]]}).encode(),
              "application/json")
    assert exc.value.code == 400
    assert "poses_2d" in json.loads(exc.value.read())["error"]

    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(base + "/nope", b"{}", "application/json")
    assert exc.value.code == 404

    with urllib.request.urlopen(base + "/healthz", timeout=30) as resp:
        assert json.loads(resp.read())["errors"] == 1
