"""Two-process `jax.distributed` dryrun as a test (VERDICT r2 next #1,
real-shaped per VERDICT r3 next #4).

Runs tools/dryrun_multihost.py's parent mode in subprocesses: two local
processes with 4 forced CPU devices each initialize the distributed
runtime, feed the batch per-process via
``jax.make_array_from_process_local_data`` (each process materializes
only its own rows), and run the stage-3a step in three layouts — GSPMD
DP, explicit-collective shard_map, and ZeRO-sharded optimizer — on the
global 8-device mesh; every layout must match a single-process 8-device
run. The subprocesses must NOT inherit this pytest process's
initialized-backend state, hence the shell-out (the tool already
isolates env per child).
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_distributed_matches_single(tmp_path):
    out = tmp_path / "multihost.json"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "dryrun_multihost.py"),
         "--out", str(out), "--port", "29613"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=570)
    assert proc.returncode == 0, proc.stderr[-4000:]
    result = json.loads(out.read_text())
    assert result["ok"] is True
    assert result["n_processes"] == 2
    # each process fed only its half of the batch (local-feed path)
    assert result["local_feed"] is True
    assert result["local_rows_per_process"] == [8, 8]
    assert set(result["layouts"]) == {"gspmd", "shard_map", "zero"}
    for name, lay in result["layouts"].items():
        assert lay["ok"] is True, (name, lay)
        assert lay["loss_abs_diff"] < 1e-4 * max(
            1.0, abs(lay["single_process_loss"])), (name, lay)
        assert (lay["pnorm_abs_diff"]
                < 1e-5 * lay["single_process_pnorm"]), (name, lay)
