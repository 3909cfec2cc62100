"""Two-process `jax.distributed` dryrun as a test (VERDICT r2 next #1).

Runs tools/dryrun_multihost.py's parent mode in subprocesses: two local
processes with 4 forced CPU devices each initialize the distributed
runtime, run the stage-3a DP step on the global 8-device mesh, and the
result must match a single-process 8-device run. The subprocesses must
NOT inherit this pytest process's initialized-backend state, hence the
shell-out (the tool already isolates env per child).
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
    assert result["loss_abs_diff"] < 1e-4 * max(
        1.0, abs(result["single_process_loss"]))
    assert (result["pnorm_abs_diff"]
            < 1e-5 * result["single_process_pnorm"])
