"""End-to-end pipeline smoke test: all five stages through their real CLI
entry points on a synthetic reference-schema pickle (SURVEY.md §4)."""

import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; run with `pytest -m ""`


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("pipeline")
    return ws


def _args(ws, extra=()):
    return [
        "--data", str(ws / "synth.pkl"),
        "--model-dir", str(ws / "models"),
        "--synthetic", "--synthetic-n", "64",
        "--epochs", "1", "--batch-size", "32",
        "--f32",
        *extra,
    ]


def test_stage1_full_flow(workspace):
    from links_tpu.cli.train_full_pose_norm_flow import main

    state = main(_args(workspace))
    assert (workspace / "models" / "full_flow").exists()
    assert int(state.step) > 0


def test_stage2_part_flows(workspace):
    from links_tpu.cli.train_part_norm_flows import main

    main(_args(workspace))
    for name in ("flow_left", "flow_right", "flow_legs", "flow_torso"):
        assert (workspace / "models" / name).exists()


def test_stage3a_left_right_lifter(workspace):
    from links_tpu.cli.train_left_right_lifter import main

    state = main(_args(workspace, ["--save-pt"]))
    assert (workspace / "models" / "lifter_left_right").exists()
    assert (workspace / "models" / "left_side_lifter_final.pt").exists()
    assert int(state.step) > 0


def test_stage3b_leg_torso_lifter(workspace):
    from links_tpu.cli.train_leg_torso_lifter import main

    main(_args(workspace))
    assert (workspace / "models" / "lifter_legs").exists()
    assert (workspace / "models" / "lifter_torso").exists()


def test_stage4_occlusion_models(workspace):
    from links_tpu.cli.train_occlusion_models import main

    main(_args(workspace))
    assert (workspace / "models" / "occlusion_models").exists()


def test_stage5_eval(workspace, capsys):
    from links_tpu.cli.eval_h36m import main

    results = main(_args(workspace, ["--json", "--occlusion"]))
    out = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(out)
    assert np.isfinite(parsed["pa_mpjpe"])
    assert np.isfinite(parsed["n_mpjpe"])
    # all 8 occlusion scenarios evaluated
    for name in ("la", "ra", "ll", "rl", "torso", "legs", "left", "right"):
        assert f"pa_{name}" in parsed
    # leg/torso eval path
    results_lt = main(_args(workspace, ["--mode", "leg_torso", "--json"]))
    assert np.isfinite(results_lt["pa_mpjpe"])


def test_metrics_logged(workspace):
    log = workspace / "models" / "left_right_lifter.jsonl"
    assert log.exists()
    records = [json.loads(l) for l in log.read_text().splitlines()]
    epoch_recs = [r for r in records if "loss" in r]
    assert epoch_recs, "no epoch records logged"
    for k in ("likeli", "rep_rot", "L3d", "re_rot_3d", "bl_prior",
              "pa_left", "pa_right", "mpjpe_scaled_left"):
        assert k in epoch_recs[-1], k
