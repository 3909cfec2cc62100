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
    # best-validation checkpoint tracked alongside the final weights
    assert (workspace / "models" / "lifter_left_right_best").exists()
    assert int(state.step) > 0


def test_stage3b_leg_torso_lifter(workspace):
    from links_tpu.cli.train_leg_torso_lifter import main

    main(_args(workspace))
    assert (workspace / "models" / "lifter_legs").exists()
    assert (workspace / "models" / "lifter_torso").exists()
    assert (workspace / "models" / "lifter_legs_best").exists()
    assert (workspace / "models" / "lifter_torso_best").exists()


def test_stage4_occlusion_models(workspace):
    from links_tpu.cli.train_occlusion_models import main

    main(_args(workspace))
    assert (workspace / "models" / "occlusion_models").exists()
    assert (workspace / "models" / "occlusion_models_best").exists()


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

    # the bf16 serving policy threads through the occlusion/dropout
    # evaluations too (review fix: it was silently f32 there)
    results_bf16 = main(_args(workspace, ["--json", "--occlusion",
                                          "--dropout", "--policy", "bf16"]))
    out = capsys.readouterr().out.strip().splitlines()[-1]
    parsed_bf16 = json.loads(out)
    assert np.isfinite(parsed_bf16["pa_mpjpe"])
    assert np.isfinite(parsed_bf16["pa_torso"])
    assert np.isfinite(parsed_bf16["dropout_pa_torso"])
    # leg/torso eval path
    results_lt = main(_args(workspace, ["--mode", "leg_torso", "--json"]))
    assert np.isfinite(results_lt["pa_mpjpe"])
    # simulated keypoint-dropout eval (BASELINE.md dropout config)
    results_dp = main(_args(workspace, ["--dropout", "--json"]))
    for name in ("la", "ra", "ll", "rl", "torso", "legs", "left", "right"):
        assert np.isfinite(results_dp[f"dropout_pa_{name}"]), name
        assert np.isfinite(results_dp[f"dropout_naive_pa_{name}"]), name
    # --use-best routes through the tracked best-validation checkpoints
    # (lifters and, with --dropout, the completers)
    results_best = main(_args(workspace, ["--json", "--use-best", "--dropout"]))
    assert np.isfinite(results_best["pa_mpjpe"])
    assert np.isfinite(results_best["dropout_pa_torso"])
    results_lt_best = main(_args(workspace,
                                 ["--mode", "leg_torso", "--json",
                                  "--use-best"]))
    assert np.isfinite(results_lt_best["pa_mpjpe"])


def test_no_gt_2d_variant(workspace):
    """Detector-keypoint path (--no-gt-2d ⇒ reference get_2dgt=False):
    stage 3a trains and eval runs on the pickle's poses_2d_pred arrays."""
    from links_tpu.cli.eval_h36m import main as eval_main
    from links_tpu.cli.train_left_right_lifter import main as train_main

    state = train_main(_args(workspace, ["--no-gt-2d"]))
    assert int(state.step) > 0
    res = eval_main(_args(workspace, ["--no-gt-2d", "--json"]))
    assert np.isfinite(res["pa_mpjpe"])
    # detector keypoints differ from GT ⇒ so must the metric
    res_gt = eval_main(_args(workspace, ["--json"]))
    assert res["pa_mpjpe"] != res_gt["pa_mpjpe"]

    # occlusion recovery on the corpus's genuinely missing keypoints
    # (--from-detections): scenario assignment covers the incomplete
    # frames and the per-scenario/pooled PA numbers come back finite
    res_det = eval_main(_args(workspace,
                              ["--no-gt-2d", "--json", "--from-detections"]))
    assert 0.0 < res_det["det_complete_frac"] < 1.0
    covered = sum(res_det[f"det_n_{n}"] for n in
                  ("ll", "rl", "la", "ra", "legs", "torso", "left", "right"))
    incomplete = round(res_det["det_frames"]
                       * (1 - res_det["det_complete_frac"]))
    assert covered + res_det["det_uncovered"] == incomplete
    # composition accounting: every pre-composition uncovered frame is
    # either served by a scenario pair or genuinely unservable (root+hip)
    assert (res_det["det_n_composed"] + res_det["det_unserved"]
            == res_det["det_uncovered"])
    if covered:
        assert np.isfinite(res_det["det_pa_recovered_mean"])
        assert np.isfinite(res_det["det_pa_naive_mean"])
    # requires --no-gt-2d
    with pytest.raises(SystemExit):
        eval_main(_args(workspace, ["--json", "--from-detections"]))


def test_from_detections_composition(workspace, tmp_path):
    """Completer composition + root imputation (VERDICT r3 next #7):
    forced cross-side patterns must be SERVED (composed from two
    completers), a lost root with detected hips must be imputed, and only
    root+hip loss stays unservable."""
    import pickle

    from links_tpu.cli.eval_h36m import main as eval_main

    with open(workspace / "synth.pkl", "rb") as f:
        d = pickle.load(f)
    subj = [s for s in d if s in ("S9", "S11")][0]
    p = np.array(d[subj]["poses_2d_pred"])
    p[0, [11, 12, 13]] = 0.0  # left arm ...
    p[0, [1, 2, 3]] = 0.0     # ... AND right leg: needs two completers
    p[1, 0] = 0.0             # root lost, hips detected: imputable
    p[2, 0] = 0.0
    p[2, 1] = 0.0             # root AND a hip lost: unservable
    d[subj]["poses_2d_pred"] = p
    path = tmp_path / "synth_cross.pkl"
    with open(path, "wb") as f:
        pickle.dump(d, f)

    res = eval_main(["--data", str(path),
                     "--model-dir", str(workspace / "models"),
                     "--f32", "--no-gt-2d", "--json", "--from-detections"])
    assert res["det_n_composed"] >= 1
    assert res["det_root_imputed"] >= 1
    assert res["det_unserved"] >= 1
    assert np.isfinite(res["det_pa_composed"])
    assert np.isfinite(res["det_naive_pa_composed"])
    assert np.isfinite(res["det_pa_all_served_mean"])
    # the forced cross-side frame rode a scenario pair
    assert any(k.startswith("det_n_pair_") for k in res)


def test_mpi_inf_3dhp_variant(workspace):
    """MPI-INF-3DHP end-to-end (VERDICT r1 missing #6): --dataset mpi routes
    through poses_3d_univ GT + the mpi_vnect normalization
    (utils/mpi_inf_3dhp_dataset_class.py:8-64) and eval reports PCK/AUC."""
    from links_tpu.cli.eval_h36m import main as eval_main
    from links_tpu.cli.train_leg_torso_lifter import main as train_main

    mpi = ["--dataset", "mpi", "--test-norm", "mpi_vnect"]
    train_main(_args(workspace, mpi))
    res = eval_main(_args(workspace, mpi + ["--mode", "leg_torso", "--json"]))
    for k in ("pa_mpjpe", "n_mpjpe", "pck", "auc"):
        assert np.isfinite(res[k]), k
    assert 0.0 <= res["pck"] <= 100.0
    assert 0.0 <= res["auc"] <= 1.0


def test_metrics_logged(workspace):
    log = workspace / "models" / "left_right_lifter.jsonl"
    assert log.exists()
    records = [json.loads(l) for l in log.read_text().splitlines()]
    epoch_recs = [r for r in records if "loss" in r]
    assert epoch_recs, "no epoch records logged"
    for k in ("likeli", "rep_rot", "L3d", "re_rot_3d", "bl_prior",
              "pa_left", "pa_right", "mpjpe_scaled_left"):
        assert k in epoch_recs[-1], k


def test_attention_lifter_variant(workspace):
    """--attention trains the 2-head attention lifter (VERDICT r1 missing
    #6: the SURVEY §2.4 flagged extension must be invocable) and the eval
    CLI consumes its checkpoint transparently — lifter_apply dispatches on
    the stored param structure."""
    from links_tpu.cli.eval_h36m import main as eval_main
    from links_tpu.cli.train_left_right_lifter import main as train_main

    state = train_main(_args(workspace, ["--attention"]))
    assert int(state.step) > 0
    assert "qkv" in state.params, "attention params expected"
    res = eval_main(_args(workspace, ["--json"]))
    assert np.isfinite(res["pa_mpjpe"])


def test_lift_cli(workspace, tmp_path):
    """Batch-inference serving surface: dataset path, raw-2D contract path,
    and occluded-scenario infill all emit (N,3,17) npz + a JSON summary."""
    from links_tpu.cli.lift import main

    out = tmp_path / "pred.npz"
    pred = main(_args(workspace, ["--out", str(out), "--limit", "48"]))
    assert pred.shape == (48, 3, 17) and np.isfinite(pred).all()
    with np.load(out) as z:
        assert z["poses_3d"].shape == (48, 3, 17)
        p2d = z["poses_2d"]

    # raw-2D serving contract: normalized (N,34) in, no dataset loader
    raw = tmp_path / "raw.npy"
    np.save(raw, p2d)
    out2 = tmp_path / "pred_raw.npz"
    pred2 = main(_args(workspace, ["--raw-2d", str(raw), "--out", str(out2),
                                   "--mode", "leg_torso"]))
    assert pred2.shape == (48, 3, 17) and np.isfinite(pred2).all()

    # occluded serving path: lift visible joints + completer infill
    out3 = tmp_path / "pred_occ.npz"
    pred3 = main(_args(workspace, ["--raw-2d", str(raw), "--out", str(out3),
                                   "--scenario", "torso"]))
    assert pred3.shape == (48, 3, 17) and np.isfinite(pred3).all()

    # int8 post-training quantized serving stays close to the f32 output
    out4 = tmp_path / "pred_q.npz"
    pred4 = main(_args(workspace, ["--raw-2d", str(raw), "--out", str(out4),
                                   "--quant", "int8"]))
    rel = np.linalg.norm(pred4 - pred) / np.linalg.norm(pred)
    assert rel < 0.05, rel


def test_export_cli(workspace, tmp_path):
    """links-export freezes the serving forward into a self-contained
    StableHLO artifact (weights embedded, symbolic batch) and verifies the
    round trip against the live forward; --inspect reads it back."""
    from links_tpu.cli.export_model import main

    out = tmp_path / "lr.stablehlo"
    summary = main(_args(workspace, ["--out", str(out),
                                     "--platforms", "cpu"]))
    assert summary["verified"] is True
    assert summary["batch"] == "symbolic"
    assert out.stat().st_size == summary["bytes"] > 1_000_000

    info = main(["--inspect", str(out)])
    assert info["platforms"] == ["cpu"]
    assert any("51" in s for s in info["outputs"])

    # int8-quantized export: same program, ~4x smaller embedded weights
    outq = tmp_path / "lr_q.stablehlo"
    sq = main(_args(workspace, ["--out", str(outq), "--platforms", "cpu",
                                "--quant", "int8"]))
    assert sq["verified"] is True
    assert sq["bytes"] < 0.35 * summary["bytes"]


def test_visualise_video(workspace):
    """--what video renders a GT-vs-prediction comparison clip through the
    CLI (reference ships pre-rendered videos, videos/README.md:1-17)."""
    from links_tpu.cli.visualise import main

    out = workspace / "cmp.gif"
    main(_args(workspace, ["--what", "video", "--frames", "4", "--fps", "2",
                           "--use-best", "--out", str(out)]))
    assert out.exists() and out.stat().st_size > 0
