import json

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy; run with `pytest -m ""`


def test_run_pipeline_all_stages(tmp_path, capsys):
    from links_tpu.cli.run_pipeline import main

    ws = tmp_path
    main([
        "--stages", "1,2,3a,3b,4,eval",
        "--data", str(ws / "synth.pkl"),
        "--model-dir", str(ws / "models"),
        "--synthetic", "--synthetic-n", "48",
        "--epochs", "1", "--batch-size", "16", "--f32",
        "--eval-args=--json",
    ])
    out = capsys.readouterr().out
    # the eval stage's JSON line is the last json-parseable line
    last = [l for l in out.splitlines() if l.startswith("{")][-1]
    parsed = json.loads(last)
    assert np.isfinite(parsed["pa_mpjpe"])
    for name in ("full_flow", "flow_left", "lifter_legs", "occlusion_models"):
        assert (ws / "models" / name).exists()


def test_run_pipeline_rejects_unknown_stage(tmp_path):
    from links_tpu.cli.run_pipeline import main

    with pytest.raises(SystemExit):
        main(["--stages", "1,bogus"])


def test_run_pipeline_retries_then_fails(tmp_path, monkeypatch, capsys):
    from links_tpu.cli import run_pipeline

    calls = []

    def broken_main(flags):
        calls.append(list(flags))
        raise RuntimeError("boom")

    monkeypatch.setattr(run_pipeline, "_stage_main", lambda s: broken_main)
    with pytest.raises(SystemExit):
        run_pipeline.main(["--stages", "1", "--retries", "2"])
    assert len(calls) == 3
    # retry attempts pass --resume
    assert "--resume" not in calls[0]
    assert "--resume" in calls[1] and "--resume" in calls[2]


def test_run_pipeline_use_best_routing(monkeypatch):
    """--use-best is appended only for stages that accept it (4 and eval)."""
    from links_tpu.cli import run_pipeline

    seen = {}

    def fake_stage_main(stage):
        def fake_main(flags):
            seen[stage] = list(flags)
        return fake_main

    monkeypatch.setattr(run_pipeline, "_stage_main", fake_stage_main)
    run_pipeline.main(["--stages", "1,2,3a,3b,4,eval", "--use-best"])
    for stage in ("1", "2", "3a", "3b"):
        assert "--use-best" not in seen[stage], stage
    for stage in ("4", "eval"):
        assert "--use-best" in seen[stage], stage


def test_seed_sweep_promotes_winner(tmp_path, monkeypatch, capsys):
    """--lifter-seeds: each seed trains in <model-dir>/seed<k>/, the
    winner by the BestTracker's recorded validation metric is promoted
    into the base model dir, and a gate-vetoed seed (no _best artifact)
    is disqualified rather than crashing the sweep."""
    import jax.numpy as jnp

    from links_tpu import ckpt
    from links_tpu.cli import run_pipeline

    base = tmp_path / "models"
    base.mkdir()
    (base / "full_flow").mkdir()  # symlinked into each seed dir

    def fake_stage(flags):
        # mimic the stage CLI: write artifacts into --model-dir
        mdir = run_pipeline._forwarded_model_dir(flags)
        seed = int(flags[flags.index("--seed") + 1])
        params = {"w": jnp.full((2,), float(seed))}
        ckpt.save_checkpoint(f"{mdir}/lifter_left_right", params)
        if seed == 7:
            return  # gate vetoed every epoch: no _best saved
        ckpt.save_checkpoint(f"{mdir}/lifter_left_right_best", params,
                             extra={"epoch": seed, "pa_mean": 100.0 - seed})

    monkeypatch.setattr(run_pipeline, "_stage_main", lambda s: fake_stage)
    run_pipeline.main(["--stages", "3a", "--lifter-seeds", "3,7,5",
                       "--model-dir", str(base)])
    out = capsys.readouterr()
    assert "seed 7: no best checkpoint" in out.err
    # seed 5 has the lowest pa_mean (95.0) of the qualified seeds
    assert "seed 5 wins" in out.out
    for k in (3, 5, 7):
        assert (base / f"seed{k}" / "full_flow").exists()  # shared flows
    promoted = ckpt.restore_checkpoint(base / "lifter_left_right_best")
    assert promoted["extra"]["epoch"] == 5
    import numpy as np

    np.testing.assert_allclose(np.asarray(promoted["state"]["w"]), 5.0)


def test_seed_sweep_all_disqualified_exits(tmp_path, monkeypatch):
    from links_tpu.cli import run_pipeline

    def fake_stage(flags):
        pass  # never writes a _best

    monkeypatch.setattr(run_pipeline, "_stage_main", lambda s: fake_stage)
    with pytest.raises(SystemExit):
        run_pipeline.main(["--stages", "3a", "--lifter-seeds", "1,2",
                           "--model-dir", str(tmp_path / "m")])


def test_seed_sweep_disqualifies_crashing_seed(tmp_path, monkeypatch, capsys):
    """A seed that crashes through every retry is disqualified, not fatal
    (review r5): the other seeds' completed training must survive."""
    import jax.numpy as jnp

    from links_tpu import ckpt
    from links_tpu.cli import run_pipeline

    base = tmp_path / "models"
    base.mkdir()

    def fake_stage(flags):
        mdir = run_pipeline._forwarded_model_dir(flags)
        seed = int(flags[flags.index("--seed") + 1])
        if seed == 9:
            raise RuntimeError("deterministic NaN crash")
        params = {"w": jnp.full((2,), float(seed))}
        ckpt.save_checkpoint(f"{mdir}/lifter_left_right", params)
        ckpt.save_checkpoint(f"{mdir}/lifter_left_right_best", params,
                             extra={"epoch": 1, "pa_mean": float(seed)})

    monkeypatch.setattr(run_pipeline, "_stage_main", lambda s: fake_stage)
    run_pipeline.main(["--stages", "3a", "--lifter-seeds", "9,4",
                       "--retries", "1", "--model-dir", str(base)])
    out = capsys.readouterr()
    assert "seed 9: crashed through every retry; disqualified" in out.err
    assert "seed 4 wins" in out.out
    assert (base / "lifter_left_right_best").exists()


def test_seed_sweep_strips_forwarded_log(tmp_path, monkeypatch, capsys):
    import jax.numpy as jnp

    from links_tpu import ckpt
    from links_tpu.cli import run_pipeline

    base = tmp_path / "models"
    base.mkdir()
    seen = []

    def fake_stage(flags):
        seen.append(list(flags))
        mdir = run_pipeline._forwarded_model_dir(flags)
        ckpt.save_checkpoint(f"{mdir}/lifter_left_right", {"w": jnp.ones(2)})
        ckpt.save_checkpoint(f"{mdir}/lifter_left_right_best",
                             {"w": jnp.ones(2)},
                             extra={"epoch": 0, "pa_mean": 1.0})

    monkeypatch.setattr(run_pipeline, "_stage_main", lambda s: fake_stage)
    run_pipeline.main(["--stages", "3a", "--lifter-seeds", "2",
                       "--model-dir", str(base), "--log", "/tmp/shared.jsonl"])
    assert "dropping forwarded --log" in capsys.readouterr().err
    assert all("--log" not in f for f in seen[0])


def test_best_extra_prefers_sidecar(tmp_path, monkeypatch):
    """_best_extra reads the BestTracker's .meta.json sidecar instead of
    restoring the full params tree (review r5 efficiency finding)."""
    import argparse

    import jax.numpy as jnp

    from links_tpu import ckpt
    from links_tpu.cli import _common as C
    from links_tpu.cli import run_pipeline

    args = argparse.Namespace(model_dir=str(tmp_path))
    t = C.BestTracker("pa_mean")
    assert t.update(args, 4, {"pa_mean": 61.9}, {"thing": {"w": jnp.ones(2)}})
    sidecar = tmp_path / "thing_best.meta.json"
    assert sidecar.exists()

    def boom(*a, **k):
        raise AssertionError("sidecar present: full restore must not run")

    import links_tpu.ckpt as ck

    monkeypatch.setattr(ck, "restore_checkpoint", boom)
    epoch, metric, value = run_pipeline._best_extra(tmp_path / "thing_best")
    assert (epoch, metric, value) == (4, "pa_mean", 61.9)


def test_clear_stage_artifacts(tmp_path):
    """Fresh (non --resume) runs remove the stage's own stale artifacts;
    --resume keeps them; frozen inputs are never touched."""
    import argparse

    from links_tpu.cli import _common as C

    base = tmp_path
    for name in ("lifter_left_right", "lifter_left_right_best",
                 "left_right_run", "full_flow"):
        (base / name).mkdir()
    (base / "lifter_left_right_best.meta.json").write_text("{}")

    args = argparse.Namespace(model_dir=str(base), resume=True)
    C.clear_stage_artifacts(args, "left_right", ["lifter_left_right"])
    assert (base / "lifter_left_right").exists()  # resume: untouched

    args.resume = False
    C.clear_stage_artifacts(args, "left_right", ["lifter_left_right"])
    for name in ("lifter_left_right", "lifter_left_right_best",
                 "left_right_run"):
        assert not (base / name).exists()
    assert not (base / "lifter_left_right_best.meta.json").exists()
    assert (base / "full_flow").exists()  # frozen input: never touched
