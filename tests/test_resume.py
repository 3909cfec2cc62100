"""Deterministic mid-run resume: N epochs straight == k epochs + resume for
the remaining N-k (params bitwise-comparable), through the real CLI."""

import pytest

pytestmark = pytest.mark.slow  # compile-heavy; run with `pytest -m ""`
import numpy as np

from links_tpu import ckpt


def _args(ws, extra=()):
    return [
        "--data", str(ws / "synth.pkl"),
        "--model-dir", str(ws / "models"),
        "--synthetic", "--synthetic-n", "64",
        "--batch-size", "32", "--f32",
        *extra,
    ]


def test_full_flow_resume_matches_straight_run(tmp_path):
    from links_tpu.cli.train_full_pose_norm_flow import main

    ws_a = tmp_path / "straight"
    ws_b = tmp_path / "resumed"
    ws_a.mkdir()
    ws_b.mkdir()

    state_a = main(_args(ws_a, ["--epochs", "3"]))

    main(_args(ws_b, ["--epochs", "1"]))
    # interrupt happened here; resume and run to epoch 3
    state_b = main(_args(ws_b, ["--epochs", "3", "--resume"]))

    a = np.asarray(state_a.params["global_offset"])
    b = np.asarray(state_b.params["global_offset"])
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
    # optimizer state also restored: second-moment leaves match
    import jax

    la = jax.tree.leaves(state_a.opt_state)
    lb = jax.tree.leaves(state_b.opt_state)
    for x, y in zip(la, lb):
        if hasattr(x, "shape") and getattr(x, "size", 0) > 1:
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-6, atol=1e-7)
    assert int(state_a.step) == int(state_b.step)


def test_resumed_flow_runs_pair_params_with_saved_perms(tmp_path):
    """The SO(D) mixing perms are seed-derived and NOT in the run
    checkpoint; a resumed run (even under a different --seed) must pair the
    restored params with the perms stored in the flow artifact — otherwise
    it silently trains against freshly-drawn orthogonal matrices."""
    from links_tpu.cli import _common as C
    from links_tpu.cli.train_full_pose_norm_flow import main as full_main
    from links_tpu.cli.train_part_norm_flows import main as part_main

    ws = tmp_path / "ws"
    ws.mkdir()

    full_main(_args(ws, ["--epochs", "1", "--seed", "1"]))
    part_main(_args(ws, ["--epochs", "1", "--seed", "1"]))
    perm_full = np.asarray(C.load_flow(ws / "models" / C.FULL_FLOW).perm)
    perm_left = np.asarray(C.load_flow(ws / "models" / C.FLOW_LEFT).perm)

    # resume under a DIFFERENT seed: artifacts must keep the saved perms
    full_main(_args(ws, ["--epochs", "2", "--seed", "99", "--resume"]))
    part_main(_args(ws, ["--epochs", "2", "--seed", "99", "--resume"]))

    np.testing.assert_array_equal(
        perm_full, np.asarray(C.load_flow(ws / "models" / C.FULL_FLOW).perm))
    np.testing.assert_array_equal(
        perm_left, np.asarray(C.load_flow(ws / "models" / C.FLOW_LEFT).perm))

    # sanity: a seed-99 fresh init would have produced different perms
    import jax

    from links_tpu import flows

    fresh = flows.init_flow(jax.random.split(C.key_from_seed(99))[1], 34)
    assert not np.array_equal(perm_full, np.asarray(fresh.perm))


def test_resume_flag_without_checkpoint_starts_fresh(tmp_path):
    from links_tpu.cli.train_full_pose_norm_flow import main

    ws = tmp_path / "fresh"
    ws.mkdir()
    state = main(_args(ws, ["--epochs", "1", "--resume"]))
    assert int(state.step) > 0
