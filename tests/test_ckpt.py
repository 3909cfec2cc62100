import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from links_tpu import ckpt, flows, models, train
from links_tpu.config import OptimConfig


def test_orbax_roundtrip(tmp_path):
    params = models.init_lifter(jax.random.PRNGKey(0), 7)
    optimizer = train.make_optimizer(OptimConfig(), 10)
    state = train.init_state(params, optimizer)
    key = jax.random.PRNGKey(42)
    ckpt.save_checkpoint(tmp_path / "ck", state, key=key, extra={"epoch": 3})
    restored = ckpt.restore_checkpoint(tmp_path / "ck")
    r_up = restored["state"].params["upscale"]["w"] if hasattr(restored["state"], "params") \
        else restored["state"]["params"]["upscale"]["w"]
    np.testing.assert_allclose(np.asarray(r_up), np.asarray(params["upscale"]["w"]))
    assert int(np.asarray(restored["extra"]["epoch"])) == 3
    rk = ckpt.restore_rng_key(restored)
    np.testing.assert_array_equal(
        jax.random.key_data(rk), jax.random.key_data(key)
    )


def test_async_save_matches_sync_and_orders_same_path(tmp_path):
    """The round-4 async checkpoint writer: a drained async save restores
    bit-identically to a sync one, and back-to-back saves to the SAME path
    land in submission order (the single worker is the ordering guarantee
    the trainers' per-epoch _best/_run overwrites rely on)."""
    params = models.init_lifter(jax.random.PRNGKey(0), 7)
    optimizer = train.make_optimizer(OptimConfig(), 10)
    state = train.init_state(params, optimizer)
    key = jax.random.PRNGKey(7)

    ckpt.save_checkpoint(tmp_path / "sync", state, key=key,
                         extra={"epoch": 5})
    ckpt.save_checkpoint(tmp_path / "async", state, key=key,
                         extra={"epoch": 5}, async_save=True)
    # ordering: three saves to one path; the last must win
    for e in (1, 2, 3):
        ckpt.save_checkpoint(tmp_path / "seq", state, extra={"epoch": e},
                             async_save=True)
    ckpt.wait_for_saves()

    a = ckpt.restore_checkpoint(tmp_path / "async")
    s = ckpt.restore_checkpoint(tmp_path / "sync")
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x),
                                                   np.asarray(y)),
        a["state"], s["state"])
    np.testing.assert_array_equal(a["rng_key"], s["rng_key"])
    assert int(np.asarray(
        ckpt.restore_checkpoint(tmp_path / "seq")["extra"]["epoch"])) == 3


def test_async_save_failure_surfaces_at_wait(tmp_path):
    """A failing async write must raise at the next wait_for_saves(), not
    vanish in the worker thread."""
    import pytest

    bad = tmp_path / "parent_is_a_file"
    bad.write_text("not a directory")
    ckpt.save_checkpoint(bad / "ck", {"x": jnp.ones(3)}, async_save=True)
    with pytest.raises(Exception):
        ckpt.wait_for_saves()
    # the error queue must be drained: a subsequent good save succeeds
    ckpt.save_checkpoint(tmp_path / "ok", {"x": jnp.ones(3)},
                         async_save=True)
    ckpt.wait_for_saves()
    assert (tmp_path / "ok").exists()


def test_async_save_survives_donation_of_source_buffers(tmp_path):
    """Regression (round-4 pipeline crash): the train step's donate_argnums
    deletes the epoch's param/opt buffers at the NEXT jitted call, racing
    the async writer's device_get — three stage trainers died mid-run with
    ``RuntimeError: Array has been deleted``. save_checkpoint must snapshot
    (device-side copy) at submit time, so deleting the caller's arrays right
    after submit cannot corrupt or fail the write."""
    state = {"w": jnp.arange(12.0).reshape(3, 4), "b": jnp.ones(4)}
    expect = jax.tree.map(np.asarray, state)
    ckpt.save_checkpoint(tmp_path / "ck", state, extra={"epoch": 9},
                         async_save=True)
    # simulate donation: delete the source device buffers immediately
    for leaf in jax.tree.leaves(state):
        leaf.delete()
    ckpt.wait_for_saves()
    restored = ckpt.restore_checkpoint(tmp_path / "ck")
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x), y),
        restored["state"], expect)
    assert int(np.asarray(restored["extra"]["epoch"])) == 9


def test_flow_export_matches_freia_state_dict_layout():
    """Pin ckpt.flow_to_torch to FrEIA SequenceINN's real state-dict layout
    (VERDICT r1 missing #3). The fixture records, for each flow dim the
    pipeline uses, every key and shape a `SequenceINN(D)` of 8 AllInOneBlocks
    with subnet_fc (helpers.py:291-293) registers: per block
    w_perm/w_perm_inv (D,D) buffers, global_scale/global_offset (1,D) params
    (input_rank 0 ⇒ a single leading broadcast axis), and subnet.0/2
    Linear(len1→1024→2·len2) weights, derived from FrEIA 0.2's
    AllInOneBlock.__init__ parameter registration."""
    import json
    import os

    fixture = json.load(open(os.path.join(
        os.path.dirname(__file__), "fixtures", "freia_sequenceinn_layout.json")))
    for dim_s, want in fixture.items():
        flow = flows.init_flow(jax.random.PRNGKey(0), int(dim_s))
        sd = ckpt.flow_to_torch(flow)
        assert set(sd) == set(want), dim_s
        for k, shape in want.items():
            assert list(sd[k].shape) == shape, (dim_s, k, sd[k].shape, shape)
        # and a state dict in exactly that layout imports losslessly
        back = ckpt.flow_from_torch(sd)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, int(dim_s)))
        z0, ld0 = flows.forward(flow, x)
        z1, ld1 = flows.forward(back, x)
        np.testing.assert_allclose(np.asarray(z0), np.asarray(z1), atol=1e-6)
        np.testing.assert_allclose(np.asarray(ld0), np.asarray(ld1), atol=1e-6)


def test_flow_torch_roundtrip():
    flow = flows.init_flow(jax.random.PRNGKey(1), 22, hidden=64)
    sd = ckpt.flow_to_torch(flow)
    back = ckpt.flow_from_torch(sd)
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 22))
    z0, ld0 = flows.forward(flow, x)
    z1, ld1 = flows.forward(back, x)
    np.testing.assert_allclose(np.asarray(z0), np.asarray(z1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld0), np.asarray(ld1), atol=1e-6)


class _TorchResBlock(tnn.Module):
    """Reference res_block semantics (models_def.py:10-39), flags off."""

    def __init__(self, n=1024):
        super().__init__()
        self.l1 = tnn.Linear(n, n)
        self.bn1 = tnn.LayerNorm(n)
        self.l2 = tnn.Linear(n, n)
        self.bn2 = tnn.LayerNorm(n)

    def forward(self, x):
        h = tnn.LeakyReLU()(self.l1(x))
        h = tnn.LeakyReLU()(self.l2(h))
        return h + x


class _TorchLifter(tnn.Module):
    """Reference lifter semantics (models_def.py:65-107)."""

    def __init__(self, nj):
        super().__init__()
        self.upscale = tnn.Linear(2 * nj, 1024)
        for name in ("res_common", "res_pose1", "res_pose2", "res_pose3",
                     "res_angle1", "res_angle2", "res_angle3"):
            setattr(self, name, _TorchResBlock())
        self.downscale = tnn.Linear(1024, nj)
        self.angles = tnn.Linear(1024, 1)

    def forward(self, x):
        act = tnn.LeakyReLU()
        h = act(self.res_common(self.upscale(x)))
        xd = act(self.res_pose1(h))
        xd = act(self.res_pose2(xd))
        xd = self.downscale(act(self.res_pose3(xd)))
        xa = act(self.res_angle1(h))
        xa = act(self.res_angle2(xa))
        xa = self.angles(act(self.res_angle3(xa)))
        return xd, xa


def test_lifter_forward_matches_torch():
    """Cross-framework check: export our lifter params to a torch module
    with the reference architecture; forwards must agree."""
    nj = 11
    params = models.init_lifter(jax.random.PRNGKey(3), nj)
    sd = ckpt.lifter_to_torch(params)
    tmod = _TorchLifter(nj)
    tmod.load_state_dict({k: torch.tensor(v) for k, v in sd.items()})
    x = np.random.default_rng(0).normal(size=(16, 22)).astype(np.float32)
    xd_j, xa_j = models.lifter_apply(params, jnp.asarray(x))
    with torch.no_grad():
        xd_t, xa_t = tmod(torch.tensor(x))
    np.testing.assert_allclose(np.asarray(xd_j), xd_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(xa_j), xa_t.numpy(), atol=2e-5)


def test_lifter_import_roundtrip():
    params = models.init_lifter(jax.random.PRNGKey(4), 7)
    back = ckpt.lifter_from_torch(
        {k: torch.tensor(v) for k, v in ckpt.lifter_to_torch(params).items()}
    )
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 14))
    a, _ = models.lifter_apply(params, x)
    b, _ = models.lifter_apply(back, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_eval_accepts_reference_pt_pair(tmp_path):
    """The flagship eval path must accept the reference's separate
    models/{left,right}_lifter.pt artifacts (eval_h36m.py:33-34) — both via
    explicit --left-pt/--right-pt and via the pair sitting in --model-dir."""
    from links_tpu.cli import eval_h36m

    left = models.init_lifter(jax.random.PRNGKey(0), 11, hidden=64)
    right = models.init_lifter(jax.random.PRNGKey(1), 11, hidden=64)
    lp = tmp_path / "left_lifter.pt"
    rp = tmp_path / "right_lifter.pt"
    ckpt.save_pt(lp, ckpt.lifter_to_torch(left))
    ckpt.save_pt(rp, ckpt.lifter_to_torch(right))
    data = str(tmp_path / "synthetic.pkl")

    res = eval_h36m.main([
        "--data", data, "--synthetic", "--synthetic-n", "32",
        "--model-dir", str(tmp_path), "--left-pt", str(lp),
        "--right-pt", str(rp), "--json",
    ])
    assert np.isfinite(res["pa_mpjpe"]) and np.isfinite(res["n_mpjpe"])

    # route 2: the pair found in --model-dir with no stacked artifact
    res2 = eval_h36m.main([
        "--data", data, "--model-dir", str(tmp_path), "--json",
    ])
    np.testing.assert_allclose(res2["pa_mpjpe"], res["pa_mpjpe"], rtol=1e-6)


def test_completer_roundtrip_and_pt_file(tmp_path):
    params = models.init_completer(jax.random.PRNGKey(6), 14, 3)
    path = tmp_path / "completer.pt"
    ckpt.save_pt(path, ckpt.completer_to_torch(params))
    back = ckpt.load_completer_pt(path)
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 42))
    np.testing.assert_allclose(
        np.asarray(models.completer_apply(params, x)),
        np.asarray(models.completer_apply(back, x)),
        atol=1e-6,
    )


def test_best_tracker_update_and_resume_restore(tmp_path):
    """BestTracker keeps the best-metric artifact and, via maybe_restore,
    a resumed run cannot regress it (cli/_common.py:BestTracker)."""
    import argparse

    from links_tpu.cli import _common as C

    args = argparse.Namespace(model_dir=str(tmp_path))
    params_a = {"w": jnp.ones((2, 2))}
    params_b = {"w": 2.0 * jnp.ones((2, 2))}

    t = C.BestTracker("pa")
    assert t.update(args, 0, {"pa": 100.0}, {"thing": params_a})
    assert not t.update(args, 1, {"pa": 120.0}, {"thing": params_b})  # worse
    assert not t.update(args, 2, {}, {"thing": params_b})  # no metric
    assert t.update(args, 3, {"pa": 80.0}, {"thing": params_b})
    assert t.epoch == 3 and t.best == 80.0

    saved = ckpt.restore_checkpoint(tmp_path / "thing_best")
    np.testing.assert_allclose(saved["state"]["params"]["w"],
                               np.asarray(params_b["w"]))
    assert saved["extra"]["epoch"] == 3 and saved["extra"]["pa"] == 80.0

    # fresh tracker (post-crash resume): restores the 80.0 bar and refuses
    # a worse "best"
    t2 = C.BestTracker("pa").maybe_restore(args, "thing")
    assert t2.best == 80.0 and t2.epoch == 3
    assert not t2.update(args, 4, {"pa": 90.0}, {"thing": params_a})
    saved2 = ckpt.restore_checkpoint(tmp_path / "thing_best")
    assert saved2["extra"]["epoch"] == 3

    # restore on a missing artifact is a no-op
    t3 = C.BestTracker("pa").maybe_restore(args, "absent")
    assert t3.best == float("inf")


def test_pt_roundtrip_detects_transposed_w_perm():
    """Guard the FrEIA ``w_perm`` orientation assumption (VERDICT r1 next
    #4): the export→import round trip must reproduce forward outputs
    exactly, AND the same check must FAIL when the stored w_perm is
    transposed — i.e. the round trip is genuinely sensitive to the matmul
    convention (z = y @ w_perm.T, FrEIA _permute via F.linear), so a wrong
    reading of FrEIA's orientation could not pass silently."""
    flow = flows.init_flow(jax.random.PRNGKey(3), 14, hidden=32)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 14)).astype(np.float32))
    sd = ckpt.flow_to_torch(flow)
    back = ckpt.flow_from_torch(sd)
    z0, ld0 = flows.forward(flow, x)
    z1, ld1 = flows.forward(back, x)
    np.testing.assert_array_equal(np.asarray(z0), np.asarray(z1))
    np.testing.assert_array_equal(np.asarray(ld0), np.asarray(ld1))

    flipped_sd = {
        k: (v.T.copy() if k.endswith(("w_perm", "w_perm_inv")) else v)
        for k, v in sd.items()
    }
    flipped = ckpt.flow_from_torch(flipped_sd)
    z2, _ = flows.forward(flipped, x)
    assert not np.allclose(np.asarray(z2), np.asarray(z0), atol=1e-5), (
        "transposed w_perm import produced identical outputs — the "
        "round-trip check cannot see the orientation and guards nothing")


def test_best_tracker_tilt_gate(tmp_path):
    """--select-by nll-tilt (VERDICT r3 next #3): NLL-improving epochs in
    the depth-flipped mode (val_tilt >= 0) must be vetoed; a run that never
    passes the gate saves NO _best (it is flipped throughout, and any
    selection would ship a flipped model)."""
    import argparse

    from links_tpu.cli import _common as C

    args = argparse.Namespace(model_dir=str(tmp_path), select_by="nll-tilt")
    assert C.select_metric(args, "pa") == "val_nll"
    assert C.select_gate(args) == "val_tilt"
    assert C.select_gate(argparse.Namespace(select_by="nll")) is None

    params = {"w": jnp.ones((2,))}
    t = C.BestTracker(C.select_metric(args, "pa"),
                      gate_metric=C.select_gate(args))
    # better NLL but flipped → vetoed
    assert not t.update(args, 0, {"val_nll": 1.0, "val_tilt": 0.3},
                        {"thing": params})
    # gate metric missing entirely → vetoed, not crashed
    assert not t.update(args, 1, {"val_nll": 0.9}, {"thing": params})
    assert t.gated_out == 2 and t.epoch == -1
    assert not (tmp_path / "thing_best").exists()
    # un-flipped epoch with worse NLL than the vetoed ones still wins
    assert t.update(args, 2, {"val_nll": 2.0, "val_tilt": -0.4},
                    {"thing": params})
    assert t.epoch == 2 and t.best == 2.0


def test_best_tracker_deferred_flush(tmp_path):
    """Deferred mode (round 5): improvements snapshot to device memory and
    hit disk only at flush() — each orbax write costs seconds on the
    tunneled chip (PERF.md "Delivered vs benched"), and early training
    improves almost every epoch. The snapshot must be a COPY: mutating
    (donating) the source params after update() must not corrupt the
    pending best."""
    import argparse

    from links_tpu.cli import _common as C

    args = argparse.Namespace(model_dir=str(tmp_path))
    t = C.BestTracker("pa", deferred=True)

    params = {"w": jnp.ones((2, 2))}
    assert t.update(args, 0, {"pa": 100.0}, {"thing": params})
    assert not (tmp_path / "thing_best").exists()  # nothing on disk yet

    # a second improvement replaces the pending snapshot in place
    params2 = {"w": 2.0 * jnp.ones((2, 2))}
    assert t.update(args, 1, {"pa": 90.0}, {"thing": params2})
    del params2  # donation analogue: source buffers gone before flush

    t.flush(args, async_save=False)
    saved = ckpt.restore_checkpoint(tmp_path / "thing_best")
    np.testing.assert_allclose(saved["state"]["params"]["w"],
                               2.0 * np.ones((2, 2)))
    assert saved["extra"]["epoch"] == 1 and saved["extra"]["pa"] == 90.0

    # flush with nothing pending is a no-op (does not rewrite / corrupt)
    t.flush(args, async_save=False)
    saved2 = ckpt.restore_checkpoint(tmp_path / "thing_best")
    assert saved2["extra"]["epoch"] == 1

    # a worse epoch after flush leaves disk untouched
    assert not t.update(args, 2, {"pa": 95.0}, {"thing": params})
    t.flush(args, async_save=False)
    assert ckpt.restore_checkpoint(
        tmp_path / "thing_best")["extra"]["epoch"] == 1


def test_resume_dtype_drift_warns_and_casts(tmp_path, capsys):
    """ADVICE r4: resuming a run checkpoint whose float leaves (e.g. f32
    Adam moments) differ from the configured optimizer dtype must warn and
    cast deterministically — not silently reinterpret or crash on an orbax
    dtype mismatch."""
    import argparse

    from links_tpu.cli import _common as C

    args = argparse.Namespace(model_dir=str(tmp_path), resume=True)
    key = jax.random.PRNGKey(0)
    # on-disk recipe: f32 moments; int leaf must never be flagged
    state_f32 = {"params": {"w": jnp.ones((3,), jnp.float32)},
                 "mu": jnp.full((3,), 0.25, jnp.float32),
                 "step": jnp.zeros((), jnp.int32)}
    ckpt.save_checkpoint(C.artifact(args, "stage_run"), state_f32, key=key,
                         extra={"next_epoch": 7})

    # configured recipe: bf16 moments (the round-4 default flip)
    state_bf16 = {"params": {"w": jnp.zeros((3,), jnp.float32)},
                  "mu": jnp.zeros((3,), jnp.bfloat16),
                  "step": jnp.zeros((), jnp.int32)}
    drift = C._restore_dtype_drift(
        C.artifact(args, "stage_run"),
        {"state": state_bf16, "rng_key": jax.random.key_data(key),
         "extra": {"next_epoch": 0}})
    assert len(drift) == 1 and any("mu" in k for k in drift)

    state, out_key, start = C.maybe_resume(args, "stage", state_bf16, key)
    err = capsys.readouterr().err
    assert "WARNING" in err and "--no-bf16-opt-state" in err
    assert start == 7
    assert state["mu"].dtype == jnp.bfloat16  # configured dtype wins...
    np.testing.assert_allclose(  # ...with the checkpoint's values
        np.asarray(state["mu"], np.float32), 0.25)
    np.testing.assert_allclose(np.asarray(state["params"]["w"]), 1.0)

    # no drift → no warning
    state2, _, _ = C.maybe_resume(args, "stage", state_f32, key)
    assert "WARNING" not in capsys.readouterr().err
    assert state2["mu"].dtype == jnp.float32
