"""Trajectory-level differentials vs the executed reference (VERDICT r1
next #2): not one step, but ≥20 optimizer steps across ≥2 epoch boundaries,
so Adam-moment evolution, coupled weight decay, and the per-epoch
ExponentialLR staircase (train_left_right_lifter.py:116-119) are all shown
to stay matched between the torch reference and links_tpu.

RNG is injected on both sides (pre-drawn eps queues), so the trajectories
are deterministic and comparable; everything else — the loss code, the
optimizers, the schedulers — is the production path on each side:

* torch: the reference's ACTUAL ``LitLifter.training_step`` +
  ``configure_optimizers`` (two Adams + two ExponentialLRs), loaded via
  tests/_reference_shim.py and stepped exactly as ``pl.Trainer`` would
  (scheduler.step() at each epoch end, train_left_right_lifter.py:116-119).
* links_tpu: ``steps._make_step`` over the real ``left_right_loss`` with
  ``train.make_optimizer`` (single optax chain whose staircase schedule
  must reproduce the per-epoch torch scheduler).

Stage 1 has no LightningModule — the reference loop is module-bottom code
that cannot execute without FrEIA (train_full_pose_norm_flow.py:69 uses a
commented-out loader). Its torch side therefore mirrors the loop body
:67-115 statement-for-statement with the FlowSeq adapter (itself parity-
tested in test_reference_parity.py) while the optimizer/scheduler recipe
(:53-54) runs through real torch optim classes.
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import links_tpu.flows.sequence as flow_seq
import links_tpu.objectives.lifter as lifter_obj
import links_tpu.train.steps as steps
from links_tpu import ckpt, flows, models, train
from links_tpu.config import FlowTrainConfig, LifterTrainConfig
from links_tpu.core.geometry import PI, rotation_about_x, rotation_about_y

from tests._reference_shim import load_reference, load_trainer_module
from tests.test_reference_parity import _INN, _t

pytestmark = pytest.mark.slow  # executes the reference trainer for N steps

B = 8            # loader batch (augmented to 2B inside the step)
SPE = 4          # steps per epoch -> LR decays at t = 4, 8, 12, ...
N_STEPS = 22     # crosses 5 epoch boundaries


def _draws(rng, n_steps):
    """Pre-drawn randomness queues shared by both frameworks."""
    return (
        [rng.normal(size=(B, 34)).astype(np.float32) for _ in range(n_steps)],
        [rng.normal(size=(2 * B, 1)).astype(np.float32) for _ in range(n_steps)],
        [rng.uniform(size=(2 * B, 1)).astype(np.float32) for _ in range(n_steps)],
    )


def _batches(rng, n_steps):
    out = []
    for _ in range(n_steps):
        b = rng.normal(size=(B, 34)).astype(np.float32) * 0.1
        b.reshape(B, 2, 17)[:, :, 0] = 0.0
        out.append(b)
    return out


def _pinned_add_noise(key, z, noise_factor):
    """flows.sequence.add_noise with the Gaussian draw supplied as ``key``
    (same perturbation law: z + factor·eps·z, helpers.py:298-308)."""
    return z + noise_factor * key * z


def _pinned_rotation(key, props, use_elevation=True, axis_name=None):
    """sample_rotation with (eps_elev, u_azim) supplied via ``key``."""
    eps_elev, u_azim = key
    r_comp = rotation_about_x(props)
    x_ang = -props.mean() + props.std(ddof=1) * eps_elev
    y_ang = (u_azim - 0.5) * 1.99 * PI
    return jnp.matmul(
        rotation_about_x(x_ang),
        jnp.matmul(rotation_about_y(y_ang), r_comp, precision="highest"),
        precision="highest",
    )


def _rel_l2(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-30)


class TestStage3aTrajectoryParity:
    def test_losses_and_params_track_over_epochs(self, rng, monkeypatch):
        keys = jax.random.split(jax.random.PRNGKey(5), 5)
        full_flow = flows.init_flow(keys[0], 34)
        left_flow = flows.init_flow(keys[1], 22)
        right_flow = flows.init_flow(keys[2], 22)
        left_p = models.init_lifter(keys[3], 11)
        right_p = models.init_lifter(keys[4], 11)

        batches = _batches(rng, N_STEPS)
        eps_noise, eps_elev, u_azim = _draws(rng, N_STEPS)

        # ---- torch: reference training_step + optimizers + schedulers ----
        mod = load_trainer_module("train_left_right_lifter.py", r"^left_inn2d = ")
        mod.Attention_Left_Right_Lifter = (
            lambda **kw: mod.Left_Right_Lifter(
                use_batchnorm=False, num_joints=kw.get("num_joints", 11),
                use_dropout=False)
        )
        lit = mod.LitLifter(
            _INN(22, ckpt.flow_to_torch(left_flow)),
            _INN(22, ckpt.flow_to_torch(right_flow)),
            _INN(34, ckpt.flow_to_torch(full_flow)),
        )
        lit.left_lifter.load_state_dict(
            {k: _t(v) for k, v in ckpt.lifter_to_torch(left_p).items()})
        lit.right_lifter.load_state_dict(
            {k: _t(v) for k, v in ckpt.lifter_to_torch(right_p).items()})
        opts, scheds = lit.configure_optimizers()
        lit._test_optimizers = opts
        lit._test_schedulers = scheds

        noise_q = [_t(e) for e in eps_noise]
        elev_q = [_t(e) for e in eps_elev]
        azim_q = [_t(u) for u in u_azim]
        monkeypatch.setattr(torch, "randn_like", lambda t, **k: noise_q.pop(0))
        monkeypatch.setattr(torch, "normal",
                            lambda mean, std=None, **k: elev_q.pop(0))
        monkeypatch.setattr(torch, "rand", lambda *size, **k: azim_q.pop(0))

        torch_losses, torch_lrs = [], []
        for t in range(N_STEPS):
            lit.training_step({"p2d_gt": _t(batches[t])}, t % SPE)
            torch_losses.append(float(lit.losses.loss.detach()))
            torch_lrs.append(opts[0].param_groups[0]["lr"])
            if (t + 1) % SPE == 0:  # training_epoch_end (:116-119)
                scheds[0].step()
                scheds[1].step()

        # ---- links_tpu: production loss + optax chain, injected RNG ----
        monkeypatch.setattr(flow_seq, "add_noise", _pinned_add_noise)
        monkeypatch.setattr(lifter_obj, "sample_rotation", _pinned_rotation)
        cfg = LifterTrainConfig(bf16=False)
        frozen = lifter_obj.LifterFrozen(full_flow, left_flow, right_flow)
        optimizer = train.make_optimizer(cfg.optim, SPE)

        def loss_fn(params, batch, key):
            eps_n, eps_e, u_a = key
            inp = lifter_obj.augment_with_samples(
                frozen.full_flow, batch, eps_n, cfg.noise_factor)
            return lifter_obj.left_right_loss(
                params, frozen, inp, (eps_e, u_a), cfg)

        step = jax.jit(steps._make_step(loss_fn, optimizer))
        stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), left_p, right_p)
        state = steps.init_state(stacked, optimizer)
        jax_losses = []
        for t in range(N_STEPS):
            state, aux = step(state, jnp.asarray(batches[t]),
                              (jnp.asarray(eps_noise[t]),
                               jnp.asarray(eps_elev[t]),
                               jnp.asarray(u_azim[t])))
            jax_losses.append(float(aux["loss"]))

        # per-step losses stay matched through 5 LR staircase drops
        np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-3)
        # the staircase itself: lr at step t must be lr0 * 0.95^(t//SPE)
        np.testing.assert_allclose(
            torch_lrs,
            [cfg.optim.learning_rate * cfg.optim.lr_gamma ** (t // SPE)
             for t in range(N_STEPS)], rtol=1e-6)

        # end-state parameters agree side-by-side
        end_left = jax.tree.map(lambda a: a[0], state.params)
        end_right = jax.tree.map(lambda a: a[1], state.params)
        for params, lifter in ((end_left, lit.left_lifter),
                               (end_right, lit.right_lifter)):
            sd = lifter.state_dict()
            for name, value in ckpt.lifter_to_torch(params).items():
                rel = _rel_l2(sd[name].detach().numpy(), value)
                # 5e-3: the angle-head res blocks see tiny gradients, so 22
                # Adam steps of f32 reassociation noise read as a larger
                # *relative* drift there (observed 2.1e-3; a real divergence
                # — wrong decay step, wrong wd coupling — reads as O(1))
                assert rel < 5e-3, (name, rel)


class TestStage1TrajectoryParity:
    def test_flow_training_tracks_over_epochs(self, rng, monkeypatch):
        ref = load_reference()
        flow = flows.init_flow(jax.random.PRNGKey(3), 34)
        batches = _batches(rng, N_STEPS)
        eps_noise = [rng.normal(size=(B, 34)).astype(np.float32)
                     for _ in range(N_STEPS)]

        # ---- torch mirror of train_full_pose_norm_flow.py:53-115 ----
        import benchmarks.torch_baseline as tb

        inn = _INN(34, ckpt.flow_to_torch(flow))
        optimizer = torch.optim.Adam(inn.parameters(), lr=2e-4,
                                     weight_decay=1e-5)
        scheduler = torch.optim.lr_scheduler.ExponentialLR(
            optimizer=optimizer, gamma=0.95)
        noise_q = [_t(e) for e in eps_noise]
        monkeypatch.setattr(torch, "randn_like", lambda t, **k: noise_q.pop(0))

        torch_losses = []
        for t in range(N_STEPS):
            inp = _t(batches[t])
            z, logdet = inn(inp)
            dist = (0.5 * torch.sum(z**2, 1) - logdet).mean()
            with torch.no_grad():
                noisy = ref.helpers.add_noise(z, noise_factor=0.2)
                samples, _ = inn(noisy, rev=True)
                samples = samples.reshape(-1, 2, 17)
                samples[:, :, [0]] = 0.0
                samples = samples.reshape(-1, 34).data
            z_s, logdet_s = inn(samples)
            dist_s = (0.5 * torch.sum(z_s**2, 1) - logdet_s).mean()
            loss = dist + dist_s
            optimizer.zero_grad()
            loss.backward()
            optimizer.step()
            torch_losses.append(float(loss.detach()))
            if (t + 1) % SPE == 0:  # scheduler.step() per epoch (:113)
                scheduler.step()

        # ---- links_tpu: the real stage-1 production step ----
        monkeypatch.setattr(flow_seq, "add_noise", _pinned_add_noise)
        cfg = FlowTrainConfig(bf16=False)
        optimizer_j = train.make_optimizer(cfg.optim, SPE)
        step = jax.jit(train.build_full_flow_step(flow.perm, optimizer_j, cfg))
        state = steps.init_state(flow.params, optimizer_j)
        jax_losses = []
        for t in range(N_STEPS):
            state, aux = step(state, jnp.asarray(batches[t]),
                              jnp.asarray(eps_noise[t]))
            jax_losses.append(float(aux["loss"]))

        np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-3)

        # end-state flow weights agree
        want = {k: v.detach().numpy() for k, v in inn.seq.state_dict().items()}
        got = ckpt.flow_to_torch(flows.Flow(state.params, flow.perm))
        remap = {"subnet.0.weight": "net.0.weight", "subnet.0.bias": "net.0.bias",
                 "subnet.2.weight": "net.2.weight", "subnet.2.bias": "net.2.bias",
                 "global_scale": "gs", "global_offset": "gb", "w_perm": "w"}
        for k in range(8):
            for src, dst in remap.items():
                rel = _rel_l2(want[f"blocks.{k}.{dst}"],
                              np.asarray(got[f"module_list.{k}.{src}"]).reshape(
                                  want[f"blocks.{k}.{dst}"].shape))
                assert rel < 2e-3, (k, src, rel)


class TestStage3bTrajectoryParity:
    def test_losses_and_params_track_over_epochs(self, rng, monkeypatch):
        """Same multi-step differential for the leg/torso stage
        (train_leg_torso_lifter.py:123-277 + the :118-121 scheduler
        staircase): two reference Adams/ExponentialLRs vs the single optax
        chain over the {'legs','torso'} param dict."""
        keys = jax.random.split(jax.random.PRNGKey(7), 5)
        full_flow = flows.init_flow(keys[0], 34)
        leg_flow = flows.init_flow(keys[1], 14)
        torso_flow = flows.init_flow(keys[2], 20)
        leg_p = models.init_lifter(keys[3], 7)
        torso_p = models.init_lifter(keys[4], 10)

        batches = _batches(rng, N_STEPS)
        eps_noise, eps_elev, u_azim = _draws(rng, N_STEPS)

        # ---- torch: reference training_step + optimizers + schedulers ----
        mod = load_trainer_module(
            "train_leg_torso_lifter.py", r"^## load pretrained INN")
        # __init__ freezes self.left_lifter/right_lifter that are never
        # created (train_leg_torso_lifter.py:69-73, SURVEY.md §7.3)
        mod.LitLifter.left_lifter = torch.nn.Linear(1, 1)
        mod.LitLifter.right_lifter = torch.nn.Linear(1, 1)
        lit = mod.LitLifter(
            _INN(14, ckpt.flow_to_torch(leg_flow)),
            _INN(20, ckpt.flow_to_torch(torso_flow)),
            _INN(34, ckpt.flow_to_torch(full_flow)),
        )
        lit.legs_lifter.load_state_dict(
            {k: _t(v) for k, v in ckpt.lifter_to_torch(leg_p).items()})
        lit.torso_lifter.load_state_dict(
            {k: _t(v) for k, v in ckpt.lifter_to_torch(torso_p).items()})
        opts, scheds = lit.configure_optimizers()
        lit._test_optimizers = opts
        lit._test_schedulers = scheds

        noise_q = [_t(e) for e in eps_noise]
        elev_q = [_t(e) for e in eps_elev]
        azim_q = [_t(u) for u in u_azim]
        monkeypatch.setattr(torch, "randn_like", lambda t, **k: noise_q.pop(0))
        monkeypatch.setattr(torch, "normal",
                            lambda mean, std=None, **k: elev_q.pop(0))
        monkeypatch.setattr(torch, "rand", lambda *size, **k: azim_q.pop(0))

        torch_losses, torch_lrs = [], []
        for t in range(N_STEPS):
            lit.training_step({"p2d_gt": _t(batches[t])}, t % SPE)
            torch_losses.append(float(lit.losses.loss.detach()))
            torch_lrs.append(opts[0].param_groups[0]["lr"])
            if (t + 1) % SPE == 0:  # training_epoch_end (:118-121)
                scheds[0].step()
                scheds[1].step()

        # ---- links_tpu: production loss + optax chain, injected RNG ----
        monkeypatch.setattr(flow_seq, "add_noise", _pinned_add_noise)
        monkeypatch.setattr(lifter_obj, "sample_rotation", _pinned_rotation)
        cfg = LifterTrainConfig(bf16=False)
        frozen = lifter_obj.LifterFrozen(full_flow, leg_flow, torso_flow)
        optimizer = train.make_optimizer(cfg.optim, SPE)

        def loss_fn(params, batch, key):
            eps_n, eps_e, u_a = key
            inp = lifter_obj.augment_with_samples(
                frozen.full_flow, batch, eps_n, cfg.noise_factor)
            return lifter_obj.leg_torso_loss(
                params["legs"], params["torso"], frozen, inp,
                (eps_e, u_a), cfg)

        step = jax.jit(steps._make_step(loss_fn, optimizer))
        state = steps.init_state({"legs": leg_p, "torso": torso_p}, optimizer)
        jax_losses = []
        for t in range(N_STEPS):
            state, aux = step(state, jnp.asarray(batches[t]),
                              (jnp.asarray(eps_noise[t]),
                               jnp.asarray(eps_elev[t]),
                               jnp.asarray(u_azim[t])))
            jax_losses.append(float(aux["loss"]))

        # atol 0.05: this stage's loss decays ~40x over the window (265 -> 10),
        # so late-step f32 reassociation noise (~0.03 absolute) reads as a
        # larger *relative* error; a real divergence is O(1) on these values
        np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-3,
                                   atol=0.05)
        np.testing.assert_allclose(
            torch_lrs,
            [cfg.optim.learning_rate * cfg.optim.lr_gamma ** (t // SPE)
             for t in range(N_STEPS)], rtol=1e-6)

        for params, lifter in ((state.params["legs"], lit.legs_lifter),
                               (state.params["torso"], lit.torso_lifter)):
            sd = lifter.state_dict()
            for name, value in ckpt.lifter_to_torch(params).items():
                rel = _rel_l2(sd[name].detach().numpy(), value)
                assert rel < 5e-3, (name, rel)


class TestStage4TrajectoryParity:
    # reference attr name -> links_tpu completer name
    NAME_MAP = {
        "left_leg_predictor": "left_leg",
        "right_leg_predictor": "right_leg",
        "left_arm_predictor": "left_arm",
        "right_arm_predictor": "right_arm",
        "both_legs_predictor": "both_legs",
        "torso_predictor": "torso",
        "left_predictor": "left_side",
        "right_predictor": "right_side",
    }

    def test_losses_and_params_track_over_epochs(self, rng, monkeypatch):
        """Multi-step differential for the occlusion stage
        (train_occlusion_models.py:144-313 + the 8 Adams/ExponentialLRs of
        :111-137): all 8 completers vs the single optax chain over the
        completer dict, through the same LR staircase."""
        import links_tpu.objectives.occlusion as occ_obj
        from links_tpu.config import OcclusionTrainConfig
        from tests._reference_shim import load_reference

        ref = load_reference()
        keys = jax.random.split(jax.random.PRNGKey(11), 3)
        leg_p = models.init_lifter(keys[0], 7)
        torso_p = models.init_lifter(keys[1], 10)
        completers = models.init_all_completers(keys[2])

        batches = _batches(rng, N_STEPS)
        # two cumulative y-rotation draws per step (:252 and :279)
        u_rots = [(rng.uniform(size=(B, 1)).astype(np.float32),
                   rng.uniform(size=(B, 1)).astype(np.float32))
                  for _ in range(N_STEPS)]

        # ---- torch: reference training_step + 8 optimizers/schedulers ----
        mod = load_trainer_module(
            "train_occlusion_models.py", r"^## load pretrained lifting networks")

        def make_lifter(cls, nj, params):
            m = cls(num_joints=nj)
            m.load_state_dict({k: _t(v) for k, v in
                               ckpt.lifter_to_torch(params).items()})
            return m

        lit = mod.Limb_Predictor(
            make_lifter(ref.models_def.Torso_Lifter, 10, torso_p),
            make_lifter(ref.models_def.Leg_Lifter, 7, leg_p),
            make_lifter(ref.models_def.Left_Right_Lifter, 11,
                        models.init_lifter(jax.random.PRNGKey(99), 11)),
            make_lifter(ref.models_def.Left_Right_Lifter, 11,
                        models.init_lifter(jax.random.PRNGKey(98), 11)),
        )
        for attr, name in self.NAME_MAP.items():
            sd = {k: _t(v) for k, v in
                  ckpt.completer_to_torch(completers[name]).items()}
            _, unexpected = getattr(lit, attr).load_state_dict(sd, strict=False)
            assert not unexpected, (attr, unexpected)
        opts, scheds = lit.configure_optimizers()
        lit._test_optimizers = opts
        lit._test_schedulers = scheds

        rot_q = [_t(u) for pair in u_rots for u in pair]
        monkeypatch.setattr(torch, "rand", lambda *size, **k: rot_q.pop(0))

        torch_losses, torch_lrs = [], []
        for t in range(N_STEPS):
            lit.training_step({"p2d_gt": _t(batches[t])}, t % SPE)
            torch_losses.append(float(lit.losses.loss.detach()))
            torch_lrs.append(opts[0].param_groups[0]["lr"])
            if (t + 1) % SPE == 0:  # training_epoch_end (:139-142)
                for s in scheds:
                    s.step()

        # ---- links_tpu: production step + optax chain, injected RNG ----
        # occlusion_loss splits its key then draws uniform twice; route the
        # pre-drawn pair through by making split the identity on the pair
        # and uniform return its "key" (a pre-drawn array, traced per step)
        monkeypatch.setattr(occ_obj.jax.random, "split",
                            lambda key, num=2: key)
        monkeypatch.setattr(occ_obj.jax.random, "uniform",
                            lambda key, shape=None, *a, **k: key)
        cfg = OcclusionTrainConfig(bf16=False)
        optimizer = train.make_optimizer(cfg.optim, SPE)
        step = jax.jit(steps.build_occlusion_step(
            leg_p, torso_p, optimizer, cfg))
        state = steps.init_state(completers, optimizer)
        jax_losses = []
        for t in range(N_STEPS):
            state, aux = step(state, jnp.asarray(batches[t]),
                              (jnp.asarray(u_rots[t][0]),
                               jnp.asarray(u_rots[t][1])))
            jax_losses.append(float(aux["loss"]))

        np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-3,
                                   atol=0.05)
        np.testing.assert_allclose(
            torch_lrs,
            [cfg.optim.learning_rate * cfg.optim.lr_gamma ** (t // SPE)
             for t in range(N_STEPS)], rtol=1e-6)

        for attr, name in self.NAME_MAP.items():
            sd = getattr(lit, attr).state_dict()
            for pname, value in ckpt.completer_to_torch(
                    state.params[name]).items():
                rel = _rel_l2(sd[pname].detach().numpy(), value)
                assert rel < 5e-3, (attr, pname, rel)
