"""CLI flag-default regression tests.

Round 4 flipped ``--bf16-opt-state`` to default ON for the lifter
trainers only (converged stage-3a twin matched f32 within 0.19 mm —
RESULTS.md round-4 section); the flow/occlusion trainers keep the f32
default. These tests pin the asymmetry and the flag→OptimConfig wiring
so a refactor can't silently change the training recipe.
"""
import argparse

import links_tpu.cli._common as C
from links_tpu.config import FlowTrainConfig, LifterTrainConfig


def _parse(bf16_default, argv):
    p = argparse.ArgumentParser()
    C.add_common_flags(p, bf16_opt_state_default=bf16_default)
    return p.parse_args(argv)


def test_lifter_default_is_bf16_moments():
    args = _parse(True, [])
    assert args.bf16_opt_state is True
    cfg = C.resolve_cfg(args, LifterTrainConfig())
    assert cfg.optim.bf16_moments is True


def test_no_bf16_opt_state_restores_f32_adam():
    args = _parse(True, ["--no-bf16-opt-state"])
    assert args.bf16_opt_state is False
    cfg = C.resolve_cfg(args, LifterTrainConfig())
    assert cfg.optim.bf16_moments is False


def test_flow_default_stays_f32_adam():
    args = _parse(False, [])
    assert args.bf16_opt_state is False
    cfg = C.resolve_cfg(args, FlowTrainConfig())
    assert cfg.optim.bf16_moments is False


def test_flow_can_opt_in():
    args = _parse(False, ["--bf16-opt-state"])
    cfg = C.resolve_cfg(args, FlowTrainConfig())
    assert cfg.optim.bf16_moments is True


def test_format_help_succeeds_on_every_trainer_parser():
    """ADVICE r4 (medium): a bare '%' in any help string makes argparse
    raise on --help. Build each trainer's full parser the way its main()
    does and render the help text."""
    def lifter_parser():
        p = argparse.ArgumentParser()
        C.add_lifter_flags(p)
        C.add_select_by_flag(p)
        C.add_flip_guard_flag(p)
        C.add_common_flags(p, bf16_opt_state_default=True)
        return p

    def flow_parser():
        p = argparse.ArgumentParser()
        C.add_common_flags(p)
        return p

    def occ_parser():
        p = argparse.ArgumentParser()
        C.add_lifter_flags(p)
        C.add_common_flags(p)
        C.add_lr_pt_flags(p)
        C.add_use_best_flag(p)
        return p

    for build in (lifter_parser, flow_parser, occ_parser):
        help_text = build().format_help()  # raises on an unescaped '%'
        assert "--seed" in help_text


def test_resolve_cfg_is_authoritative_both_directions():
    """ADVICE r4: --no-bf16-opt-state must win even if the config-level
    default ever flips to True."""
    import dataclasses

    args = _parse(True, ["--no-bf16-opt-state"])
    base = LifterTrainConfig()
    flipped_default = dataclasses.replace(
        base, optim=dataclasses.replace(base.optim, bf16_moments=True))
    cfg = C.resolve_cfg(args, flipped_default)
    assert cfg.optim.bf16_moments is False


def test_flip_guard_stops_after_k_flipped_epochs():
    """--flip-guard K: arms on the first un-flipped validation epoch, then
    stops after K consecutive flipped ones (cli/_common.py:FlipGuard)."""
    g = C.FlipGuard(3)
    # flipped from initialization: never arms, never fires
    for e in range(5):
        assert not g.update(e, {"val_tilt": 0.5})
    assert not g.armed
    # un-flipped epoch arms the guard
    assert not g.update(5, {"val_tilt": -0.2})
    assert g.armed
    # two flipped epochs: under patience
    assert not g.update(6, {"val_tilt": 0.1})
    assert not g.update(7, {"val_tilt": 0.3})
    # a recovery resets the streak
    assert not g.update(8, {"val_tilt": -0.1})
    assert g.streak == 0
    # K consecutive flipped epochs fire
    assert not g.update(9, {"val_tilt": 0.2})
    assert not g.update(10, {"val_tilt": 0.2})
    assert g.update(11, {"val_tilt": 0.2})
    assert g.fired_epoch == 11
    # epochs with no validation record are ignored, not counted
    g2 = C.FlipGuard(2)
    assert not g2.update(0, {"val_tilt": -1.0})
    assert not g2.update(1, {})          # non-validation epoch
    assert not g2.update(2, {"val_tilt": 0.1})
    assert not g2.update(3, {})
    assert g2.update(4, {"val_tilt": 0.1})


def test_flip_guard_disabled_by_default():
    g = C.FlipGuard(None)
    assert not g.update(0, {"val_tilt": -1.0})
    assert not g.update(1, {"val_tilt": 5.0})
    assert not g.update(2, {"val_tilt": 5.0})


def test_nll_cap_default_asymmetry():
    """Round 5: --nll-cap defaults to 500 for the LIFTER trainers (the
    seed-identical capped twin matched best PA within 0.16 mm and removed
    the epoch-89 self-sample detonation — RESULTS.md round-5), identity on
    healthy samples; flow trainers keep the uncapped reference default.
    --nll-cap 0 disables (parity recipe)."""
    p = argparse.ArgumentParser()
    C.add_common_flags(p, bf16_opt_state_default=True, nll_cap_default=500.0)
    args = p.parse_args([])
    assert args.nll_cap == 500.0
    cfg = C.resolve_cfg(args, LifterTrainConfig())
    assert cfg.nll_cap == 500.0

    args_off = p.parse_args(["--nll-cap", "0"])
    cfg_off = C.resolve_cfg(args_off, LifterTrainConfig())
    assert cfg_off.nll_cap == 0.0

    flow_args = _parse(False, [])
    assert flow_args.nll_cap is None
    flow_cfg = C.resolve_cfg(flow_args, FlowTrainConfig())
    assert flow_cfg.nll_cap == 0.0

    # the trainer CLIs themselves carry the defaults
    from links_tpu.cli.train_left_right_lifter import main as _  # noqa
    import links_tpu.cli.train_left_right_lifter as lr
    import links_tpu.cli.train_leg_torso_lifter as lt
    for mod in (lr, lt):
        src = open(mod.__file__).read()
        assert "nll_cap_default=500.0" in src
