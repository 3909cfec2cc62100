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
