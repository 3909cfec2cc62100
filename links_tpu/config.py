"""Stage configurations. Defaults mirror the reference's hard-coded
constants and argparse flags (SURVEY.md §2.9): lr=0.0002, Adam wd=1e-5,
ExponentialLR gamma=0.95 per epoch, batch 256 (4·64 for the full-pose flow),
100 epochs (10 for occlusion models), loss weights bl=50 / translation=10 /
rep2d=rot3d=velocity=likelihood=1 (train_left_right_lifter.py:21-35,42-57;
train_occlusion_models.py:51-53)."""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    learning_rate: float = 2e-4
    weight_decay: float = 1e-5
    lr_gamma: float = 0.95  # per-epoch exponential decay
    # Global-norm gradient clip applied before Adam; 0 disables (the
    # reference default — it never clips). The flow stages' self-sample NLL
    # can explode on a single outlier batch (a drawn sample far off the
    # data manifold produces a ~1e14 loss whose gradient permanently wrecks
    # the flow); `--clip-grad 1.0` bounds that batch's update while leaving
    # well-behaved steps untouched.
    clip_grad_norm: float = 0.0
    # Store Adam moments in bfloat16 at rest (train/optim.py:bf16_moments):
    # halves the optimizer-state HBM traffic that bounds the flagship step
    # (PERF.md ablation) at ~0.4% noise on the per-coordinate step size.
    # Off by default — the reference's f32 Adam is the parity recipe.
    bf16_moments: bool = False


@dataclasses.dataclass(frozen=True)
class FlowTrainConfig:
    """Stages 1-2 (train_full_pose_norm_flow.py:31-36,
    train_leg_torso_left_right_norm_flow.py:37-44)."""

    num_keypoints: int = 34
    batch_size: int = 4 * 64
    n_epochs: int = 100
    noise_factor: float = 0.2
    # Soft cap on the per-sample NLL terms (flows.soft_cap_nll): 0 disables
    # (the reference's raw-MLE recipe). Heavy-tailed 2D corpora (detector
    # keypoints with surviving mis-localizations) need it — the raw
    # self-sample NLL destabilizes the flow at scale (see soft_cap_nll
    # docstring for the measured failure). Healthy NLLs sit near −100, so
    # any cap in the hundreds is inactive on clean data.
    nll_cap: float = 0.0
    optim: OptimConfig = OptimConfig()
    bf16: bool = True


@dataclasses.dataclass(frozen=True)
class PartFlowTrainConfig:
    """Stage 2 (train_leg_torso_left_right_norm_flow.py:37-44)."""

    side_keypoints: int = 22
    leg_keypoints: int = 14
    torso_keypoints: int = 20
    batch_size: int = 256
    n_epochs: int = 100
    noise_factor: float = 0.2
    nll_cap: float = 0.0  # see FlowTrainConfig.nll_cap
    optim: OptimConfig = OptimConfig()
    bf16: bool = True


@dataclasses.dataclass(frozen=True)
class LifterTrainConfig:
    """Stage 3 (train_left_right_lifter.py:42-57; identical for
    train_leg_torso_lifter.py:44-58)."""

    batch_size: int = 256
    n_epochs: int = 100
    depth: float = 10.0  # --translation
    use_elevation: bool = True
    weight_bl: float = 50.0  # --bl
    weight_2d: float = 1.0  # --rep2d
    weight_3d: float = 1.0  # --rot3d
    weight_velocity: float = 1.0  # --velocity
    weight_likeli: float = 1.0  # --likelihood
    noise_factor: float = 0.2
    # Soft cap on the frozen part-flow NLL of rotated views (the `likeli`
    # loss term); 0 disables (reference recipe). Same rationale as
    # FlowTrainConfig.nll_cap: a sharp flow meeting an off-manifold rotated
    # reprojection returns an O(1e5+) NLL whose gradient dwarfs every other
    # loss term and detonates the lifter within one epoch.
    nll_cap: float = 0.0
    optim: OptimConfig = OptimConfig()
    bf16: bool = True


@dataclasses.dataclass(frozen=True)
class OcclusionTrainConfig:
    """Stage 4 (train_occlusion_models.py:51-63)."""

    batch_size: int = 256
    n_epochs: int = 10
    depth: float = 10.0
    # Anti-overfitting knobs (defaults = the reference recipe): number of
    # extra random y-rotations of the pseudo-3D (reference: 2,
    # train_occlusion_models.py:213-296) and Gaussian jitter applied to the
    # completers' input slices only (reference: none). RESULTS.md measures
    # both against the scenario-PA regression they target.
    n_rot: int = 2
    input_noise: float = 0.0
    optim: OptimConfig = OptimConfig()
    bf16: bool = True
