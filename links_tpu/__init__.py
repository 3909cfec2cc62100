"""links_tpu — a TPU-native JAX/XLA rebuild of LInKs (Lifting Independent
Keypoints, WACV 2024): unsupervised 2D→3D human pose lifting with partial-pose
normalizing flows and occlusion completion.

Reference behavior: Aswarin/LInKs-3D-Human-Pose-Estimation (PyTorch, single
GPU). This package is a from-scratch redesign for TPU: functional pytree
models, jit-fused training steps, `lax.scan` epochs, data-parallel execution
over a `jax.sharding.Mesh`, and on-device batched metrics.

Layout
------
core/        skeleton index maps + geometry (split/combine, projection, bones)
flows/       invertible coupling blocks (FrEIA AllInOneBlock-equivalent)
models/      residual-MLP lifters and occlusion completers
objectives/  flow NLL, lifter self-supervision losses, occlusion MSE
train/       optimizers, fused train steps, epoch scan, DP mesh utilities
metrics/     batched on-device Procrustes / MPJPE / PCK / AUC
data/        H36M / MPI-INF-3DHP preprocessing and device-resident datasets
ckpt/        orbax checkpointing + reference .pt import/export
cli/         the five reference entry points with matching flags
"""

__version__ = "0.1.0"
