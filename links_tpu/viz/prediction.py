"""Prediction visualiser (reference visualisation/h36m_prediction_visualiser.py):
lift a chosen test frame with the trained lifters, optionally infill an
occluded part with a completer, Procrustes-align to the ground truth and
render the comparison."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from links_tpu import metrics
from links_tpu.objectives import lift_left_right_eval
from links_tpu.objectives.occlusion import occlusion_validation_poses
from links_tpu.viz.skeletons import compare_poses_3d


def _align_to_gt(gt_51, pred_51):
    """Procrustes-align (reflection='best') a single prediction to GT for
    display (h36m_prediction_visualiser.py aligns before rendering)."""
    from links_tpu.metrics import _procrustes_align_best

    @jax.jit
    def _align(gt, pred):
        X = gt.reshape(3, 17).T
        Y = pred.reshape(3, 17).T
        return _procrustes_align_best(X, Y).T.reshape(51)

    return np.asarray(_align(jnp.asarray(gt_51), jnp.asarray(pred_51)))


def visualise_prediction(stacked_lr_params, test_2d, test_3d, frame: int,
                         depth: float = 10.0, out_path=None):
    """Lift one frame with the left/right lifters and render GT vs aligned
    prediction. Returns (figure, pa_mpjpe_of_frame)."""
    # jit is essential here: the eager per-op path is pathologically slow on
    # remote-tunneled TPU backends (one round trip per primitive)
    pred = jax.jit(lift_left_right_eval, static_argnums=(2, 3))(
        stacked_lr_params, test_2d[frame : frame + 1], depth, "right"
    )
    gt = np.asarray(test_3d[frame])
    aligned = _align_to_gt(gt, pred[0])
    err = float(jax.jit(metrics.pa_mpjpe)(test_3d[frame : frame + 1], pred)[0])
    fig = compare_poses_3d(
        [gt, aligned],
        titles=["ground truth", f"prediction (PA-MPJPE {err:.1f}mm)"],
        out_path=out_path,
    )
    return fig, err


def visualise_occlusion(completers, lifters, test_2d, test_3d, frame: int,
                        scenario: str = "left", depth: float = 10.0,
                        out_path=None):
    """Render GT vs the completed pose for one occlusion scenario
    (la/ra/ll/rl/torso/legs/left/right)."""
    poses = jax.jit(occlusion_validation_poses, static_argnums=(3,))(
        completers, lifters, test_2d[frame : frame + 1], depth
    )
    pred = poses[scenario]
    gt = np.asarray(test_3d[frame])
    aligned = _align_to_gt(gt, pred[0])
    err = float(jax.jit(metrics.pa_mpjpe)(test_3d[frame : frame + 1], pred)[0])
    fig = compare_poses_3d(
        [gt, aligned],
        titles=["ground truth",
                f"occluded '{scenario}' completed (PA {err:.1f}mm)"],
        out_path=out_path,
    )
    return fig, err
