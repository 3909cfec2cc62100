"""Flow-sample visualiser (reference data_utils/latent_2d_visualiser.py):
draw generative samples from a trained flow next to real 2D poses."""

from __future__ import annotations

import jax
import numpy as np

from links_tpu import flows
from links_tpu.viz.skeletons import _require_plt, plot_skeleton_2d


def visualise_flow_samples(flow: flows.Flow, poses_2d, key, n: int = 8,
                           noise_factor: float = 0.2, out_path=None):
    """Grid: top row real poses, bottom row perturbed-latent resamples of the
    same poses (the reference's active torso-resampling path generalized to
    any flow dimension; latent_2d_visualiser.py:54-58)."""
    plt = _require_plt()
    # one jitted program (weights as arguments): eager per-op dispatch on a
    # tunneled TPU costs seconds per op (verify skill notes)
    draw = jax.jit(flows.draw_samples,
                   static_argnames=("noise_factor", "zero_root"))
    samples = draw(flow, poses_2d[:n], key, noise_factor=noise_factor,
                   zero_root=flow.dim == 34)
    fig, axes = plt.subplots(2, n, figsize=(2.2 * n, 5))
    for i in range(n):
        _plot_any(axes[0, i], np.asarray(poses_2d[i]), "real" if i == 0 else None)
        _plot_any(axes[1, i], np.asarray(samples[i]), "sampled" if i == 0 else None)
    if out_path:
        fig.savefig(out_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return fig


def _plot_any(ax, flat, title):
    if flat.shape[-1] == 34:
        plot_skeleton_2d(flat, ax=ax, title=title)
    else:  # part pose: scatter the keypoints
        nj = flat.shape[-1] // 2
        p = flat.reshape(2, nj)
        ax.scatter(p[0], p[1], s=10)
        ax.set_aspect("equal")
        ax.invert_yaxis()
        if title:
            ax.set_title(title)
