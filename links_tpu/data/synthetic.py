"""Synthetic H36M-like pose data for tests, smoke runs, and benchmarks.

Generates kinematically plausible 17-joint skeletons (H36M-ish bone
proportions), poses them with random joint jitter + global rotation, places
them in a camera at ~5m depth and perspective-projects to pixel-scale 2D.
The pickle writer emits the exact reference schema
(pre_process_h36m_fetch.py:32) so the full pipeline can be smoke-tested
end-to-end without the real dataset.
"""

from __future__ import annotations

import numpy as np

from links_tpu.data.datasets import save_pickle

# Canonical rest skeleton, mm, rooted at the pelvis. Columns: (x, y, z);
# y is up-ish in camera coords (H36M convention has y growing downward in
# pixels; only relative geometry matters here).
_REST = np.array([
    [0, 0, 0],        # 0 pelvis
    [-130, 0, 0],     # 1 right hip
    [-140, 450, 0],   # 2 right knee
    [-150, 900, 0],   # 3 right ankle
    [130, 0, 0],      # 4 left hip
    [140, 450, 0],    # 5 left knee
    [150, 900, 0],    # 6 left ankle
    [0, -230, 0],     # 7 spine
    [0, -480, 0],     # 8 thorax
    [0, -590, 0],     # 9 neck/nose
    [0, -700, 0],     # 10 head
    [170, -450, 0],   # 11 left shoulder
    [420, -430, 0],   # 12 left elbow
    [650, -420, 0],   # 13 left wrist
    [-170, -450, 0],  # 14 right shoulder
    [-420, -430, 0],  # 15 right elbow
    [-650, -420, 0],  # 16 right wrist
], dtype=np.float64)

FOCAL = 1150.0
CAMERA_DEPTH = 5200.0


def generate_poses(n: int, seed: int = 0):
    """→ dict {'poses_2d': (n,17,2) px, 'poses_3d': (n,17,3) mm camera-frame,
    'poses_3d_univ': same}. Deterministic in ``seed``."""
    rng = np.random.default_rng(seed)
    base = _REST[None].repeat(n, 0)
    # joint jitter (pose variety) + limb articulation
    base = base + rng.normal(scale=60.0, size=base.shape)
    # random azimuth rotation about the vertical (y) axis
    th = rng.uniform(-np.pi, np.pi, size=n)
    c, s = np.cos(th), np.sin(th)
    ry = np.zeros((n, 3, 3))
    ry[:, 0, 0], ry[:, 0, 2] = c, s
    ry[:, 1, 1] = 1.0
    ry[:, 2, 0], ry[:, 2, 2] = -s, c
    pose = np.einsum("nij,nkj->nki", ry, base)
    # small elevation tilt
    phi = rng.normal(scale=0.12, size=n)
    cp, sp = np.cos(phi), np.sin(phi)
    rx = np.zeros((n, 3, 3))
    rx[:, 0, 0] = 1.0
    rx[:, 1, 1], rx[:, 1, 2] = cp, -sp
    rx[:, 2, 1], rx[:, 2, 2] = sp, cp
    pose = np.einsum("nij,nkj->nki", rx, pose)

    # camera frame: translate in z, keep roots near the optical axis
    cam = pose.copy()
    cam[:, :, 2] += CAMERA_DEPTH + rng.normal(scale=300.0, size=(n, 1))
    cam[:, :, 0] += rng.normal(scale=200.0, size=(n, 1))
    cam[:, :, 1] += rng.normal(scale=150.0, size=(n, 1))

    p2d = FOCAL * cam[:, :, :2] / cam[:, :, 2:3]
    # simulated detector output: GT keypoints + pixel noise (stands in for
    # the reference's OpenPose-detection pickles; consumed by the
    # get_2dgt=False / --no-gt-2d path)
    p2d_pred = p2d + rng.normal(scale=3.0, size=p2d.shape)
    return {
        "poses_2d": p2d.astype(np.float32),
        "poses_2d_pred": p2d_pred.astype(np.float32),
        "poses_3d": cam.astype(np.float32),
        "poses_3d_univ": cam.astype(np.float32),
    }


def write_synthetic_pickle(path, n_per_subject: int = 128, seed: int = 0,
                           subjects=("S1", "S2", "S3", "S4", "S5", "S6", "S7",
                                     "S8", "S9", "S11")):
    """Reference-schema pickle with synthetic data for every subject."""
    processed = {
        s: generate_poses(n_per_subject, seed=seed + i)
        for i, s in enumerate(subjects)
    }
    save_pickle(path, processed)
    return processed
