"""Device-resident keypoint datasets.

The reference wraps pickled keypoints in torch Datasets and crosses the
host↔device boundary per 256-row batch (utils/h36m_dataset_class.py:8-114).
The full H36M "interesting frames" set is a few hundred MB at most — it fits
in HBM whole. So a dataset here is just a pair of jnp arrays:

    poses_2d: (N, 34)  normalized, (2,17) flat layout
    poses_3d: (N, 51)  mm, (3,17) flat layout

with normalization applied once, on device, at load time. Batching is a
device-side permutation + reshape inside the epoch scan (train/loop.py) —
zero input-pipeline overhead.

Pickle schema parity with the reference (pre_process_h36m_fetch.py:32):
``{subject: {'poses_3d': (N,17,3), 'poses_2d': (N,17,2),
'poses_3d_univ': (N,17,3)}}``.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Sequence

import jax.numpy as jnp
import numpy as np

from links_tpu.core.geometry import normalize_maxabs

TRAIN_SUBJECTS = ("S1", "S5", "S6", "S7", "S8")
TEST_SUBJECTS = ("S9", "S11")
MPI_SUBJECTS = ("S1", "S2", "S3", "S4", "S5", "S6", "S7", "S8")


@dataclass
class PoseDataset:
    """poses_2d (N,34) normalized + poses_3d (N,51), both device-resident.

    ``use_gt`` mirrors the reference's ``get_2dgt`` switch
    (utils/h36m_dataset_class.py:54-67): when False the 2D keypoints are
    detector predictions and samples carry the ``p2d_pred`` key."""

    poses_2d: jnp.ndarray
    poses_3d: jnp.ndarray
    use_gt: bool = True

    def __len__(self) -> int:
        return int(self.poses_3d.shape[0])

    def __getitem__(self, idx):
        """Dict access mirroring the reference's sample dicts
        (utils/h36m_dataset_class.py:54-67)."""
        key = "p2d_gt" if self.use_gt else "p2d_pred"
        return {key: self.poses_2d[idx], "poses_3d": self.poses_3d[idx]}


import functools
import os


@functools.lru_cache(maxsize=1)
def _read_pickle(path: str, mtime: float):
    with open(path, "rb") as f:
        return pickle.load(f)


def read_pickle_cached(file_name):
    """mtime-keyed single-entry pickle cache: one CLI start reads the
    dataset file once even though train/test loaders (and --test-scale
    auto) each need it."""
    path = str(file_name)
    return _read_pickle(path, os.path.getmtime(path))


def _load_pickle_subjects(file_name, subjects: Sequence[str], pose_3d_key: str,
                          use_gt: bool = True, complete_only: bool = False):
    data = read_pickle_cached(file_name)
    # detector-keypoint path (reference get_2dgt=False): prefer a
    # 'poses_2d_pred' array when the pickle carries one; the reference keeps
    # GT and detector keypoints in separate pickles under the same key, so
    # plain 'poses_2d' remains the fallback either way.
    key_2d = "poses_2d"
    if not use_gt and all("poses_2d_pred" in data[s] for s in subjects):
        key_2d = "poses_2d_pred"
    two_d = np.concatenate([np.asarray(data[s][key_2d]) for s in subjects])
    three_d = np.concatenate([np.asarray(data[s][pose_3d_key]) for s in subjects])
    if complete_only and not use_gt:
        # detector corpora zero undetected keypoints (the reference's
        # missing-keypoint convention, helpers.py:313-340); training the
        # flows/lifters wants only frames with a complete detection — the
        # partial frames are served by the occlusion pipeline at eval time
        # (the paper's whole point, Supplementary PDF §1)
        keep = ~np.all(two_d == 0.0, axis=2).any(axis=1)
        two_d, three_d = two_d[keep], three_d[keep]
    return two_d, three_d


def _build(two_d, three_d, joints: int, normalize_func: Callable | None,
           use_gt: bool = True):
    import jax

    # (N, J, 3) -> (N, 3J) in (3, J) layout (h36m_dataset_class.py:22)
    poses_3d = three_d.transpose(0, 2, 1).reshape(-1, 3 * joints)
    # jit the one-shot normalization: eager per-op dispatch is pathologically
    # slow on remote-tunneled TPU backends
    if normalize_func is not None:
        flat2d = two_d.transpose(0, 2, 1).reshape(-1, 2 * joints)
        poses_2d = jax.jit(normalize_func)(jnp.asarray(flat2d, jnp.float32))
    else:
        poses_2d = jax.jit(normalize_maxabs)(jnp.asarray(two_d, jnp.float32))
    return PoseDataset(
        poses_2d=jnp.asarray(poses_2d, jnp.float32),
        poses_3d=jnp.asarray(poses_3d, jnp.float32),
        use_gt=use_gt,
    )


def load_h36m(file_name, subjects: Sequence[str] = TRAIN_SUBJECTS, joints: int = 17,
              normalize_func: Callable | None = None,
              use_gt: bool = True, complete_only: bool = False) -> PoseDataset:
    """H36M loader (utils/h36m_dataset_class.py:8-48). ``normalize_func`` is
    typically ``normalize_head`` (train) or ``normalize_head_test`` (test)
    per train_left_right_lifter.py:544-547. ``use_gt=False`` selects the
    detector-keypoint path (get_2dgt=False, h36m_dataset_class.py:54-67);
    ``complete_only`` then drops frames with zeroed (undetected) joints."""
    two_d, three_d = _load_pickle_subjects(file_name, subjects, "poses_3d",
                                           use_gt, complete_only)
    return _build(two_d, three_d, joints, normalize_func, use_gt)


def load_mpi_inf_3dhp(file_name, subjects: Sequence[str] = MPI_SUBJECTS,
                      joints: int = 17,
                      normalize_func: Callable | None = None,
                      use_gt: bool = True,
                      complete_only: bool = False) -> PoseDataset:
    """MPI-INF-3DHP loader — uses the universal 3D ground truth
    (utils/h36m_dataset_class.py:69-114, mpi_inf_3dhp_dataset_class.py:8-64)."""
    two_d, three_d = _load_pickle_subjects(file_name, subjects, "poses_3d_univ",
                                           use_gt, complete_only)
    return _build(two_d, three_d, joints, normalize_func, use_gt)


def fit_part_pca(poses_2d):
    """Left/right PCA fit offered by the reference dataset
    (h36m_dataset_class.py:43-48; fit but never consumed by any loss).
    Returns (left_pca, right_pca) sklearn PCA objects, or None if sklearn
    is unavailable."""
    try:
        from sklearn.decomposition import PCA
    except ImportError:  # pragma: no cover
        return None
    from links_tpu.core.skeleton import split_data_left_right

    left, right = split_data_left_right(poses_2d)
    lp, rp = PCA(), PCA()
    lp.fit(np.asarray(left))
    rp.fit(np.asarray(right))
    return lp, rp


def fit_full_pose_pca(poses_2d):
    """Single full-pose PCA (reference H36M_Data_Original_PCA,
    utils/h36m_dataset_class.py:118-174 — fit but unused by entry points).
    Returns a fitted sklearn PCA or None when sklearn is unavailable."""
    try:
        from sklearn.decomposition import PCA
    except ImportError:  # pragma: no cover
        return None
    pca = PCA()
    pca.fit(np.asarray(poses_2d))
    return pca


def save_pickle(path, processed: dict):
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(processed, f)
