import numpy as np
import jax.numpy as jnp

from links_tpu import data
from links_tpu.core.geometry import normalize_head, normalize_head_test


def test_synthetic_schema(tmp_path):
    pkl = tmp_path / "synth.pkl"
    processed = data.write_synthetic_pickle(pkl, n_per_subject=16)
    # covers both the H36M (S1,S5-S8 / S9,S11) and MPI (S1-S8) subject sets
    assert {"S1", "S5", "S6", "S7", "S8", "S9", "S11", "S2", "S3", "S4"} <= set(processed)
    for s, d in processed.items():
        assert d["poses_2d"].shape == (16, 17, 2)
        assert d["poses_3d"].shape == (16, 17, 3)
        assert d["poses_3d_univ"].shape == (16, 17, 3)


def test_load_h36m_train_test_split(tmp_path):
    pkl = tmp_path / "synth.pkl"
    data.write_synthetic_pickle(pkl, n_per_subject=16)
    train = data.load_h36m(pkl, subjects=data.TRAIN_SUBJECTS, normalize_func=normalize_head)
    test = data.load_h36m(pkl, subjects=data.TEST_SUBJECTS, normalize_func=normalize_head_test)
    assert len(train) == 16 * 5
    assert len(test) == 16 * 2
    assert train.poses_2d.shape == (80, 34)
    assert train.poses_3d.shape == (80, 51)
    # normalized 2D: root at origin, magnitudes ~0.1
    p = np.asarray(train.poses_2d).reshape(-1, 2, 17)
    np.testing.assert_allclose(p[:, :, 0], 0.0, atol=1e-6)
    assert 0.01 < np.abs(p).max() < 2.0
    # 3D stays in mm, (3,17) layout: depth row ~ metres*1000
    p3 = np.asarray(train.poses_3d).reshape(-1, 3, 17)
    assert p3[:, 2].mean() > 1000


def test_getitem_dict(tmp_path):
    pkl = tmp_path / "synth.pkl"
    data.write_synthetic_pickle(pkl, n_per_subject=8)
    ds = data.load_h36m(pkl, subjects=("S1",), normalize_func=normalize_head)
    sample = ds[3]
    assert set(sample) == {"p2d_gt", "poses_3d"}
    assert sample["p2d_gt"].shape == (34,)


def test_p2d_pred_path(tmp_path):
    """get_2dgt=False parity (utils/h36m_dataset_class.py:54-67): samples
    carry p2d_pred and the 2D input switches to the detector keypoints;
    the synthetic detector's confidence-correlated dropout zeroes some
    keypoints and ``complete_only`` filters those frames out."""
    pkl = tmp_path / "synth.pkl"
    raw = data.write_synthetic_pickle(pkl, n_per_subject=512)
    pred_all = data.load_h36m(pkl, subjects=("S1",),
                              normalize_func=normalize_head, use_gt=False)
    sample = pred_all[2]
    assert set(sample) == {"p2d_pred", "poses_3d"}

    raw2d = np.asarray(raw["S1"]["poses_2d_pred"])
    missing = np.all(raw2d == 0.0, axis=2)
    incomplete = missing.any(axis=1)
    # the detector model drops a meaningful fraction of frames (paper
    # regime: ~45-55% complete), correlated per-joint — wrists/ankles most
    assert 0.2 < incomplete.mean() < 0.7
    assert missing[:, 13].mean() > missing[:, 7].mean()
    # confidence-correlated: dropped detections are exactly the low-conf ones
    conf = np.asarray(raw["S1"]["conf_2d_pred"])
    assert np.all(conf[missing] == 0.0)
    assert np.all(conf[~missing] > 0.0)

    keep = ~incomplete
    pred = data.load_h36m(pkl, subjects=("S1",), normalize_func=normalize_head,
                          use_gt=False, complete_only=True)
    assert len(pred) == int(keep.sum()) < len(pred_all)
    # on complete frames the detector keypoints are noisy GT — close but
    # not equal after normalization
    gt = data.load_h36m(pkl, subjects=("S1",), normalize_func=normalize_head)
    a = np.asarray(gt.poses_2d)[keep]
    b = np.asarray(pred.poses_2d)
    assert not np.allclose(a, b)
    assert np.median(np.abs(a - b)) < 0.01
    # 3D ground truth rows follow the same filter
    np.testing.assert_allclose(np.asarray(gt.poses_3d)[keep],
                               np.asarray(pred.poses_3d))


def test_maxabs_fallback(tmp_path):
    pkl = tmp_path / "synth.pkl"
    data.write_synthetic_pickle(pkl, n_per_subject=8)
    ds = data.load_h36m(pkl, subjects=("S1",), normalize_func=None)
    p = np.asarray(ds.poses_2d)
    assert np.abs(p).max() <= 1.0 + 1e-5


def test_synthetic_poses_project_consistently():
    d = data.generate_poses(32, seed=1)
    p2d = d["poses_2d"]
    p3d = d["poses_3d"]
    want = 1150.0 * p3d[:, :, :2] / p3d[:, :, 2:3]
    np.testing.assert_allclose(p2d, want, rtol=1e-4)


def test_preprocess_h36m_fetch_layout(tmp_path):
    """End-to-end preprocessing: a tiny h36m-fetch tree
    (processed/<subject>/<action>/annot.h5 with 32-joint pose buffers) →
    reference-schema pickle with the 17-joint subset in canonical order
    (pre_process_h36m_fetch.py:17-35)."""
    h5py = __import__("h5py")
    from links_tpu.data.preprocess import H36M_17_JOINTS, preprocess_h36m_fetch

    rng = np.random.default_rng(0)
    n_frames = {"Walking": 5, "Eating": 3}
    raw = {}
    for subject in ("S1", "S9"):
        for action, n in n_frames.items():
            d = tmp_path / "processed" / subject / action
            d.mkdir(parents=True)
            p2 = rng.normal(size=(n, 32, 2)).astype(np.float64)
            p3 = rng.normal(size=(n, 32, 3)).astype(np.float64)
            p3u = p3 * 1.01
            raw[(subject, action)] = (p2, p3, p3u)
            with h5py.File(d / "annot.h5", "w") as f:
                g = f.create_group("pose")
                g["2d"], g["3d"], g["3d-univ"] = p2, p3, p3u

    out = tmp_path / "h36m_data.pkl"
    processed = preprocess_h36m_fetch(str(tmp_path / "processed"), str(out))
    assert set(processed) == {"S1", "S9"}
    assert processed["S1"]["poses_2d"].shape == (8, 17, 2)
    assert processed["S1"]["poses_3d_univ"].shape == (8, 17, 3)
    # actions concatenate in sorted order (Eating before Walking); joints
    # are the canonical 17-subset of the 32-slot buffer
    want = np.concatenate([raw[("S1", "Eating")][0], raw[("S1", "Walking")][0]])
    np.testing.assert_allclose(processed["S1"]["poses_2d"],
                               want[:, H36M_17_JOINTS, :])
    # and the pickle loads through the standard loader
    ds = data.load_h36m(out, subjects=("S1",), normalize_func=None)
    assert len(ds) == 8


def test_fit_part_pca(tmp_path):
    pkl = tmp_path / "synth.pkl"
    data.write_synthetic_pickle(pkl, n_per_subject=32)
    ds = data.load_h36m(pkl, subjects=("S1",), normalize_func=normalize_head)
    pcas = data.fit_part_pca(ds.poses_2d)
    if pcas is not None:
        left, right = pcas
        assert left.components_.shape[1] == 22


def test_mpi_split_is_held_out(tmp_path):
    """--dataset mpi trains on S1-S6 and evaluates on S7/S8 — disjoint
    subjects (the reference's own MPI dataset-class default subject list,
    mpi_inf_3dhp_dataset_class.py:9). Regression for the round-2 review
    finding where MPI eval subjects were inside the training set."""
    from types import SimpleNamespace

    from links_tpu.cli import _common as C

    pkl = tmp_path / "synth.pkl"
    data.write_synthetic_pickle(pkl, n_per_subject=8)
    args = SimpleNamespace(data=str(pkl), dataset="mpi", synthetic=False,
                           test_norm=None, train_subjects=None,
                           test_subjects=None, test_scale=None, gt_2d=True)
    _, _, train_s, test_s, _, _ = C._split_spec(args)
    assert not set(train_s) & set(test_s)
    assert tuple(test_s) == ("S7", "S8")
    assert tuple(train_s) == ("S1", "S2", "S3", "S4", "S5", "S6")


def test_load_test_matches_train_test_second(tmp_path):
    """load_test returns exactly the test split of load_train_test without
    materializing the train split (serving/eval startup path)."""
    from types import SimpleNamespace

    from links_tpu.cli import _common as C

    pkl = tmp_path / "synth.pkl"
    data.write_synthetic_pickle(pkl, n_per_subject=8)
    args = SimpleNamespace(data=str(pkl), dataset="h36m", synthetic=False,
                           test_norm=None, train_subjects=None,
                           test_subjects=None, test_scale=None, gt_2d=True)
    _, test_a = C.load_train_test(args)
    test_b = C.load_test(args)
    np.testing.assert_array_equal(np.asarray(test_a.poses_2d),
                                  np.asarray(test_b.poses_2d))
    np.testing.assert_array_equal(np.asarray(test_a.poses_3d),
                                  np.asarray(test_b.poses_3d))

def test_preprocess_cli(tmp_path, capsys):
    """links-preprocess CLI wrapper (README real-data recipe): same walk as
    preprocess_h36m_fetch, flag-driven."""
    h5py = __import__("h5py")
    from links_tpu.cli.preprocess import main

    rng = np.random.default_rng(1)
    d = tmp_path / "processed" / "S5" / "Posing"
    d.mkdir(parents=True)
    with h5py.File(d / "annot.h5", "w") as f:
        g = f.create_group("pose")
        g["2d"] = rng.normal(size=(4, 32, 2))
        g["3d"] = rng.normal(size=(4, 32, 3))
        g["3d-univ"] = rng.normal(size=(4, 32, 3))

    out = tmp_path / "out.pkl"
    res = main(["--h36m-dir", str(tmp_path / "processed"),
                "--out", str(out)])
    assert out.exists() and res["S5"]["poses_2d"].shape == (4, 17, 2)
    assert "S5: 4 frames" in capsys.readouterr().out
