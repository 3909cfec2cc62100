import jax.numpy as jnp
import numpy as np

from links_tpu import metrics


def _np_procrustes_best(X, Y):
    """f64 numpy MATLAB-procrustes (reflection='best'), independent check."""
    muX, muY = X.mean(0), Y.mean(0)
    X0, Y0 = X - muX, Y - muY
    normX = np.sqrt((X0**2).sum())
    normY = np.sqrt((Y0**2).sum())
    X0, Y0 = X0 / normX, Y0 / normY
    U, s, Vt = np.linalg.svd(X0.T @ Y0, full_matrices=False)
    T = Vt.T @ U.T
    return normX * s.sum() * (Y0 @ T) + muX


def _poses(rng, b=32, scale=1000.0):
    gt = rng.normal(size=(b, 3, 17)) * scale
    # predictions: rotated+scaled+noised copies of gt
    pred = gt * 1.1 + rng.normal(size=(b, 3, 17)) * scale * 0.05
    return gt.astype(np.float32), pred.astype(np.float32)


def test_pa_mpjpe_matches_numpy_loop(rng):
    gt, pred = _poses(rng)
    got = np.asarray(metrics.pa_mpjpe(jnp.asarray(gt.reshape(-1, 51)), jnp.asarray(pred.reshape(-1, 51))))
    want = []
    for i in range(gt.shape[0]):
        X = gt[i].astype(np.float64).T  # (17, 3)
        Y = pred[i].astype(np.float64).T
        Z = _np_procrustes_best(X, Y)
        want.append(np.linalg.norm(Z - X, axis=1).mean())
    np.testing.assert_allclose(got, np.array(want), rtol=2e-4, atol=0.05)


def test_pa_mpjpe_invariant_to_similarity_transform(rng):
    gt, _ = _poses(rng, b=8)
    # pred = rotated, scaled, translated copy of gt => PA-MPJPE ~ 0
    th = 0.7
    R = np.array(
        [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    )
    pred = (R @ gt * 2.5) + np.array([100.0, -50.0, 30.0]).reshape(1, 3, 1)
    err = np.asarray(
        metrics.pa_mpjpe(jnp.asarray(gt.reshape(-1, 51)), jnp.asarray(pred.reshape(-1, 51).astype(np.float32)))
    )
    assert err.max() < 0.5  # mm, vs poses of ~1000mm extent


def test_pa_mpjpe_uses_reflection_when_better(rng):
    gt, _ = _poses(rng, b=4)
    pred = gt.copy()
    pred[:, 0] *= -1  # mirror
    err = np.asarray(
        metrics.pa_mpjpe(jnp.asarray(gt.reshape(-1, 51)), jnp.asarray(pred.reshape(-1, 51)))
    )
    assert err.max() < 0.5  # reflection='best' recovers the mirror exactly


def test_n_mpjpe_matches_manual(rng):
    gt, pred = _poses(rng)
    got = np.asarray(metrics.n_mpjpe(jnp.asarray(gt), jnp.asarray(pred)))
    g = gt - gt[:, :, 0:1]
    p = pred - pred[:, :, 0:1]
    s = np.linalg.norm(g.reshape(-1, 51), axis=1) / np.linalg.norm(p.reshape(-1, 51), axis=1)
    p = p * s[:, None, None]
    want = np.linalg.norm(p - g, axis=1).mean(axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_pck_auc_bounds(rng):
    gt, pred = _poses(rng)
    p_ref, p = jnp.asarray(gt), jnp.asarray(pred)
    pck = float(metrics.pck(p_ref, p))
    auc = float(metrics.auc(p_ref, p))
    assert 0.0 <= pck <= 100.0
    assert 0.0 <= auc <= 1.0
    # identical poses: perfect scores
    assert float(metrics.pck(p_ref, p_ref)) == 100.0
    a = float(metrics.auc(p_ref, p_ref))
    assert a > 0.99  # threshold 0 excluded contributes ~1/150


def test_get_all_keys(rng):
    gt, pred = _poses(rng)
    out = metrics.get_all(jnp.asarray(gt), jnp.asarray(pred))
    assert set(out) == {"MPJPE", "PCK", "AUC", "CPS", "CPS_correct"}


def test_cps_correct_is_alignment_invariant(rng):
    """The reference's CPS (flagged `TODO: Not correct`,
    utils/metrics_batch.py:92) scores a globally rotated perfect prediction
    near zero; CPS_correct Procrustes-aligns first and scores it perfect
    (301 = the full 0..300mm threshold sweep)."""
    gt, _ = _poses(rng, b=16)
    th = 2.0
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    pred = np.einsum("ij,bjk->bik", R, gt) * 1.3
    out = metrics.get_all(jnp.asarray(gt), jnp.asarray(pred.astype(np.float32)))
    assert float(out["CPS"]) < 10.0
    # 300, not 301: the d=0 bucket fails on the f32 alignment residual
    # (the reference's own sweep behaves identically at zero threshold)
    assert float(out["CPS_correct"]) >= 299.5
    # on identical poses both agree at the perfect score (the aligned
    # variant keeps an f32 SVD residual, so its d=0 bucket may still fail)
    same = metrics.get_all(jnp.asarray(gt), jnp.asarray(gt))
    np.testing.assert_allclose(float(same["CPS"]), 301.0, atol=0.5)
    assert float(same["CPS_correct"]) >= 299.5


def test_procrustes_batch_no_reflection(rng):
    gt, _ = _poses(rng, b=4)
    pred = gt.copy()
    pred[:, 0] *= -1  # mirrored prediction
    err_norefl = np.asarray(
        metrics.pmpjpe_batch(jnp.asarray(gt.reshape(-1, 51)), jnp.asarray(pred.reshape(-1, 51)))
    )
    err_refl = np.asarray(
        metrics.pmpjpe_batch(
            jnp.asarray(gt.reshape(-1, 51)), jnp.asarray(pred.reshape(-1, 51)), use_reflection=True
        )
    )
    # without reflection the mirror cannot be aligned away
    assert err_norefl.min() > 10.0
    assert err_refl.max() < 1.0


def test_mpjpe_single(rng):
    gt, pred = _poses(rng, b=1)
    got = float(metrics.mpjpe_single(jnp.asarray(gt[0]), jnp.asarray(pred[0])))
    want = np.linalg.norm(pred[0] - gt[0], axis=0).mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_procrustes_align_consistent_with_pa_mpjpe(rng):
    """procrustes_align returns the aligned poses whose residual equals
    pa_mpjpe (it exposes pa_mpjpe's internal alignment for rendering)."""
    gt, pred = _poses(rng, b=16)
    gt_flat = jnp.asarray(gt.reshape(-1, 51))
    pred_flat = jnp.asarray(pred.reshape(-1, 51))
    aligned = metrics.procrustes_align(gt_flat, pred_flat)
    assert aligned.shape == (16, 3, 17)
    resid = jnp.linalg.norm(aligned - gt, axis=1).mean(axis=1)
    expect = metrics.pa_mpjpe(gt_flat, pred_flat)
    np.testing.assert_allclose(np.asarray(resid), np.asarray(expect),
                               rtol=1e-4, atol=0.05)


def test_chunked_svd_matches_unchunked(rng, monkeypatch):
    """VMEM-bounded Procrustes: the lax.map chunking (incl. the padded tail
    chunk) must match the direct vmapped path — the 65k-pose
    MPI validation sweep exceeded the 16MB scoped-VMEM cap without it."""
    gt, pred = _poses(rng, b=23)
    gt_f, pred_f = jnp.asarray(gt.reshape(-1, 51)), jnp.asarray(pred.reshape(-1, 51))
    direct_pa = np.asarray(metrics.pa_mpjpe(gt_f, pred_f))
    direct_pm = np.asarray(metrics.pmpjpe_batch(gt_f, pred_f))

    monkeypatch.setattr(metrics, "_SVD_CHUNK", 7)  # 23 → 3 chunks + pad 5
    # not bit-identical: lax.map compiles the chunk body separately, so f32
    # fusion order differs from the direct vmap (rel diff ~1e-6)
    np.testing.assert_allclose(np.asarray(metrics.pa_mpjpe(gt_f, pred_f)),
                               direct_pa, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(metrics.pmpjpe_batch(gt_f, pred_f)),
                               direct_pm, rtol=1e-5)


def test_depth_tilt_score_detects_depth_flip():
    """Unsupervised flip alarm (VERDICT r3 next #3): on the synthetic
    corpus — rendered with the same downward camera tilt the unsupervised
    objective relies on (data/synthetic.py:98-110) — the score is clearly
    negative on correct-mode poses and flips sign exactly under a depth
    flip (root-relative z negation), the failure mode NLL selection cannot
    see (RESULTS.md selection table)."""
    from links_tpu.data.synthetic import generate_poses

    p = generate_poses(512, seed=3)["poses_3d"]  # (n,17,3) camera frame
    flat = jnp.asarray(p.transpose(0, 2, 1).reshape(-1, 51))
    tilt = float(metrics.depth_tilt_score(flat))
    assert tilt < -10.0, tilt

    flipped = p.copy()
    flipped[:, :, 2] = 2 * p[:, 0:1, 2] - p[:, :, 2]
    tilt_f = float(metrics.depth_tilt_score(
        jnp.asarray(flipped.transpose(0, 2, 1).reshape(-1, 51))))
    np.testing.assert_allclose(tilt_f, -tilt, rtol=1e-5)
