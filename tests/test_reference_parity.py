"""Differential parity tests against the ACTUAL reference code at
/root/reference (loaded via tests/_reference_shim.py, executed on CPU torch).

These are the ground-truth tests VERDICT.md round 1 asked for: every L0
split/combine/bone/normalize function, both metrics classes, every model
forward, and the full stage-3a/3b/4 training-step losses are asserted
elementwise against the reference's own code running on identical inputs
and identical weights (exported through links_tpu.ckpt.torch_io).
"""

from __future__ import annotations

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from links_tpu import ckpt, flows, metrics, models
from links_tpu.core import geometry, skeleton

from tests._reference_shim import load_reference, load_trainer_module


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def _t(x):
    return torch.tensor(np.asarray(x))


def _n(x):
    return np.asarray(x)


def close(a, b, atol=1e-6, rtol=1e-5):
    np.testing.assert_allclose(_n(a), _n(b), atol=atol, rtol=rtol)


@pytest.fixture
def poses2d(rng):
    x = rng.normal(size=(8, 34)).astype(np.float32) * 0.1
    x.reshape(8, 2, 17)[:, :, 0] = 0.0
    return x


@pytest.fixture
def poses3d(rng):
    return rng.normal(size=(8, 51)).astype(np.float32)


# ------------------------------------------------------------------ L0 splits


class TestSplitsCombines:
    def test_split_left_right(self, ref, poses2d):
        tl, tr = ref.helpers.split_data_left_right(_t(poses2d))
        jl, jr = skeleton.split_data_left_right(jnp.asarray(poses2d))
        close(jl, tl), close(jr, tr)

    def test_split_left_right_v2(self, ref, poses2d):
        tl, tr = ref.helpers.split_data_left_right_v2(_t(poses2d))
        jl, jr = skeleton.split_data_left_right_v2(jnp.asarray(poses2d))
        close(jl, tl), close(jr, tr)

    def test_split_left_right_3d(self, ref, poses3d):
        tl, tr = ref.helpers.split_data_left_right_3d(_t(poses3d))
        jl, jr = skeleton.split_data_left_right_3d(jnp.asarray(poses3d))
        close(jl, tl), close(jr, tr)

    def test_split_left_right_numpy(self, ref, poses2d):
        tl, tr = ref.helpers.split_data_left_right_numpy(poses2d.copy())
        jl, jr = skeleton.split_data_left_right(jnp.asarray(poses2d))
        close(jl, tl), close(jr, tr)

    def test_temporal_split(self, ref, rng):
        x = rng.normal(size=(6, 68)).astype(np.float32)
        tl, tr = ref.helpers.temporal_split_data_left_right(_t(x))
        jl, jr = skeleton.temporal_split_data_left_right(jnp.asarray(x))
        close(jl, tl), close(jr, tr)

    @pytest.mark.parametrize("choice", ["left", "right"])
    def test_combine_1d(self, ref, rng, choice):
        l = rng.normal(size=(8, 11)).astype(np.float32)
        r = rng.normal(size=(8, 11)).astype(np.float32)
        t = ref.helpers.combine_left_right_pred_1d(_t(l), _t(r), choice=choice)
        j = skeleton.combine_left_right_pred_1d(
            jnp.asarray(l), jnp.asarray(r), choice
        )
        close(j.reshape(t.shape), t)

    @pytest.mark.parametrize("choice", ["left", "right"])
    def test_combine_2d(self, ref, rng, choice):
        l = rng.normal(size=(8, 22)).astype(np.float32)
        r = rng.normal(size=(8, 22)).astype(np.float32)
        t = ref.helpers.combine_left_right_pred_2d(_t(l), _t(r), choice=choice)
        j = skeleton.combine_left_right_pred_2d(jnp.asarray(l), jnp.asarray(r), choice)
        close(j.reshape(t.shape), t)

    @pytest.mark.parametrize("choice", ["left", "right"])
    def test_combine_3d(self, ref, rng, choice):
        l = rng.normal(size=(8, 33)).astype(np.float32)
        r = rng.normal(size=(8, 33)).astype(np.float32)
        t = ref.helpers.combine_left_right_pred_3d(_t(l), _t(r), choice=choice)
        j = skeleton.combine_left_right_pred_3d(jnp.asarray(l), jnp.asarray(r), choice)
        close(j.reshape(t.shape), t)

    @pytest.mark.parametrize("side", ["left", "right"])
    def test_combine_occluded_3d(self, ref, rng, side):
        occ = rng.normal(size=(8, 3, 6)).astype(np.float32)
        vis = rng.normal(size=(8, 3, 11)).astype(np.float32)
        t = ref.helpers.combine_left_right_occluded_3d(
            _t(occ), _t(vis), part_occluded=side
        )
        j = skeleton.combine_left_right_occluded_3d(
            jnp.asarray(occ), jnp.asarray(vis), side
        )
        close(j.reshape(t.shape), t)


class TestBones:
    def test_bone_lengths_all(self, ref, poses3d):
        close(
            skeleton.get_bone_lengths_all(jnp.asarray(poses3d)),
            ref.helpers.get_bone_lengths_all(_t(poses3d)),
            atol=1e-5,
        )

    def test_bone_lengths_legs(self, ref, rng):
        x = rng.normal(size=(8, 21)).astype(np.float32)
        close(
            skeleton.get_bone_lengths_legs(jnp.asarray(x)),
            ref.helpers.get_bone_lengths_legs(_t(x)),
            atol=1e-5,
        )

    def test_bone_lengths_torso(self, ref, rng):
        x = rng.normal(size=(8, 30)).astype(np.float32)
        close(
            skeleton.get_bone_lengths_torso(jnp.asarray(x)),
            ref.helpers.get_bone_lengths_torso(_t(x)),
            atol=1e-5,
        )

    def test_bone_lengths_left_right(self, ref, rng):
        x = rng.normal(size=(8, 33)).astype(np.float32)
        close(
            skeleton.get_bone_lengths_left_right(jnp.asarray(x)),
            ref.helpers.get_bone_lengths_left_right(_t(x)),
            atol=1e-5,
        )



class TestNormalizeProject:
    def test_normalize_head(self, ref, rng):
        x = (rng.normal(size=(16, 34)) * 50 + 5).astype(np.float32)
        # the reference mutates its input in place (aliasing through reshape)
        t = ref.helpers.normalize_head(_t(x.copy()))
        j = geometry.normalize_head(jnp.asarray(x))
        close(j, t, atol=1e-6)

    @pytest.mark.parametrize(
        "ref_name,jax_fn",
        [
            ("normalize_head_test", geometry.normalize_head_test),
            ("normalize_head_test_mpi_chest", geometry.normalize_head_test_mpi_chest),
            ("normalize_head_test_mpi_vnect", geometry.normalize_head_test_mpi_vnect),
            ("normalize_head_test_temporal", geometry.normalize_head_test_temporal),
        ],
    )
    def test_normalize_head_test_variants(self, ref, rng, ref_name, jax_fn):
        x = (rng.normal(size=(16, 34)) * 50 + 5).astype(np.float32)
        t = getattr(ref.helpers, ref_name)(_t(x.copy()))
        close(jax_fn(jnp.asarray(x)), t, atol=1e-6)

    def test_perspective_projection(self, ref, rng):
        x = rng.normal(size=(8, 51)).astype(np.float32)
        x[:, 34:] += 10.0  # positive depth
        close(
            geometry.perspective_projection(jnp.asarray(x)),
            ref.helpers.perspective_projection(_t(x)),
            atol=1e-6,
        )

    @pytest.mark.parametrize(
        "ref_name,jax_fn,dim",
        [
            ("perspective_projection_legs", geometry.perspective_projection_legs, 21),
            ("perspective_projection_torso", geometry.perspective_projection_torso, 30),
            ("perspective_projection_left_right",
             geometry.perspective_projection_left_right, 33),
        ],
    )
    def test_perspective_projection_parts(self, ref, rng, ref_name, jax_fn, dim):
        x = rng.normal(size=(8, dim)).astype(np.float32)
        nj = dim // 3
        x[:, 2 * nj:] += 10.0
        close(jax_fn(jnp.asarray(x)), getattr(ref.helpers, ref_name)(_t(x)), atol=1e-6)

    def test_interpolate_gaussian_batch(self, ref, rng):
        z = rng.normal(size=(8, 34)).astype(np.float32)
        close(
            geometry.interpolate_gaussian_batch(jnp.asarray(z), 0.3),
            ref.helpers.interpolate_gaussian_batch(_t(z), 0.3),
            atol=1e-6,
        )

    def test_add_noise_same_noise(self, ref, rng, monkeypatch):
        """geometry.add_noise computes z + f·(ε⊙z); inject the same ε into the
        reference's torch.randn_like draw and compare."""
        z = rng.normal(size=(8, 34)).astype(np.float32)
        eps = rng.normal(size=(8, 34)).astype(np.float32)
        monkeypatch.setattr(torch, "randn_like", lambda t, **k: _t(eps))
        want = ref.helpers.add_noise(_t(z), noise_factor=0.2)

        class _FixedNormal:
            def __call__(self, key, shape, dtype=None):
                return jnp.asarray(eps)

        monkeypatch.setattr(geometry.jax.random, "normal", _FixedNormal())
        got = geometry.add_noise(jax.random.PRNGKey(0), jnp.asarray(z), 0.2)
        close(got, want, atol=1e-6)


class TestRotationConversions:
    @pytest.mark.parametrize("convention", ["XYZ", "ZYX", "YXZ"])
    def test_euler_angles_to_matrix(self, ref, rng, convention):
        ang = rng.normal(size=(16, 3)).astype(np.float32)
        t = ref.rotation_conversions.euler_angles_to_matrix(_t(ang), convention)
        j = geometry.euler_angles_to_matrix(jnp.asarray(ang), convention)
        close(j, t, atol=1e-6)

    def test_axis_rotations(self, ref, rng):
        a = rng.normal(size=(8, 1)).astype(np.float32)
        zeros = torch.zeros(8, 1)
        rx = ref.rotation_conversions.euler_angles_to_matrix(
            torch.cat([_t(a), zeros, zeros], dim=1), "XYZ"
        )
        ry = ref.rotation_conversions.euler_angles_to_matrix(
            torch.cat([zeros, _t(a), zeros], dim=1), "XYZ"
        )
        close(geometry.rotation_about_x(jnp.asarray(a)), rx, atol=1e-6)
        close(geometry.rotation_about_y(jnp.asarray(a)), ry, atol=1e-6)


# ------------------------------------------------------------------- metrics


class TestMetricsPerSample:
    def test_pa_mpjpe_reflection_best(self, ref, rng):
        gt = rng.normal(size=(6, 51)).astype(np.float64)
        pred = (gt + 0.1 * rng.normal(size=(6, 51))).astype(np.float64)
        m = ref.metrics.Metrics()
        want = np.array(
            [m.pmpjpe(gt[i].reshape(-1, 51), pred[i].reshape(-1, 51),
                      reflection="best") for i in range(6)]
        )
        got = metrics.pa_mpjpe(jnp.asarray(gt), jnp.asarray(pred))
        close(got, want, atol=1e-5)

    def test_pa_mpjpe_with_reflection_improvement(self, ref, rng):
        # mirrored pose: reflection='best' must use it
        gt = rng.normal(size=(1, 3, 17))
        pred = gt.copy()
        pred[:, 0] *= -1.0
        m = ref.metrics.Metrics()
        want = m.pmpjpe(gt.reshape(1, 51), pred.reshape(1, 51), reflection="best")
        got = metrics.pa_mpjpe(jnp.asarray(gt.reshape(1, 51)),
                               jnp.asarray(pred.reshape(1, 51)))[0]
        close(got, want, atol=1e-6)

    def test_mpjpe_single(self, ref, rng):
        gt = rng.normal(size=(3, 17))
        pred = rng.normal(size=(3, 17))
        m = ref.metrics.Metrics()
        for scale in (False, True):
            for mean_align in (False, True):
                close(
                    metrics.mpjpe_single(jnp.asarray(gt), jnp.asarray(pred),
                                         scale=scale, mean_align=mean_align),
                    m.mpjpe(gt.copy(), pred.copy(), scale=scale,
                            mean_align=mean_align),
                    atol=1e-6,
                )


class TestMetricsBatch:
    @pytest.fixture
    def pair(self, rng):
        gt = (rng.normal(size=(16, 51)) * 100).astype(np.float32)
        pred = (gt + 20 * rng.normal(size=(16, 51))).astype(np.float32)
        return gt, pred

    @pytest.mark.parametrize("use_scaling", [True, False])
    def test_n_mpjpe(self, ref, pair, use_scaling):
        gt, pred = pair
        mb = ref.metrics_batch.Metrics()
        want = mb.mpjpe(_t(gt), _t(pred), use_scaling=use_scaling,
                        num_joints=17, root_joint=0)
        close(metrics.n_mpjpe(jnp.asarray(gt), jnp.asarray(pred),
                              use_scaling=use_scaling), want, atol=1e-3)

    def test_pck(self, ref, pair):
        gt, pred = pair
        mb = ref.metrics_batch.Metrics()
        want = mb.PCK(_t(gt), _t(pred), num_joints=17, root_joint=0)
        close(metrics.pck(jnp.asarray(gt), jnp.asarray(pred)), want, atol=1e-3)

    def test_auc(self, ref, pair):
        gt, pred = pair
        mb = ref.metrics_batch.Metrics()
        want = mb.AUC(_t(gt), _t(pred), num_joints=17, root_joint=0)
        close(metrics.auc(jnp.asarray(gt), jnp.asarray(pred)), want, atol=1e-4)

    def test_get_all(self, ref, pair):
        gt, pred = pair
        mb = ref.metrics_batch.Metrics()
        want = mb.get_all(_t(gt), _t(pred), num_joints=17, root_joint=0)
        got = metrics.get_all(jnp.asarray(gt), jnp.asarray(pred))
        for k in ("MPJPE", "PCK", "AUC", "CPS"):
            close(got[k], float(want[k]), atol=1e-2, rtol=1e-4)

    def test_pmpjpe_batch(self, ref, pair):
        gt, pred = pair
        mb = ref.metrics_batch.Metrics()
        want = mb.pmpjpe(_t(gt), _t(pred), use_reflection=False,
                         num_joints=17)
        got = metrics.pmpjpe_batch(jnp.asarray(gt), jnp.asarray(pred),
                                   use_reflection=False)
        close(got.mean(), float(want.mean() if hasattr(want, "mean") else want),
              atol=1e-3)

    def test_pmpjpe_reflection_flag_is_a_deliberate_fix(self, ref, pair):
        """The reference's pmpjpe accepts use_reflection but drops it
        (metrics_batch.py:109 calls self.procrustes without forwarding);
        links_tpu honors the flag. Exercise the divergence on a mirrored
        prediction: the reference returns the same (large) error for both
        flag values, while ours with use_reflection=True aligns through the
        mirror and returns ~0."""
        gt, _ = pair
        mirrored = gt.reshape(-1, 3, 17).copy()
        mirrored[:, 0, :] *= -1.0  # reflect x
        mirrored = mirrored.reshape(gt.shape)
        mb = ref.metrics_batch.Metrics()
        ref_true = mb.pmpjpe(_t(gt), _t(mirrored), use_reflection=True,
                             num_joints=17)
        ref_false = mb.pmpjpe(_t(gt), _t(mirrored), use_reflection=False,
                              num_joints=17)
        close(float(ref_true.mean()), float(ref_false.mean()), rtol=1e-6)

        ours_false = metrics.pmpjpe_batch(jnp.asarray(gt), jnp.asarray(mirrored),
                                          use_reflection=False)
        close(ours_false.mean(), float(ref_false.mean()), atol=1e-3)
        ours_true = metrics.pmpjpe_batch(jnp.asarray(gt), jnp.asarray(mirrored),
                                         use_reflection=True)
        assert float(ours_true.mean()) < 0.01 * float(ours_false.mean())


# ---------------------------------------------------------------- L1 datasets


class TestDatasetClassParity:
    """Run the reference dataset classes (H36M_Data, MPI_INF_3DHP_Dataset —
    loaded through the shim's broken-import-root aliases) on the same
    synthetic pickle as links_tpu's loaders and compare the materialized
    arrays and sample dicts."""

    @pytest.fixture(scope="class")
    def pickle_path(self, tmp_path_factory):
        from links_tpu.data import write_synthetic_pickle

        p = tmp_path_factory.mktemp("ds") / "synth.pkl"
        write_synthetic_pickle(p, n_per_subject=16)
        return p

    def test_h36m_normalize_head(self, ref, pickle_path):
        from links_tpu.core.geometry import normalize_head
        from links_tpu.data import load_h36m

        subj = ["S1", "S5"]
        want = ref.h36m_dataset_class.H36M_Data(
            str(pickle_path), train=True, get_2dgt=True,
            normalize_func=ref.helpers.normalize_head, subjects=subj)
        got = load_h36m(pickle_path, tuple(subj), normalize_func=normalize_head)
        close(got.poses_2d, np.asarray(want.data["poses_2d"]), atol=1e-5)
        close(got.poses_3d, np.asarray(want.data["poses_3d"]), atol=1e-4)
        assert len(got) == len(want)
        ws = want[3]
        gs = got[3]
        assert set(gs) == set(ws) == {"p2d_gt", "poses_3d"}
        close(gs["p2d_gt"], np.asarray(ws["p2d_gt"]), atol=1e-5)

    def test_h36m_maxabs_fallback(self, ref, pickle_path):
        from links_tpu.data import load_h36m

        want = ref.h36m_dataset_class.H36M_Data(
            str(pickle_path), get_2dgt=True, subjects=["S9"])
        got = load_h36m(pickle_path, ("S9",), normalize_func=None)
        close(got.poses_2d, np.asarray(want.data["poses_2d"]), atol=1e-5)

    def test_h36m_p2d_pred_key(self, ref, pickle_path):
        from links_tpu.data import load_h36m

        want = ref.h36m_dataset_class.H36M_Data(
            str(pickle_path), get_2dgt=False, subjects=["S1"])
        got = load_h36m(pickle_path, ("S1",), normalize_func=None)
        # the reference's get_2dgt only renames the sample key; our loader
        # additionally switches to the poses_2d_pred arrays, so compare the
        # dict shape (reference pickles carry detector data under poses_2d)
        assert set(want[0]) == {"p2d_pred", "poses_3d"}
        assert set(got[0]) == {"p2d_gt", "poses_3d"}

    def test_mpi_uses_univ_gt(self, ref, pickle_path):
        from links_tpu.core.geometry import normalize_head
        from links_tpu.data import load_mpi_inf_3dhp

        subj = ["S1", "S2", "S3"]
        want = ref.mpi_inf_3dhp_dataset_class.MPI_INF_3DHP_Dataset(
            str(pickle_path), get_2dgt=True,
            normalize_func=ref.helpers.normalize_head, subjects=subj)
        got = load_mpi_inf_3dhp(pickle_path, tuple(subj),
                                normalize_func=normalize_head)
        close(got.poses_2d, np.asarray(want.data["poses_2d"]), atol=1e-5)
        close(got.poses_3d, np.asarray(want.data["poses_3d"]), atol=1e-4)

    def test_pca_fit_matches(self, ref, pickle_path):
        from links_tpu.core.geometry import normalize_head
        from links_tpu.data import fit_part_pca, load_h36m

        want = ref.h36m_dataset_class.H36M_Data(
            str(pickle_path), train=True, get_2dgt=True, get_pca=True,
            normalize_func=ref.helpers.normalize_head, subjects=["S1", "S5"])
        got = load_h36m(pickle_path, ("S1", "S5"), normalize_func=normalize_head)
        pcas = fit_part_pca(got.poses_2d)
        if pcas is None:
            pytest.skip("sklearn unavailable")
        left, right = pcas
        np.testing.assert_allclose(left.explained_variance_,
                                   want.left_pca.explained_variance_,
                                   rtol=1e-4, atol=1e-7)
        np.testing.assert_allclose(right.explained_variance_,
                                   want.right_pca.explained_variance_,
                                   rtol=1e-4, atol=1e-7)


# ------------------------------------------------------------- model forwards


class TestModelForwards:
    @pytest.mark.parametrize(
        "cls_name,nj",
        [("Left_Right_Lifter", 11), ("Leg_Lifter", 7), ("Torso_Lifter", 10),
         ("DepthAngleEstimator", 17)],
    )
    def test_lifter_forward(self, ref, rng, cls_name, nj):
        params = models.init_lifter(jax.random.PRNGKey(nj), nj)
        cls = getattr(ref.models_def, cls_name)
        tmod = cls(num_joints=nj)
        sd = {k: _t(v) for k, v in ckpt.lifter_to_torch(params).items()}
        missing, unexpected = tmod.load_state_dict(sd, strict=False)
        assert not unexpected, unexpected
        x = rng.normal(size=(4, 2 * nj)).astype(np.float32)
        xd_j, xa_j = models.lifter_apply(params, jnp.asarray(x))
        with torch.no_grad():
            xd_t, xa_t = tmod(_t(x))
        close(xd_j, xd_t, atol=2e-5)
        close(xa_j, xa_t, atol=2e-5)

    @pytest.mark.parametrize(
        "cls_name,in_j,out_j",
        [("Occluded_Limb_Predictor", 14, 3), ("Occluded_Legs_Predictor", 11, 6),
         ("Occluded_Torso_Predictor", 7, 10),
         ("Occluded_Left_Right_Predictor", 11, 6)],
    )
    def test_completer_forward(self, ref, rng, cls_name, in_j, out_j):
        params = models.init_completer(jax.random.PRNGKey(in_j), in_j, out_j)
        tmod = getattr(ref.models_def, cls_name)(num_joints=in_j)
        sd = {k: _t(v) for k, v in ckpt.completer_to_torch(params).items()}
        missing, unexpected = tmod.load_state_dict(sd, strict=False)
        assert not unexpected, unexpected
        x = rng.normal(size=(4, 3 * in_j)).astype(np.float32)
        got = models.completer_apply(params, jnp.asarray(x))
        with torch.no_grad():
            want = tmod(_t(x))
        close(got, want, atol=2e-5)

    def test_pose_discriminator_forward(self, ref, rng):
        params = models.init_pose_discriminator(jax.random.PRNGKey(0), 16)
        tmod = ref.models_def.PoseDiscriminator()

        sd = {}

        def lin(prefix, p):
            sd[prefix + ".weight"] = _t(np.asarray(p["w"]).T.copy())
            sd[prefix + ".bias"] = _t(p["b"])

        lin("upscale", params["upscale"])
        lin("downscale", params["downscale"])
        for blk in ("res_common", "res_pose1", "res_pose2"):
            lin(blk + ".l1", params[blk]["l1"])
            lin(blk + ".l2", params[blk]["l2"])
        missing, unexpected = tmod.load_state_dict(sd, strict=False)
        assert not unexpected, unexpected
        x = rng.normal(size=(4, 32)).astype(np.float32)
        got = models.pose_discriminator_apply(params, jnp.asarray(x))
        with torch.no_grad():
            want = tmod(_t(x))
        close(got, want, atol=2e-5)


# --------------------------------------------- stage-3a training_step parity


class _INN(torch.nn.Module):
    """FrEIA-SequenceINN-shaped adapter around benchmarks.torch_baseline's
    FlowSeq, loaded from a links_tpu flow export (ckpt.flow_to_torch) so the
    torch and jax sides run identical flow weights. Call convention matches
    the reference: ``z, logdet = inn(x)`` / ``x, _ = inn(z, rev=True)``."""

    def __init__(self, dim: int, sd: dict):
        super().__init__()
        import benchmarks.torch_baseline as tb

        self.seq = tb.FlowSeq(dim)
        state = {}
        for k in range(8):
            src, dst = f"module_list.{k}", f"blocks.{k}"
            for a, b in (("subnet.0", "net.0"), ("subnet.2", "net.2")):
                state[f"{dst}.{b}.weight"] = _t(sd[f"{src}.{a}.weight"])
                state[f"{dst}.{b}.bias"] = _t(sd[f"{src}.{a}.bias"])
            state[f"{dst}.gs"] = _t(sd[f"{src}.global_scale"].reshape(-1))
            state[f"{dst}.gb"] = _t(sd[f"{src}.global_offset"].reshape(-1))
            state[f"{dst}.w"] = _t(sd[f"{src}.w_perm"])
        self.seq.load_state_dict(state)

    def forward(self, x, rev=False):
        if rev:
            return self.seq.inverse(x), None
        return self.seq(x)


class TestStage3aTrainingStepParity:
    pytestmark = pytest.mark.slow  # loads + runs the reference trainer

    """Run the reference's ACTUAL LitLifter.training_step
    (train_left_right_lifter.py:121-435, loaded via the shim) against
    links_tpu's left_right_loss with identical weights, inputs, and injected
    random draws. Every loss term must agree."""

    @pytest.fixture(scope="class")
    def mod(self):
        return load_trainer_module("train_left_right_lifter.py", r"^left_inn2d = ")

    def test_training_step_losses_match(self, mod, rng, monkeypatch):
        from links_tpu.config import LifterTrainConfig
        from links_tpu.core.geometry import PI, rotation_about_x, rotation_about_y
        import links_tpu.objectives.lifter as lifter_obj

        B = 8
        inp = rng.normal(size=(B, 34)).astype(np.float32) * 0.1
        inp.reshape(B, 2, 17)[:, :, 0] = 0.0

        keys = jax.random.split(jax.random.PRNGKey(7), 5)
        full_flow = flows.init_flow(keys[0], 34)
        left_flow = flows.init_flow(keys[1], 22)
        right_flow = flows.init_flow(keys[2], 22)
        left_p = models.init_lifter(keys[3], 11)
        right_p = models.init_lifter(keys[4], 11)

        # pre-drawn randomness shared by both sides
        eps_noise = rng.normal(size=(B, 34)).astype(np.float32)
        eps_elev = rng.normal(size=(2 * B, 1)).astype(np.float32)
        u_azim = rng.uniform(size=(2 * B, 1)).astype(np.float32)

        # ---- torch side: the reference's own training_step ----
        mod.Attention_Left_Right_Lifter = (
            lambda **kw: mod.Left_Right_Lifter(
                use_batchnorm=False, num_joints=kw.get("num_joints", 11),
                use_dropout=False)
        )
        lit = mod.LitLifter(
            _INN(22, ckpt.flow_to_torch(left_flow)),
            _INN(22, ckpt.flow_to_torch(right_flow)),
            _INN(34, ckpt.flow_to_torch(full_flow)),
        )
        lit.left_lifter.load_state_dict(
            {k: _t(v) for k, v in ckpt.lifter_to_torch(left_p).items()})
        lit.right_lifter.load_state_dict(
            {k: _t(v) for k, v in ckpt.lifter_to_torch(right_p).items()})
        opts, scheds = lit.configure_optimizers()
        lit._test_optimizers = opts
        lit._test_schedulers = scheds

        monkeypatch.setattr(torch, "randn_like", lambda t, **k: _t(eps_noise))
        monkeypatch.setattr(torch, "normal",
                            lambda mean, std=None, **k: _t(eps_elev))
        monkeypatch.setattr(torch, "rand", lambda *size, **k: _t(u_azim))
        lit.training_step({"p2d_gt": _t(inp)}, 0)
        want = {k: float(v.detach()) for k, v in vars(lit.losses).items()}

        # ---- jax side ----
        # sample augmentation with the same noise draw
        z, _ = flows.forward(full_flow, jnp.asarray(inp))
        samples, _ = flows.inverse(full_flow, z + 0.2 * jnp.asarray(eps_noise) * z)
        samples = samples.reshape(-1, 2, 17).at[:, :, 0].set(0.0).reshape(-1, 34)
        inp_aug = jnp.concatenate([jnp.asarray(inp), samples], axis=0)

        def fixed_rotation(key, props, use_elevation=True, axis_name=None):
            r_comp = rotation_about_x(props)
            x_ang = -props.mean() + props.std(ddof=1) * jnp.asarray(eps_elev)
            y_ang = (jnp.asarray(u_azim) - 0.5) * 1.99 * PI
            return jnp.matmul(
                rotation_about_x(x_ang),
                jnp.matmul(rotation_about_y(y_ang), r_comp, precision="highest"),
                precision="highest",
            )

        monkeypatch.setattr(lifter_obj, "sample_rotation", fixed_rotation)
        stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), left_p, right_p)
        frozen = lifter_obj.LifterFrozen(full_flow, left_flow, right_flow)
        loss, aux = lifter_obj.left_right_loss(
            stacked, frozen, inp_aug, jax.random.PRNGKey(0), LifterTrainConfig()
        )

        # reference stores the left-split NLL under the *swapped* name
        # likeli_right (train_left_right_lifter.py:334-342); ours is fixed.
        close(aux["likeli_left"], want["likeli_right"], atol=1e-3, rtol=5e-4)
        close(aux["likeli_right"], want["likeli_left"], atol=1e-3, rtol=5e-4)
        for k in ("likeli", "L3d", "rep_rot", "re_rot_3d", "bl_prior", "loss"):
            close(aux[k], want[k], atol=1e-3, rtol=5e-4)


class TestStage3bTrainingStepParity:
    pytestmark = pytest.mark.slow  # loads + runs the reference trainer

    """Same differential for the leg/torso lifter stage
    (train_leg_torso_lifter.py:123-272)."""

    @pytest.fixture(scope="class")
    def mod(self):
        m = load_trainer_module(
            "train_leg_torso_lifter.py", r"^## load pretrained INN")
        # the reference __init__ freezes self.left_lifter/right_lifter that
        # are never created (train_leg_torso_lifter.py:69-73 — latent bug,
        # SURVEY.md §7.3); satisfy the attribute lookups with dummies.
        m.LitLifter.left_lifter = torch.nn.Linear(1, 1)
        m.LitLifter.right_lifter = torch.nn.Linear(1, 1)
        return m

    def test_training_step_losses_match(self, mod, rng, monkeypatch):
        from links_tpu.config import LifterTrainConfig
        from links_tpu.core.geometry import PI, rotation_about_x, rotation_about_y
        import links_tpu.objectives.lifter as lifter_obj

        B = 8
        inp = rng.normal(size=(B, 34)).astype(np.float32) * 0.1
        inp.reshape(B, 2, 17)[:, :, 0] = 0.0

        keys = jax.random.split(jax.random.PRNGKey(11), 5)
        full_flow = flows.init_flow(keys[0], 34)
        leg_flow = flows.init_flow(keys[1], 14)
        torso_flow = flows.init_flow(keys[2], 20)
        leg_p = models.init_lifter(keys[3], 7)
        torso_p = models.init_lifter(keys[4], 10)

        eps_noise = rng.normal(size=(B, 34)).astype(np.float32)
        eps_elev = rng.normal(size=(2 * B, 1)).astype(np.float32)
        u_azim = rng.uniform(size=(2 * B, 1)).astype(np.float32)

        lit = mod.LitLifter(
            _INN(14, ckpt.flow_to_torch(leg_flow)),
            _INN(20, ckpt.flow_to_torch(torso_flow)),
            _INN(34, ckpt.flow_to_torch(full_flow)),
        )
        lit.legs_lifter.load_state_dict(
            {k: _t(v) for k, v in ckpt.lifter_to_torch(leg_p).items()})
        lit.torso_lifter.load_state_dict(
            {k: _t(v) for k, v in ckpt.lifter_to_torch(torso_p).items()})
        opts, scheds = lit.configure_optimizers()
        lit._test_optimizers = opts
        lit._test_schedulers = scheds

        monkeypatch.setattr(torch, "randn_like", lambda t, **k: _t(eps_noise))
        monkeypatch.setattr(torch, "normal",
                            lambda mean, std=None, **k: _t(eps_elev))
        monkeypatch.setattr(torch, "rand", lambda *size, **k: _t(u_azim))
        lit.training_step({"p2d_gt": _t(inp)}, 0)
        want = {k: float(v.detach()) for k, v in vars(lit.losses).items()}

        z, _ = flows.forward(full_flow, jnp.asarray(inp))
        samples, _ = flows.inverse(full_flow, z + 0.2 * jnp.asarray(eps_noise) * z)
        samples = samples.reshape(-1, 2, 17).at[:, :, 0].set(0.0).reshape(-1, 34)
        inp_aug = jnp.concatenate([jnp.asarray(inp), samples], axis=0)

        def fixed_rotation(key, props, use_elevation=True, axis_name=None):
            r_comp = rotation_about_x(props)
            x_ang = -props.mean() + props.std(ddof=1) * jnp.asarray(eps_elev)
            y_ang = (jnp.asarray(u_azim) - 0.5) * 1.99 * PI
            return jnp.matmul(
                rotation_about_x(x_ang),
                jnp.matmul(rotation_about_y(y_ang), r_comp, precision="highest"),
                precision="highest",
            )

        monkeypatch.setattr(lifter_obj, "sample_rotation", fixed_rotation)
        frozen = lifter_obj.LifterFrozen(full_flow, leg_flow, torso_flow)
        loss, aux = lifter_obj.leg_torso_loss(
            leg_p, torso_p, frozen, inp_aug, jax.random.PRNGKey(0),
            LifterTrainConfig(),
        )
        for k in ("leg_likeli", "torso_likeli", "likeli", "L3d", "rep_rot",
                  "re_rot_3d", "bl_prior", "loss"):
            close(aux[k], want[k], atol=1e-3, rtol=5e-4)


class TestStage4TrainingStepParity:
    pytestmark = pytest.mark.slow  # loads + runs the reference trainer

    """Differential for the occlusion-completer stage: the reference's
    Limb_Predictor.training_step (train_occlusion_models.py:144-307) vs
    occlusion_loss, with shared lifter/completer weights and injected
    y-rotation draws."""

    # reference attr name -> links_tpu completer name
    NAME_MAP = {
        "left_leg_predictor": "left_leg",
        "right_leg_predictor": "right_leg",
        "left_arm_predictor": "left_arm",
        "right_arm_predictor": "right_arm",
        "both_legs_predictor": "both_legs",
        "torso_predictor": "torso",
        "left_predictor": "left_side",
        "right_predictor": "right_side",
    }

    @pytest.fixture(scope="class")
    def mod(self):
        return load_trainer_module(
            "train_occlusion_models.py", r"^## load pretrained lifting networks")

    def test_training_step_losses_match(self, mod, ref, rng, monkeypatch):
        from links_tpu.objectives import occlusion as occ_obj

        B = 8
        inp = rng.normal(size=(B, 34)).astype(np.float32) * 0.1
        inp.reshape(B, 2, 17)[:, :, 0] = 0.0

        keys = jax.random.split(jax.random.PRNGKey(13), 3)
        leg_p = models.init_lifter(keys[0], 7)
        torso_p = models.init_lifter(keys[1], 10)
        completers = models.init_all_completers(keys[2])

        u1 = rng.uniform(size=(B, 1)).astype(np.float32)
        u2 = rng.uniform(size=(B, 1)).astype(np.float32)

        # ---- torch side ----
        def make_lifter(cls, nj, params):
            m = cls(num_joints=nj)
            m.load_state_dict({k: _t(v) for k, v in
                               ckpt.lifter_to_torch(params).items()})
            return m

        lit = mod.Limb_Predictor(
            make_lifter(ref.models_def.Torso_Lifter, 10, torso_p),
            make_lifter(ref.models_def.Leg_Lifter, 7, leg_p),
            make_lifter(ref.models_def.Left_Right_Lifter, 11,
                        models.init_lifter(jax.random.PRNGKey(99), 11)),
            make_lifter(ref.models_def.Left_Right_Lifter, 11,
                        models.init_lifter(jax.random.PRNGKey(98), 11)),
        )
        for attr, name in self.NAME_MAP.items():
            sd = {k: _t(v) for k, v in
                  ckpt.completer_to_torch(completers[name]).items()}
            missing, unexpected = getattr(lit, attr).load_state_dict(
                sd, strict=False)
            assert not unexpected, (attr, unexpected)
        opts, scheds = lit.configure_optimizers()
        lit._test_optimizers = opts
        lit._test_schedulers = scheds

        draws = [_t(u1), _t(u2)]
        monkeypatch.setattr(torch, "rand",
                            lambda *size, **k: draws.pop(0))
        lit.training_step({"p2d_gt": _t(inp)}, 0)
        want = {k: float(v.detach()) for k, v in vars(lit.losses).items()}

        # ---- jax side ----
        pose_3d = occ_obj.pseudo_3d_from_lifters(leg_p, torso_p, jnp.asarray(inp))
        jdraws = [jnp.asarray(u1), jnp.asarray(u2)]
        monkeypatch.setattr(
            occ_obj.jax.random, "uniform",
            lambda key, shape, *a, **k: jdraws.pop(0),
        )
        loss, aux = occ_obj.occlusion_loss(
            completers, pose_3d, jax.random.PRNGKey(0))
        for k in ("threed_loss_left_arm", "threed_loss_right_arm",
                  "threed_loss_left_leg", "threed_loss_right_leg",
                  "threed_loss_left_side", "threed_loss_right_side",
                  "threed_loss_both_legs", "threed_loss_torso", "loss"):
            close(aux[k], want[k], atol=1e-3, rtol=5e-4)


class TestEvalPathParity:
    pytestmark = pytest.mark.slow  # loads + runs the reference trainer

    """The reference's validation_step (train_left_right_lifter.py:437-501 —
    the same math as eval_h36m.py:50-100) vs lift_left_right_eval +
    pa_mpjpe/n_mpjpe, with identical lifter weights."""

    def test_validation_metrics_match(self, rng):
        mod = load_trainer_module("train_left_right_lifter.py", r"^left_inn2d = ")
        import links_tpu.objectives.lifter as lifter_obj

        B = 12
        p2d = rng.normal(size=(B, 34)).astype(np.float32) * 0.1
        p2d.reshape(B, 2, 17)[:, :, 0] = 0.0
        p3d = rng.normal(size=(B, 51)).astype(np.float32)

        left_p = models.init_lifter(jax.random.PRNGKey(21), 11)
        right_p = models.init_lifter(jax.random.PRNGKey(22), 11)

        mod.Attention_Left_Right_Lifter = (
            lambda **kw: mod.Left_Right_Lifter(
                use_batchnorm=False, num_joints=kw.get("num_joints", 11),
                use_dropout=False)
        )
        dummy_inn = type("D", (torch.nn.Module,), {"forward": lambda s, x: x})()
        lit = mod.LitLifter(dummy_inn, dummy_inn, dummy_inn)
        lit.left_lifter.load_state_dict(
            {k: _t(v) for k, v in ckpt.lifter_to_torch(left_p).items()})
        lit.right_lifter.load_state_dict(
            {k: _t(v) for k, v in ckpt.lifter_to_torch(right_p).items()})
        with torch.no_grad():
            lit.validation_step({"p2d_gt": _t(p2d), "poses_3d": _t(p3d)}, 0)

        stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), left_p, right_p)
        for choice, pa_key, nm_key in (("left", "pa_left", "mpjpe_scaled_left"),
                                       ("right", "pa_right", "mpjpe_scaled_right")):
            pred = lifter_obj.lift_left_right_eval(
                stacked, jnp.asarray(p2d), choice=choice)
            pa = float(metrics.pa_mpjpe(jnp.asarray(p3d), pred).mean())
            nm = float(metrics.n_mpjpe(jnp.asarray(p3d), pred).mean())
            close(pa, float(getattr(lit.losses, pa_key)), atol=1e-4, rtol=1e-4)
            close(nm, float(getattr(lit.losses, nm_key)), atol=1e-3, rtol=1e-4)
