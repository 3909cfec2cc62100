import matplotlib

matplotlib.use("Agg")

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from links_tpu import flows, models, viz
from links_tpu.data import generate_poses


@pytest.fixture(scope="module")
def poses():
    d = generate_poses(8, seed=3)
    p3d = jnp.asarray(d["poses_3d"].transpose(0, 2, 1).reshape(-1, 51))
    p2d = jnp.asarray(d["poses_2d"].transpose(0, 2, 1).reshape(-1, 34)) / 1000.0
    return p2d, p3d


def test_plot_skeletons(poses, tmp_path):
    p2d, p3d = poses
    ax = viz.plot_skeleton_2d(p2d[0])
    assert ax is not None
    fig = viz.compare_poses_3d([p3d[0], p3d[1]], ["a", "b"],
                               out_path=tmp_path / "cmp.png")
    assert (tmp_path / "cmp.png").exists()


def test_32slot_expansion_and_render(poses, tmp_path):
    """Reference 32-slot convention (h36m_gt_visualiser.py:88-91): the 17
    joints scatter to their original H36M slots, the kinematic tree edges
    connect exactly the subset slots, and the renderer draws from it."""
    import matplotlib.pyplot as plt

    _, p3d = poses
    buff = viz.expand_to_32_slots(p3d[0])
    assert buff.shape == (3, 32)
    from links_tpu.viz.skeletons import H36M_32SLOT_INDICES, H36M_32SLOT_KIN_TREE

    p = np.asarray(p3d[0]).reshape(3, 17)
    np.testing.assert_allclose(buff[:, list(H36M_32SLOT_INDICES)], p)
    unused = [i for i in range(32) if i not in H36M_32SLOT_INDICES]
    np.testing.assert_array_equal(buff[:, unused], 0.0)
    # every kin-tree endpoint is a populated slot; 16 edges = 16 bones
    assert H36M_32SLOT_KIN_TREE.shape == (16, 2)
    assert set(H36M_32SLOT_KIN_TREE.ravel()) <= set(H36M_32SLOT_INDICES)

    ax = viz.plot_skeleton_3d_32slot(p3d[0], title="gt")
    ax.figure.savefig(tmp_path / "slot32.png")
    plt.close(ax.figure)
    assert (tmp_path / "slot32.png").exists()

    # 2D buffer variant
    p2d, _ = poses
    b2 = viz.expand_to_32_slots(p2d[0])
    assert b2.shape == (2, 32)


def test_32slot_vertical_axis_is_negated_y(poses):
    """Axis-convention pin (ADVICE r3): the reference renders
    ax.plot(pose[0], pose[2], -pose[1]) (h36m_gt_visualiser.py:103) — the
    matplotlib z axis carries NEGATED pose-y. A sign slip here flips every
    render vertically relative to the reference's shipped images."""
    import matplotlib.pyplot as plt

    from links_tpu.viz.skeletons import H36M_32SLOT_KIN_TREE

    _, p3d = poses
    buff = viz.expand_to_32_slots(p3d[0])
    ax = viz.plot_skeleton_3d_32slot(p3d[0])
    a, b = H36M_32SLOT_KIN_TREE[0]
    xs, ys, zs = ax.lines[0].get_data_3d()
    np.testing.assert_allclose(xs, [buff[0][a], buff[0][b]], rtol=1e-6)
    np.testing.assert_allclose(ys, [buff[2][a], buff[2][b]], rtol=1e-6)
    np.testing.assert_allclose(zs, [-buff[1][a], -buff[1][b]], rtol=1e-6)
    plt.close(ax.figure)


def test_visualise_prediction(poses, tmp_path):
    p2d, p3d = poses
    stacked = jax.tree.map(
        lambda a, b: jnp.stack([a, b]),
        models.init_lifter(jax.random.PRNGKey(0), 11),
        models.init_lifter(jax.random.PRNGKey(1), 11),
    )
    fig, err = viz.visualise_prediction(stacked, p2d, p3d, 0,
                                        out_path=tmp_path / "pred.png")
    assert np.isfinite(err)
    assert (tmp_path / "pred.png").exists()


def test_visualise_flow_samples(poses, tmp_path):
    p2d, _ = poses
    flow = flows.init_flow(jax.random.PRNGKey(2), 34, hidden=32)
    viz.visualise_flow_samples(flow, p2d, jax.random.PRNGKey(3), n=4,
                               out_path=tmp_path / "samples.png")
    assert (tmp_path / "samples.png").exists()


def test_visualise_occlusion(poses, tmp_path):
    p2d, p3d = poses
    completers = models.init_all_completers(jax.random.PRNGKey(0))
    lifters = {
        "left": models.init_lifter(jax.random.PRNGKey(1), 11),
        "right": models.init_lifter(jax.random.PRNGKey(2), 11),
        "legs": models.init_lifter(jax.random.PRNGKey(3), 7),
        "torso": models.init_lifter(jax.random.PRNGKey(4), 10),
    }
    fig, err = viz.visualise_occlusion(completers, lifters, p2d, p3d, 0,
                                       scenario="torso",
                                       out_path=tmp_path / "occ.png")
    assert np.isfinite(err)
    assert (tmp_path / "occ.png").exists()


def test_comparison_video(poses, tmp_path):
    _, p3d = poses
    seq = np.asarray(p3d[:4]).reshape(4, 3, 17)
    out = viz.render_comparison_video(seq, seq, tmp_path / "cmp.gif", fps=2)
    assert (tmp_path / "cmp.gif").exists()
    # N-panel variant (the occlusion-scenario clip layout: GT|naive|recovered)
    viz.render_multi_video([seq, seq, seq], ["gt", "naive", "recovered"],
                           tmp_path / "occ3.gif", fps=2)
    assert (tmp_path / "occ3.gif").exists()
