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
