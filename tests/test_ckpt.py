import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from links_tpu import ckpt, flows, models, train
from links_tpu.config import OptimConfig


def test_orbax_roundtrip(tmp_path):
    params = models.init_lifter(jax.random.PRNGKey(0), 7)
    optimizer = train.make_optimizer(OptimConfig(), 10)
    state = train.init_state(params, optimizer)
    key = jax.random.PRNGKey(42)
    ckpt.save_checkpoint(tmp_path / "ck", state, key=key, extra={"epoch": 3})
    restored = ckpt.restore_checkpoint(tmp_path / "ck")
    r_up = restored["state"].params["upscale"]["w"] if hasattr(restored["state"], "params") \
        else restored["state"]["params"]["upscale"]["w"]
    np.testing.assert_allclose(np.asarray(r_up), np.asarray(params["upscale"]["w"]))
    assert int(np.asarray(restored["extra"]["epoch"])) == 3
    rk = ckpt.restore_rng_key(restored)
    np.testing.assert_array_equal(
        jax.random.key_data(rk), jax.random.key_data(key)
    )


def test_flow_torch_roundtrip():
    flow = flows.init_flow(jax.random.PRNGKey(1), 22, hidden=64)
    sd = ckpt.flow_to_torch(flow)
    back = ckpt.flow_from_torch(sd)
    x = jax.random.normal(jax.random.PRNGKey(2), (8, 22))
    z0, ld0 = flows.forward(flow, x)
    z1, ld1 = flows.forward(back, x)
    np.testing.assert_allclose(np.asarray(z0), np.asarray(z1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld0), np.asarray(ld1), atol=1e-6)


class _TorchResBlock(tnn.Module):
    """Reference res_block semantics (models_def.py:10-39), flags off."""

    def __init__(self, n=1024):
        super().__init__()
        self.l1 = tnn.Linear(n, n)
        self.bn1 = tnn.LayerNorm(n)
        self.l2 = tnn.Linear(n, n)
        self.bn2 = tnn.LayerNorm(n)

    def forward(self, x):
        h = tnn.LeakyReLU()(self.l1(x))
        h = tnn.LeakyReLU()(self.l2(h))
        return h + x


class _TorchLifter(tnn.Module):
    """Reference lifter semantics (models_def.py:65-107)."""

    def __init__(self, nj):
        super().__init__()
        self.upscale = tnn.Linear(2 * nj, 1024)
        for name in ("res_common", "res_pose1", "res_pose2", "res_pose3",
                     "res_angle1", "res_angle2", "res_angle3"):
            setattr(self, name, _TorchResBlock())
        self.downscale = tnn.Linear(1024, nj)
        self.angles = tnn.Linear(1024, 1)

    def forward(self, x):
        act = tnn.LeakyReLU()
        h = act(self.res_common(self.upscale(x)))
        xd = act(self.res_pose1(h))
        xd = act(self.res_pose2(xd))
        xd = self.downscale(act(self.res_pose3(xd)))
        xa = act(self.res_angle1(h))
        xa = act(self.res_angle2(xa))
        xa = self.angles(act(self.res_angle3(xa)))
        return xd, xa


def test_lifter_forward_matches_torch():
    """Cross-framework check: export our lifter params to a torch module
    with the reference architecture; forwards must agree."""
    nj = 11
    params = models.init_lifter(jax.random.PRNGKey(3), nj)
    sd = ckpt.lifter_to_torch(params)
    tmod = _TorchLifter(nj)
    tmod.load_state_dict({k: torch.tensor(v) for k, v in sd.items()})
    x = np.random.default_rng(0).normal(size=(16, 22)).astype(np.float32)
    xd_j, xa_j = models.lifter_apply(params, jnp.asarray(x))
    with torch.no_grad():
        xd_t, xa_t = tmod(torch.tensor(x))
    np.testing.assert_allclose(np.asarray(xd_j), xd_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(xa_j), xa_t.numpy(), atol=2e-5)


def test_lifter_import_roundtrip():
    params = models.init_lifter(jax.random.PRNGKey(4), 7)
    back = ckpt.lifter_from_torch(
        {k: torch.tensor(v) for k, v in ckpt.lifter_to_torch(params).items()}
    )
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 14))
    a, _ = models.lifter_apply(params, x)
    b, _ = models.lifter_apply(back, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_completer_roundtrip_and_pt_file(tmp_path):
    params = models.init_completer(jax.random.PRNGKey(6), 14, 3)
    path = tmp_path / "completer.pt"
    ckpt.save_pt(path, ckpt.completer_to_torch(params))
    back = ckpt.load_completer_pt(path)
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 42))
    np.testing.assert_allclose(
        np.asarray(models.completer_apply(params, x)),
        np.asarray(models.completer_apply(back, x)),
        atol=1e-6,
    )
