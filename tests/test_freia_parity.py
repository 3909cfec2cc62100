"""Numerical parity vs pip-installed FrEIA (VERDICT r1 next #4).

FrEIA is not shipped in this image, so these tests skip today — but they
activate the moment the dependency exists (``pytest.importorskip``), making
the AllInOneBlock parameterization machine-checked rather than asserted
from a derivation. The derivation itself (op order, ``w_perm``
orientation) is documented with FrEIA source citations in docs/API.md and
guarded FrEIA-free by
tests/test_ckpt.py::test_pt_roundtrip_detects_transposed_w_perm.

What must hold (FrEIA/modules/all_in_one_block.py):
* split lens [D - D//2, D//2] (``self.splits``), subnet D-D//2 → 2·(D//2);
* ``_affine``: a = 0.1·subnet(x1); s = clamp·0.636·atan(a[:, :len2])
  (FrEIA's literal 0.636, not 2/π);
  y2 = x2·exp(s) + a[:, len2:];
* ``_permute`` (forward): z = (cat(x1,y2)·gs + gb) @ w_perm.T via
  ``F.linear``; gs = 0.1·softplus_{β=0.5}(global_scale);
* logdet = Σs + Σlog(gs) (orthogonal w_perm contributes 0).
"""

from __future__ import annotations

import numpy as np
import pytest

pytest.importorskip("FrEIA")

import torch  # noqa: E402
import FrEIA.framework as Ff  # noqa: E402
import FrEIA.modules as Fm  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from links_tpu import ckpt, flows  # noqa: E402


def subnet_fc(d_in, d_out):
    """The reference's coupling subnet (utils/helpers.py:291-293)."""
    return torch.nn.Sequential(torch.nn.Linear(d_in, 1024), torch.nn.ReLU(),
                               torch.nn.Linear(1024, d_out))


def _build_inn(dim: int, n_blocks: int = 8):
    """Ff.SequenceINN + AllInOneBlock exactly as every reference entry point
    builds it (train_full_pose_norm_flow.py:47-50)."""
    inn = Ff.SequenceINN(dim)
    for _ in range(n_blocks):
        inn.append(Fm.AllInOneBlock, subnet_constructor=subnet_fc,
                   permute_soft=True)
    return inn


def _poses(n, dim):
    return np.random.default_rng(0).normal(size=(n, dim)).astype(np.float32) * 0.1


class TestFrEIAParity:
    def test_import_forward_logdet(self):
        """Real FrEIA weights imported via flow_from_torch reproduce
        forward z and log|detJ|."""
        torch.manual_seed(0)
        inn = _build_inn(34)
        flow = ckpt.flow_from_torch(inn.state_dict())
        x = _poses(16, 34)
        with torch.no_grad():
            zt, ldt = inn(torch.tensor(x))
        zj, ldj = flows.forward(flow, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(zj), zt.numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ldj), ldt.numpy(),
                                   rtol=1e-4, atol=1e-4)

    def test_import_inverse(self):
        torch.manual_seed(1)
        inn = _build_inn(22)
        flow = ckpt.flow_from_torch(inn.state_dict())
        z = _poses(16, 22)
        with torch.no_grad():
            xt, _ = inn(torch.tensor(z), rev=True)
        xj, _ = flows.inverse(flow, jnp.asarray(z))
        np.testing.assert_allclose(np.asarray(xj), xt.numpy(),
                                   rtol=1e-4, atol=1e-5)

    def test_export_loads_into_freia(self):
        """flow_to_torch state dicts load into a real FrEIA SequenceINN
        (both directions of the bridge) and agree on forward outputs."""
        torch.manual_seed(2)
        inn = _build_inn(22)
        flow = flows.init_flow(jax.random.PRNGKey(7), 22)
        ref_sd = inn.state_dict()
        sd = {}
        for k, v in ckpt.flow_to_torch(flow).items():
            sd[k] = torch.tensor(np.asarray(v)).reshape(ref_sd[k].shape)
        missing, unexpected = inn.load_state_dict(sd, strict=True)
        assert not missing and not unexpected
        x = _poses(16, 22)
        with torch.no_grad():
            zt, ldt = inn(torch.tensor(x))
        zj, ldj = flows.forward(flow, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(zj), zt.numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ldj), ldt.numpy(),
                                   rtol=1e-4, atol=1e-4)
