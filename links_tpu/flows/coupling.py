"""Invertible coupling block — behavioral equivalent of FrEIA's
``AllInOneBlock`` with ``permute_soft=True``, the only flow block the
reference uses (train_full_pose_norm_flow.py:47-50 and every other entry
point; see SURVEY.md §2.5).

One block = GLOW-style affine coupling + learnable global affine
("ActNorm") + a *fixed random SO(D) mixing matrix* (the "soft
permutation"), applied in this order on the forward pass:

    x1, x2 = split(x)                      # [D - D//2, D//2]
    a      = subnet(x1) * 0.1              # subnet: Linear(1024) ReLU Linear
    s      = clamp * 0.636 * atan(a[:, :len2])
    y2     = x2 * exp(s) + a[:, len2:]
    y      = concat(x1, y2) * gs + gb      # global affine
    z      = y @ W.T                       # fixed orthogonal W, |det| = 1
    logdet = sum(s) + sum(log(gs))

with clamp = 2.0, gs = 0.1 * softplus_{beta=0.5}(g) (FrEIA's default
'SOFTPLUS' global-scale activation initialized so gs = 1). The exact FrEIA
parameterization is kept so reference ``.pt`` flow weights can be imported
loss-lessly (ckpt/torch_io.py).

TPU notes: the hot path is the two subnet matmuls (D→1024→2·len2); they run
under a dtype ``Policy`` (bf16 multiply / f32 accumulate by default in
training). The D×D mixing matmul and all logdet arithmetic stay in full f32
precision — invertibility error compounds over the 8-block stack otherwise.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from links_tpu.core import nn

CLAMP = 2.0
# FrEIA's ATAN clamp activation is the LITERAL 0.636 (all_in_one_block.py:
# `self.f_clamp = lambda u: 0.636 * torch.atan(u)`), not 2/pi ~ 0.63662 -
# the ~1e-3 difference compounds over 8 blocks and would break .pt
# weight interchange with genuinely-FrEIA-trained reference flows.
_ATAN_CLAMP = 0.636
# g0 such that 0.1 * softplus_{beta=0.5}(g0) == 1.0 (FrEIA global_affine_init=1).
GLOBAL_SCALE_INIT = 2.0 * math.log(math.exp(5.0) - 1.0)


class Flow(NamedTuple):
    """A stack of K coupling blocks over dimension D.

    ``params``: trainable pytree, every leaf stacked on a leading K axis
    (subnet linears, global scale/offset).
    ``perm``: (K, D, D) fixed random orthogonal mixing matrices —
    non-trainable (FrEIA registers them as buffers; keeping them out of
    ``params`` keeps the optimizer away from them).
    """

    params: dict
    perm: jnp.ndarray

    @property
    def dim(self) -> int:
        return self.perm.shape[-1]

    @property
    def n_blocks(self) -> int:
        return self.perm.shape[0]


def _split_lens(dim: int) -> tuple[int, int]:
    # FrEIA AllInOneBlock convention: first split gets the ceil half.
    len2 = dim // 2
    return dim - len2, len2


def _random_orthogonal(key, dim: int) -> jnp.ndarray:
    """Haar-ish random rotation in SO(dim) via sign-fixed QR."""
    a = jax.random.normal(key, (dim, dim), jnp.float32)
    q, r = jnp.linalg.qr(a)
    q = q * jnp.sign(jnp.diagonal(r))
    # force det=+1 (flip one column if needed); |det|=1 either way so the
    # logdet contribution is exactly zero.
    det = jnp.linalg.det(q)
    return q.at[:, 0].multiply(jnp.sign(det))


def init_block(key, dim: int, hidden: int = 1024):
    """One block's trainable params + its fixed mixing matrix."""
    len1, len2 = _split_lens(dim)
    k1, k2, kw = jax.random.split(key, 3)
    params = {
        "subnet": {
            "l1": nn.init_linear(k1, len1, hidden),
            "l2": nn.init_linear(k2, hidden, 2 * len2),
        },
        "global_scale": jnp.full((dim,), GLOBAL_SCALE_INIT, jnp.float32),
        "global_offset": jnp.zeros((dim,), jnp.float32),
    }
    return params, _random_orthogonal(kw, dim)


def init_flow(key, dim: int, n_blocks: int = 8, hidden: int = 1024) -> Flow:
    """Equivalent of ``Ff.SequenceINN(dim)`` + ``n_blocks`` AllInOneBlocks
    (train_full_pose_norm_flow.py:47-50). Block params are stacked on a
    leading axis and traversed with ``lax.scan`` — one compiled block body
    regardless of depth."""
    keys = jax.random.split(key, n_blocks)
    blocks, perms = [], []
    for k in keys:
        p, w = init_block(k, dim, hidden)
        blocks.append(p)
        perms.append(w)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return Flow(params=stacked, perm=jnp.stack(perms))


def _subnet(p, x1, policy: nn.Policy):
    h = jax.nn.relu(nn.dense(p["l1"], x1, policy))
    return nn.dense(p["l2"], h, policy)


def _global_scale(p):
    # 0.1 * softplus_{beta=0.5}(g) = 0.2 * log(1 + exp(0.5 g))
    return 0.1 * (2.0 * jax.nn.softplus(0.5 * p["global_scale"]))


def block_forward(params, w, x, policy: nn.Policy = nn.F32):
    """x → (z, logdet) for one block."""
    dim = x.shape[-1]
    len1, len2 = _split_lens(dim)
    x1, x2 = x[:, :len1], x[:, len1:]
    a = _subnet(params["subnet"], x1, policy) * 0.1
    s = CLAMP * _ATAN_CLAMP * jnp.arctan(a[:, :len2])
    t = a[:, len2:]
    y2 = x2 * jnp.exp(s) + t
    j = s.sum(-1)
    gs = _global_scale(params)
    y = jnp.concatenate([x1, y2], axis=-1) * gs + params["global_offset"]
    z = jnp.matmul(y, w.T, precision="highest")
    return z, j + jnp.log(gs).sum()


def block_inverse(params, w, z, policy: nn.Policy = nn.F32):
    """z → (x, logdet) for one block (logdet of the inverse map)."""
    dim = z.shape[-1]
    len1, len2 = _split_lens(dim)
    gs = _global_scale(params)
    y = jnp.matmul(z, w, precision="highest")
    y = (y - params["global_offset"]) / gs
    x1, y2 = y[:, :len1], y[:, len1:]
    a = _subnet(params["subnet"], x1, policy) * 0.1
    s = CLAMP * _ATAN_CLAMP * jnp.arctan(a[:, :len2])
    t = a[:, len2:]
    x2 = (y2 - t) * jnp.exp(-s)
    x = jnp.concatenate([x1, x2], axis=-1)
    return x, -(s.sum(-1) + jnp.log(gs).sum())
