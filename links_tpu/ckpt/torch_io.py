"""Reference ``.pt`` checkpoint import/export.

Maps between this package's pytrees and the reference's torch state-dict
layouts so shipped reference weights can be evaluated here (and vice versa):

* Flows — FrEIA ``SequenceINN`` naming (``module_list.{k}.*``): the raw
  pre-activation ``global_scale``/``global_offset``, the fixed ``w_perm``
  buffer (our ``perm``; ``w_perm_inv`` is its transpose), and the coupling
  subnet ``subnet.0/2.{weight,bias}``. Parameterization matches exactly
  (flows/coupling.py), so import is loss-less.
* Lifters — ``{upscale,downscale,angles}.{weight,bias}`` +
  ``res_*.{l1,l2,bn1,bn2}.*`` (models_def.py:65-239). Torch linear weights
  are (out, in); ours are (in, out) — transposed on the way through.
  Unused LayerNorm tensors (``bn*``, present because the reference always
  constructs them) are ignored on import and emitted at torch defaults on
  export, mirroring the reference's own ``strict=False`` loads
  (train_occlusion_models.py:532-533).
* Completers — same, plus the reference's constructed-but-unused
  ``res_common`` block.

Requires torch only inside these functions (CPU build is fine).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from links_tpu.flows import Flow

_RES_BLOCKS_LIFTER = (
    "res_common", "res_pose1", "res_pose2", "res_pose3",
    "res_angle1", "res_angle2", "res_angle3",
)
_RES_BLOCKS_COMPLETER = ("res_pose1", "res_pose2", "res_pose3")


def _to_np(state_dict):
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
            for k, v in state_dict.items()}


def _linear_from_torch(sd, prefix):
    return {
        "w": jnp.asarray(sd[prefix + ".weight"].T),
        "b": jnp.asarray(sd[prefix + ".bias"]),
    }


def _linear_to_torch(out, prefix, p):
    out[prefix + ".weight"] = np.asarray(p["w"]).T.copy()
    out[prefix + ".bias"] = np.asarray(p["b"]).copy()


def _res_block_from_torch(sd, prefix, use_layernorm=False):
    p = {
        "l1": _linear_from_torch(sd, prefix + ".l1"),
        "l2": _linear_from_torch(sd, prefix + ".l2"),
    }
    if use_layernorm:
        p["ln1"] = {"scale": jnp.asarray(sd[prefix + ".bn1.weight"]),
                    "bias": jnp.asarray(sd[prefix + ".bn1.bias"])}
        p["ln2"] = {"scale": jnp.asarray(sd[prefix + ".bn2.weight"]),
                    "bias": jnp.asarray(sd[prefix + ".bn2.bias"])}
    return p


def _res_block_to_torch(out, prefix, p, hidden=1024):
    _linear_to_torch(out, prefix + ".l1", p["l1"])
    _linear_to_torch(out, prefix + ".l2", p["l2"])
    if "ln1" in p:
        out[prefix + ".bn1.weight"] = np.asarray(p["ln1"]["scale"]).copy()
        out[prefix + ".bn1.bias"] = np.asarray(p["ln1"]["bias"]).copy()
        out[prefix + ".bn2.weight"] = np.asarray(p["ln2"]["scale"]).copy()
        out[prefix + ".bn2.bias"] = np.asarray(p["ln2"]["bias"]).copy()
    else:  # reference always constructs LayerNorms; emit defaults
        out[prefix + ".bn1.weight"] = np.ones(hidden, np.float32)
        out[prefix + ".bn1.bias"] = np.zeros(hidden, np.float32)
        out[prefix + ".bn2.weight"] = np.ones(hidden, np.float32)
        out[prefix + ".bn2.bias"] = np.zeros(hidden, np.float32)


# ----------------------------------------------------------------- flows

def flow_from_torch(state_dict, n_blocks: int = 8) -> Flow:
    """FrEIA SequenceINN state dict → Flow."""
    sd = _to_np(state_dict)
    blocks, perms = [], []
    for k in range(n_blocks):
        pre = f"module_list.{k}"
        blocks.append({
            "subnet": {
                "l1": _linear_from_torch(sd, pre + ".subnet.0"),
                "l2": _linear_from_torch(sd, pre + ".subnet.2"),
            },
            "global_scale": jnp.asarray(sd[pre + ".global_scale"].reshape(-1)),
            "global_offset": jnp.asarray(sd[pre + ".global_offset"].reshape(-1)),
        })
        w = sd[pre + ".w_perm"]
        perms.append(jnp.asarray(w.reshape(w.shape[0], w.shape[0])))
    import jax

    return Flow(
        params=jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        perm=jnp.stack(perms),
    )


def flow_to_torch(flow: Flow) -> dict:
    """Flow → FrEIA-style state dict (numpy arrays; wrap with torch.tensor
    before torch.save if needed)."""
    import jax

    out = {}
    for k in range(flow.n_blocks):
        blk = jax.tree.map(lambda a, k=k: a[k], flow.params)
        pre = f"module_list.{k}"
        _linear_to_torch(out, pre + ".subnet.0", blk["subnet"]["l1"])
        _linear_to_torch(out, pre + ".subnet.2", blk["subnet"]["l2"])
        out[pre + ".global_scale"] = np.asarray(blk["global_scale"])[None]
        out[pre + ".global_offset"] = np.asarray(blk["global_offset"])[None]
        w = np.asarray(flow.perm[k])
        out[pre + ".w_perm"] = w.copy()
        out[pre + ".w_perm_inv"] = w.T.copy()
    return out


def load_flow_pt(path, n_blocks: int = 8) -> Flow:
    import torch

    return flow_from_torch(torch.load(path, map_location="cpu"), n_blocks)


# ---------------------------------------------------------------- lifters

def lifter_from_torch(state_dict, use_layernorm: bool = False) -> dict:
    sd = _to_np(state_dict)
    p = {"upscale": _linear_from_torch(sd, "upscale"),
         "downscale": _linear_from_torch(sd, "downscale"),
         "angles": _linear_from_torch(sd, "angles")}
    for rb in _RES_BLOCKS_LIFTER:
        p[rb] = _res_block_from_torch(sd, rb, use_layernorm)
    return p


def lifter_to_torch(params) -> dict:
    out = {}
    _linear_to_torch(out, "upscale", params["upscale"])
    _linear_to_torch(out, "downscale", params["downscale"])
    _linear_to_torch(out, "angles", params["angles"])
    for rb in _RES_BLOCKS_LIFTER:
        _res_block_to_torch(out, rb, params[rb])
    return out


def load_lifter_pt(path, use_layernorm: bool = False) -> dict:
    import torch

    return lifter_from_torch(torch.load(path, map_location="cpu"), use_layernorm)


# ------------------------------------------------------------- completers

def completer_from_torch(state_dict, use_layernorm: bool = False) -> dict:
    sd = _to_np(state_dict)
    p = {"upscale": _linear_from_torch(sd, "upscale"),
         "downscale": _linear_from_torch(sd, "downscale")}
    for rb in _RES_BLOCKS_COMPLETER:
        p[rb] = _res_block_from_torch(sd, rb, use_layernorm)
    return p


def completer_to_torch(params, in_dim: int | None = None) -> dict:
    out = {}
    _linear_to_torch(out, "upscale", params["upscale"])
    _linear_to_torch(out, "downscale", params["downscale"])
    for rb in _RES_BLOCKS_COMPLETER:
        _res_block_to_torch(out, rb, params[rb])
    # unused res_common constructed by the reference (models_def.py:247)
    hidden = params["upscale"]["w"].shape[1]
    _res_block_to_torch(out, "res_common", {
        "l1": {"w": jnp.zeros((hidden, hidden)), "b": jnp.zeros(hidden)},
        "l2": {"w": jnp.zeros((hidden, hidden)), "b": jnp.zeros(hidden)},
    })
    return out


def load_completer_pt(path, use_layernorm: bool = False) -> dict:
    import torch

    return completer_from_torch(torch.load(path, map_location="cpu"), use_layernorm)


def save_pt(path, state_dict: dict):
    """numpy state dict → torch.save'd .pt."""
    import torch

    torch.save({k: torch.tensor(v) for k, v in state_dict.items()}, path)
