"""Orbax checkpointing: params + optimizer state + step + RNG key, with
deterministic mid-run resume — capabilities the reference lacks (it only
``torch.save``s model state dicts per epoch, e.g.
train_full_pose_norm_flow.py:115; SURVEY.md §5)."""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(path, state: Any, key=None, extra: dict | None = None,
                    force: bool = True):
    """Save a train-state pytree (+ optional rng key / extras) to ``path``."""
    path = Path(path).absolute()
    payload = {"state": state}
    if key is not None:
        try:  # typed PRNG keys must be serialized as raw key data
            payload["rng_key"] = jax.random.key_data(key)
        except TypeError:
            payload["rng_key"] = key
    if extra:
        payload["extra"] = extra
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=force)


def restore_checkpoint(path, target: Any = None):
    """Restore; ``target`` (a matching pytree of abstract/concrete arrays)
    guides dtypes/shapes when provided."""
    path = Path(path).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
            return ckptr.restore(path, abstract)
        return ckptr.restore(path)


def restore_rng_key(payload):
    """Recover a typed PRNG key from a restored payload."""
    data = payload.get("rng_key")
    if data is None:
        return None
    return jax.random.wrap_key_data(np.asarray(data))
