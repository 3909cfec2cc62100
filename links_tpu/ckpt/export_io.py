"""Serving-artifact export: serialized StableHLO via ``jax.export``.

The reference has no deployment story at all — prediction is only reachable
through its matplotlib visualiser (h36m_prediction_visualiser.py:244-320).
``links-lift`` (cli/lift.py) is the live serving surface; this module is the
*offline* counterpart: it freezes a lifting forward — weights embedded as
constants — into one portable, versioned StableHLO artifact that any JAX
process (or XLA runtime) can load and call without the links_tpu package,
its checkpoints, or even matching Python code. That is the TPU-native
equivalent of a TorchScript/ONNX export:

* the artifact is a single self-contained file (``Exported.serialize()``
  bytes: StableHLO MLIR + calling convention + embedded weights);
* the batch dimension is symbolic by default (``jax.export.symbolic_shape``)
  so one artifact serves any request size with zero recompiles beyond the
  first per shape actually seen;
* it is lowered for multiple platforms at once (default ``tpu,cpu``), so
  the same file runs on a TPU serving fleet and on a CPU canary;
* loading is one call: ``load_exported(path)`` returns a plain callable.

Guarantee: ``jax.export`` serialization is versioned and forward-compatible
(jax documents a compatibility window for deserializing old artifacts), so
a model exported today keeps serving across framework upgrades — the
property checkpoint trees do NOT give you.
"""

from __future__ import annotations

import os
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export

__all__ = ["export_serving", "load_exported", "exported_info"]


def export_serving(
    fn: Callable,
    out_path: str,
    *,
    in_dim: int = 34,
    batch: int | None = None,
    platforms: Sequence[str] = ("tpu", "cpu"),
    dtype=jnp.float32,
    mlir_out: str | None = None,
):
    """Export ``fn`` — a (B, in_dim) → (B, out) pure forward whose weights
    are already bound (closure-captured arrays become embedded constants;
    for *export* that is the point: the artifact must be self-contained) —
    to ``out_path`` as serialized StableHLO.

    ``batch=None`` exports a symbolic batch dimension ``b``; an integer
    pins the shape (useful when the consumer wants exactly one executable
    and padding at the edge, the links-lift chunking discipline).

    Returns the ``jax.export.Exported`` (for callers that want
    ``.mlir_module()`` or immediate ``.call``) and the serialized size.
    """
    if batch is None:
        (b,) = jax_export.symbolic_shape("b")
        shape = (b, in_dim)
    else:
        shape = (int(batch), in_dim)
    exp = jax_export.export(jax.jit(fn), platforms=tuple(platforms))(
        jax.ShapeDtypeStruct(shape, dtype)
    )
    data = exp.serialize()
    tmp = out_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, out_path)  # atomic: never leave a torn artifact
    if mlir_out:
        with open(mlir_out, "w") as f:
            f.write(exp.mlir_module())
    return exp, len(data)


def deserialize_exported(path: str):
    """Deserialize a serving artifact to the full ``jax.export.Exported``
    (``.call``, ``.platforms``, ``.in_avals`` — one read, one deserialize;
    links-serve uses this to avoid loading the multi-MB file twice)."""
    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())


def load_exported(path: str) -> Callable:
    """Deserialize a serving artifact into a plain callable.

    The returned function takes a (B, in_dim) array (B matching the
    exported batch — anything ≥1 for symbolic exports) and runs the
    embedded StableHLO on the current default JAX platform, which must be
    one of the platforms the artifact was lowered for.
    """
    return deserialize_exported(path).call


def exported_info(path: str) -> dict:
    """Inspect an artifact without running it (the ``links-export
    --inspect`` surface): platforms, input/output avals, sizes."""
    with open(path, "rb") as f:
        data = f.read()
    exp = jax_export.deserialize(data)
    return {
        "path": path,
        "bytes": len(data),
        "platforms": list(exp.platforms),
        "inputs": [str(a) for a in exp.in_avals],
        "outputs": [str(a) for a in exp.out_avals],
        "calling_convention_version": exp.calling_convention_version,
    }
