"""Experimental TPU kernels — NOT on the flagship path.

``pallas_resblock`` is a correct fused res-block Pallas kernel (fwd + bwd
with recompute) that was demoted from the production models in round 2
(VERDICT r1 next #6): the stage-3a step is HBM-bound on res-block *weight*
traffic — 14 blocks × 2×1024² params must stream from HBM once per pass no
matter how the elementwise work is fused — so the kernel cannot beat XLA
where it matters and measured slower at every flagship batch size
(PERF.md: 61.7k vs 90.1k poses/s at batch 256 under ``--pallas``; the
isolated kernel loses at batch ≥ 4096). It is kept as working reference
material for genuinely fusion-bound kernels, with interpret-mode tests
(tests/test_pallas_ops.py).

``experimental_res_block_apply`` (below) is the supported way to run a
res-block param dict through the kernel; the production
``res_block_apply`` carries no Pallas routing.
"""

import jax

from links_tpu.experimental.pallas_resblock import (  # noqa: F401
    fused_res_block,
    res_block_reference,
)


def experimental_res_block_apply(p, x, compute_dtype=None, tile: int = 256):
    """Run a plain res-block param dict through the fused Pallas kernel
    (interpret mode off-TPU). LayerNorm/dropout variants are not supported —
    use links_tpu.models.res_block_apply."""
    if "ln1" in p:
        raise ValueError("fused kernel supports the plain res_block only")
    cd = compute_dtype or x.dtype
    y = fused_res_block(
        x.astype(cd), p["l1"]["w"].astype(cd), p["l1"]["b"],
        p["l2"]["w"].astype(cd), p["l2"]["b"],
        tile, jax.default_backend() != "tpu",
    )
    return y.astype(x.dtype)
