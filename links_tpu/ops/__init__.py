"""TPU Pallas kernels on the serving path (opt-in; see PERF.md)."""

from links_tpu.ops.fused_infer import (  # noqa: F401
    fused_sides_forward,
    lift_left_right_eval_fused,
    prepare_fused_weights,
)
