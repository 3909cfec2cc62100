from links_tpu.train.loop import make_epoch_fn, run_training  # noqa: F401
from links_tpu.train.optim import make_optimizer  # noqa: F401
from links_tpu.train.parallel import (  # noqa: F401
    dp_epoch_fn,
    dp_jit_step,
    dp_shard_map_step,
    make_mesh,
    replicate,
    shard_batch,
)
from links_tpu.train.steps import (  # noqa: F401
    TrainState,
    build_full_flow_step,
    build_left_right_step,
    build_leg_torso_step,
    build_occlusion_step,
    build_part_flows_step,
    init_state,
)
