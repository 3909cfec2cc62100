from links_tpu.models.attention import (  # noqa: F401
    attention_lifter_apply,
    init_attention_lifter,
)
from links_tpu.models.completers import (  # noqa: F401
    COMPLETER_SPECS,
    completer_apply,
    init_all_completers,
    init_completer,
)
from links_tpu.models.lifters import (  # noqa: F401
    init_lifter,
    init_pose_discriminator,
    init_res_block,
    lifter_apply,
    pose_discriminator_apply,
    res_block_apply,
)

# Lifter joint counts (SURVEY.md §2.4).
LEG_JOINTS = 7
TORSO_JOINTS = 10
SIDE_JOINTS = 11
FULL_JOINTS = 17
