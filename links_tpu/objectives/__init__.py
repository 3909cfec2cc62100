from links_tpu.objectives.flow_nll import full_flow_loss, part_flows_loss  # noqa: F401
from links_tpu.objectives.lifter import (  # noqa: F401
    LifterFrozen,
    augment_with_samples,
    left_right_loss,
    leg_torso_loss,
    lift_left_right_eval,
    lift_leg_torso_eval,
    reconstruct_3d,
    sample_rotation,
)
from links_tpu.objectives.occlusion import (  # noqa: F401
    completer_losses,
    occlusion_loss,
    part_inputs,
    part_targets,
    pseudo_3d_from_lifters,
)
