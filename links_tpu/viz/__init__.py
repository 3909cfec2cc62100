from links_tpu.viz.latent import visualise_flow_samples  # noqa: F401
from links_tpu.viz.prediction import visualise_occlusion, visualise_prediction  # noqa: F401
from links_tpu.viz.skeletons import (  # noqa: F401
    compare_poses_3d,
    expand_to_32_slots,
    plot_skeleton_2d,
    plot_skeleton_3d,
    plot_skeleton_3d_32slot,
    render_comparison_video,
    render_multi_video,
)
