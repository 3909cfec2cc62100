from links_tpu.flows.coupling import Flow, init_block, init_flow  # noqa: F401
from links_tpu.flows.sequence import (  # noqa: F401
    draw_samples,
    forward,
    inverse,
    nll,
    soft_cap_nll,
)

# Flow dimensionalities used by the pipeline (SURVEY.md §2.5).
FULL_DIM = 34
SIDE_DIM = 22  # left / right
LEG_DIM = 14
TORSO_DIM = 20
