from links_tpu.ckpt.export_io import (  # noqa: F401
    deserialize_exported,
    export_serving,
    exported_info,
    load_exported,
)
from links_tpu.ckpt.orbax_io import (  # noqa: F401
    restore_checkpoint,
    restore_rng_key,
    save_checkpoint,
    wait_for_saves,
)
from links_tpu.ckpt.torch_io import (  # noqa: F401
    completer_from_torch,
    completer_to_torch,
    flow_from_torch,
    flow_to_torch,
    lifter_from_torch,
    lifter_to_torch,
    load_completer_pt,
    load_flow_pt,
    load_lifter_pt,
    save_pt,
)
