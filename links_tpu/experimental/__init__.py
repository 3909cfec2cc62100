from links_tpu.ops.pallas_resblock import fused_res_block, res_block_reference  # noqa: F401
