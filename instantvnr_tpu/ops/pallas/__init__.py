from instantvnr_tpu.ops.pallas.fused_mlp import fused_mlp_apply  # noqa: F401
