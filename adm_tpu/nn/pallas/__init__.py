from adm_tpu.nn.pallas.groupnorm import fused_groupnorm_silu

__all__ = ["fused_groupnorm_silu"]
