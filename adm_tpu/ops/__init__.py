from adm_tpu.ops.upfirdn2d import upfirdn2d, setup_filter
from adm_tpu.ops.fused_act import fused_leaky_relu

__all__ = ["upfirdn2d", "setup_filter", "fused_leaky_relu"]
