from adm_tpu.core.processes import (
    ConstProcess,
    Const2Process,
    LinearProcess,
    ResidualProcess,
    get_process,
)
from adm_tpu.core import sampling

__all__ = [
    "ConstProcess",
    "Const2Process",
    "LinearProcess",
    "ResidualProcess",
    "get_process",
    "sampling",
]
