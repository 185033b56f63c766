from adm_tpu.parallel.mesh import (
    make_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
)
from adm_tpu.parallel.fsdp import (
    fsdp_param_shardings,
    fsdp_state_shardings,
)
from adm_tpu.parallel.tp import tp_param_shardings, tp_state_shardings

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "shard_batch",
    "fsdp_param_shardings",
    "fsdp_state_shardings",
    "tp_param_shardings",
    "tp_state_shardings",
]
