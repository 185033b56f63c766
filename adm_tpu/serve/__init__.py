from adm_tpu.serve.export import (
    aot_compile_sampler,
    export_sampler,
    load_sampler,
)

__all__ = ["export_sampler", "load_sampler", "aot_compile_sampler"]
