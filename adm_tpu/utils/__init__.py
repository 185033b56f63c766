from adm_tpu.utils.config import load_conf, build_unet, build_model, build_dataset

__all__ = ["load_conf", "build_unet", "build_model", "build_dataset"]
