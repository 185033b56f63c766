"""Every shipped config must construct its model through the registry."""

import glob
import os

import pytest

from adm_tpu.utils.config import build_model, build_unet, load_conf

CONFIGS = sorted(
    glob.glob(
        os.path.join(os.path.dirname(__file__), "..", "adm_tpu", "configs",
                     "**", "*.yaml"),
        recursive=True,
    )
)


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(c) for c in CONFIGS])
def test_config_builds(path):
    os.environ["ADM_TPU_DISABLE_LPIPS"] = "1"  # skip VGG init in config tests
    try:
        cfg = load_conf(path)
        model_cfg = cfg["model"]
        from adm_tpu.utils.config import is_vae_config

        if is_vae_config(model_cfg):
            from adm_tpu.cli.train_vae import build_vae

            module = build_vae(model_cfg)
            assert module.down_ratio >= 2
            return
        from adm_tpu.cli.train_vae import build_vae
        from adm_tpu.vae.autoencoder import FirstStage

        # locate a first_stage section through any of the three conventions
        search = dict(model_cfg)
        search.update(search.get("params", {}))
        fs = None
        if "first_stage" in search:
            fs = FirstStage(build_vae(search["first_stage"]))
        elif "first_stage_config" in search:
            fs_cfg = search["first_stage_config"]
            fs = FirstStage(build_vae(fs_cfg.get("params", fs_cfg)))
        model = build_model(model_cfg, first_stage=fs)
        assert model.sampling_timesteps > 0
        # the plain-class_name unet section constructs standalone too
        if "unet" in model_cfg and "class_name" in model_cfg.get("unet", {}):
            build_unet(model_cfg["unet"])
    finally:
        os.environ.pop("ADM_TPU_DISABLE_LPIPS", None)
