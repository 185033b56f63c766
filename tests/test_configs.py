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
        if model_cfg["class_name"].endswith("AutoencoderKL"):
            from adm_tpu.cli.train_vae import build_vae

            module = build_vae(model_cfg)
            assert module.down_ratio >= 2
            return
        if "first_stage" in model_cfg:
            from adm_tpu.cli.train_vae import build_vae
            from adm_tpu.vae.autoencoder import FirstStage

            fs = FirstStage(build_vae(model_cfg["first_stage"]))
            model = build_model(model_cfg, first_stage=fs)
        else:
            model = build_model(model_cfg)
        assert model.sampling_timesteps > 0
        # unet constructs standalone too
        build_unet(model_cfg["unet"])
    finally:
        os.environ.pop("ADM_TPU_DISABLE_LPIPS", None)
