"""Config system: the reference's YAML schema driving JAX factories.

The reference instantiates classes reflectively from dotted `class_name`
paths (ddm/utils.py:94-161, train_uncond_dpm.py:28-50). We keep the exact
YAML section names and keys — the same config files drive our CLIs — but map
class names through an explicit registry instead of blind import-reflection
(the fork's broken-import configs, SURVEY.md section 0, then resolve to the
working implementations).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional

import jax.numpy as jnp
import yaml

from adm_tpu.core.diffusion import DDPM, LatentDiffusion
from adm_tpu.nn.unets import EDMPrecond

log = logging.getLogger("adm_tpu")


def load_conf(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f)


def is_vae_config(model_cfg: Dict[str, Any]) -> bool:
    """True for first-stage AutoencoderKL training configs — either the
    class_name form (reference configs/celebahq/celeb_ae_kl_256x256_d4.yaml)
    or the edge-detection form with a bare ddconfig and no class_name
    (configs/edge_detection/ae_kl_320x320_d4.yaml)."""
    cn = model_cfg.get("class_name", "")
    if cn.endswith("AutoencoderKL"):
        return True
    return "ddconfig" in model_cfg and not cn and "target" not in model_cfg


# ---------------------------------------------------------------------------
# UNet registry: reference class_name -> (variant, n_decoders, skip_tuning)
# ---------------------------------------------------------------------------

_UNET_VARIANTS = {
    "unet.uncond_unet.EDMPrecond": dict(variant="const", n_decoders=2),
    "unet.uncond_unet_2.EDMPrecond": dict(variant="const2", n_decoders=2),
    "unet.uncond_unet_sd.EDMPrecond": dict(variant="const", n_decoders=1),
    "unet.uncond_unet_sd_2.EDMPrecond": dict(variant="const2", n_decoders=1),
    "unet.uncond_unet_sd_3.EDMPrecond": dict(
        variant="const2", n_decoders=1, skip_tuning=True
    ),
    # native names
    "adm_tpu.EDMPrecond": dict(variant="const", n_decoders=2),
    # the fork's PL config names its external adm_unet re-export of the same
    # two-decoder EDMPrecond (uncond_ddm_ldm_pl.yaml:62 comments the in-repo
    # unet.uncond_unet.EDMPrecond equivalence)
    "ldm.modules.diffusionmodules.adm_unet.EDMPrecond": dict(
        variant="const", n_decoders=2
    ),
}

_MODEL_KWARG_KEYS = (
    "model_channels",
    "channel_mult",
    "channel_mult_emb",
    "num_blocks",
    "attn_resolutions",
    "dropout",
    "label_dropout",
    "augment_dim",
    # TPU perf knobs (adm_tpu extensions)
    "use_flash_attention",
    "use_pallas_attention",
    "use_fused_block",
    "use_hw_dropout",
    "remat",
    "channel_round",
)
_SONG_KWARG_KEYS = (
    "embedding_type",
    "channel_mult_noise",
    "encoder_type",
    "decoder_type",
    "resample_filter",
)


_COND_UNETS = {
    "unet.cond_unet.Unet": dict(n_decoders=2),
    "unet.cond_unet_sd.Unet": dict(n_decoders=1),
    "unet.text_cond_unet.Unet": dict(n_decoders=1),
    # stale fork names with no module in the reference repo (SURVEY.md
    # section 0) — mapped onto the live two-decoder conditional UNet, the
    # architecture every runnable conditional config uses:
    "unet.cond_unet2.Unet": dict(n_decoders=2),  # depth configs
    "unet.cond_unet3.Unet": dict(n_decoders=2),  # depth LDM config
    "unet.cond_unet5.Unet": dict(n_decoders=2),  # inpainting filenames
    "unet.cond_unet6.Unet": dict(n_decoders=2),  # edge/sketch configs
}

_T2I_UNETS = {"unet.cond_unet_t2i.Unet"}


def build_t2i_unet(unet_cfg, dtype=jnp.float32):
    from adm_tpu.nn.t2i_unet import Text2ImgUnet

    cfg = dict(unet_cfg)
    cfg.pop("class_name")
    keys = ("dim", "init_dim", "out_dim", "dim_mults", "channels", "out_mul",
            "resnet_block_groups", "window_sizes1", "fourier_scale",
            "precondition", "text_dim")
    kwargs = {}
    for k in keys:
        if k in cfg and cfg[k] is not None:
            v = cfg[k]
            if isinstance(v, list):
                v = tuple(tuple(e) if isinstance(e, list) else e for e in v)
            kwargs[k] = v
    # small default text tower when no converted CLIP weights are supplied
    kwargs.setdefault(
        "text_encoder_cfg",
        dict(vocab_size=512, layers=cfg.get("text_layers", 4), width=256,
             heads=4),
    )
    return Text2ImgUnet(dtype=dtype, **kwargs)


def build_cond_unet(unet_cfg: Dict[str, Any], dtype=jnp.float32):
    from adm_tpu.nn.cond_unet import CondUnet

    cfg = dict(unet_cfg)
    class_name = cfg.pop("class_name")
    reg = _COND_UNETS[class_name]
    keys = (
        "dim",
        "init_dim",
        "out_dim",
        "dim_mults",
        "cond_in_dim",
        "channels",
        "out_mul",
        "resnet_block_groups",
        "window_sizes1",
        "window_sizes2",
        "fourier_scale",
        "cond_net",
        "precondition",
    )
    kwargs = {}
    for k in keys:
        if k in cfg and cfg[k] is not None:
            v = cfg[k]
            if isinstance(v, list):
                v = tuple(tuple(e) if isinstance(e, list) else e for e in v)
            kwargs[k] = v
    return CondUnet(dtype=dtype, **kwargs, **reg)


def build_unet(unet_cfg: Dict[str, Any], dtype=jnp.float32) -> EDMPrecond:
    cfg = dict(unet_cfg)
    class_name = cfg.pop("class_name")
    if class_name in _T2I_UNETS:
        return build_t2i_unet(unet_cfg, dtype=dtype)
    if class_name in _COND_UNETS:
        return build_cond_unet(unet_cfg, dtype=dtype)
    if class_name not in _UNET_VARIANTS:
        raise KeyError(f"unknown unet class_name '{class_name}'")
    reg = dict(_UNET_VARIANTS[class_name])
    skip_tuning = reg.pop("skip_tuning", False)

    model_type = cfg.get("model_type", "DhariwalUNet")
    mk_keys = _MODEL_KWARG_KEYS + (_SONG_KWARG_KEYS if model_type == "SongUNet" else ())
    model_kwargs = {k: _to_tuple(cfg[k]) for k in mk_keys if k in cfg}
    if skip_tuning:
        model_kwargs["skip_tuning"] = True

    return EDMPrecond(
        img_resolution=cfg["img_resolution"],
        img_channels=cfg["img_channels"],
        label_dim=cfg.get("label_dim", 0),
        sigma_data=cfg.get("sigma_data", 0.5),
        model_type=model_type,
        precondition=cfg.get("precondition", True),
        out_mul=cfg.get("out_mul", 1),
        dtype=dtype,
        model_kwargs=model_kwargs,
        **reg,
    )


def _to_tuple(v):
    return tuple(v) if isinstance(v, list) else v


# ---------------------------------------------------------------------------
# Process/model registry
# ---------------------------------------------------------------------------

_PROCESS_BY_CLASS = {
    "ddm.ddm_const.DDPM": ("const", DDPM),
    "ddm.ddm_const.LatentDiffusion": ("const", LatentDiffusion),
    "ddm.ddm_const_2.DDPM": ("const2", DDPM),
    "ddm.ddm_const_2.LatentDiffusion": ("const2", LatentDiffusion),
    "ddm.ddm_linear.DDPM": ("linear", DDPM),
    "ddm.ddm_linear.LatentDiffusion": ("linear", LatentDiffusion),
    "ddm.ddm_res.DDPM": ("res", DDPM),
    "ddm.ddm_res.LatentDiffusion": ("res", LatentDiffusion),
    # stale fork names without modules in the reference repo (SURVEY.md
    # section 0: "these are stale; the build targets only what exists") —
    # mapped onto the sqrt(t)-noise const family they forked from:
    "ddm.ddm_const3.DDPM": ("const", DDPM),
    "ddm.ddm_const3.LatentDiffusion": ("const", LatentDiffusion),
    "ddm.ddm_const4.DDPM": ("const", DDPM),
    "ddm.ddm_const4.LatentDiffusion": ("const", LatentDiffusion),
}


def normalize_model_cfg(model_cfg: Dict[str, Any]):
    """Flatten the three reference `model:` conventions to
    (class_name, flat_cfg):
      * `class_name:` (the live train scripts, train_uncond_dpm.py:42-47);
      * `target:`/`params:` (the fork's PL config, uncond_ddm_ldm_pl.yaml:2-3)
        — first_stage_config/unet_config nest under params;
      * `model_type:`/`model_name:` (the edge-detection configs,
        configs/edge_detection/cond_const_sde4_unet6.yaml:2-3) — model_type
        'const_sde*' maps to the sqrt(t) const family, model_name
        'cond_unetN' synthesizes the conditional unet class_name.
    """
    cfg = dict(model_cfg)
    if "target" in cfg and "class_name" not in cfg:
        class_name = cfg.pop("target")
        cfg.update(cfg.pop("params", {}))
        cfg.pop("class_name", None)  # PL params may repeat it
        if "first_stage_config" in cfg and "first_stage" not in cfg:
            fs_cfg = cfg.pop("first_stage_config")
            cfg["first_stage"] = dict(fs_cfg.get("params", fs_cfg))
        if "unet_config" in cfg and "unet" not in cfg:
            u_cfg = cfg.pop("unet_config")
            unet = dict(u_cfg.get("params", u_cfg))
            unet.setdefault("class_name", u_cfg.get("target"))
            cfg["unet"] = unet
    elif "class_name" not in cfg and "model_type" in cfg:
        mt = cfg.pop("model_type")
        if not str(mt).startswith("const"):
            raise KeyError(f"unknown edge-style model_type '{mt}'")
        class_name = (
            "ddm.ddm_const.LatentDiffusion"
            if "first_stage" in cfg
            else "ddm.ddm_const.DDPM"
        )
        model_name = cfg.pop("model_name", None)
        if model_name and "class_name" not in cfg.get("unet", {}):
            cfg["unet"] = dict(cfg["unet"])
            cfg["unet"]["class_name"] = f"unet.{model_name}.Unet"
    else:
        class_name = cfg.pop("class_name")
    return class_name, cfg


def build_model(
    model_cfg: Dict[str, Any],
    net=None,
    first_stage=None,
    perceptual_fn=None,
    augment_fn=None,
    dtype=jnp.float32,
):
    """Construct DDPM/LatentDiffusion from the reference `model:` section
    (conventions per normalize_model_cfg)."""
    class_name, cfg = normalize_model_cfg(model_cfg)
    if class_name not in _PROCESS_BY_CLASS:
        raise KeyError(f"unknown model class_name '{class_name}'")
    process_name, cls = _PROCESS_BY_CLASS[class_name]
    if cls is LatentDiffusion and first_stage is None and "first_stage" not in cfg:
        # the reference's NYUD_ddm_const4_dpm_wby.yaml declares a
        # LatentDiffusion with NO first_stage section (its scale keys are
        # commented out) — it is effectively the image-space DDPM
        log.warning(
            "%s has no first_stage section; building image-space DDPM",
            class_name,
        )
        cls = DDPM

    # loss_main sub-config selects the main regression loss
    # (ddm/loss.py: MSE_Loss / MAE_Loss / MEADSTD_TANH_NORM_Loss)
    loss_main = "l2"
    loss_main_kwargs = None
    lm = cfg.get("loss_main")
    if isinstance(lm, dict):
        lm_name = str(lm.get("class_name", ""))
        if "MEADSTD" in lm_name:
            loss_main = "meadstd"
            loss_main_kwargs = {
                k: lm[k]
                for k in ("valid_threshold", "max_threshold", "with_sigmoid")
                if k in lm
            }
        elif "MAE" in lm_name:
            loss_main = "l1"

    if net is None:
        net = build_unet(cfg["unet"], dtype=dtype)

    cond_shape = None
    cond_dtype = "float32"
    if cfg["unet"].get("class_name") in _COND_UNETS:
        h, w = cfg.get("image_size", (32, 32))
        cond_shape = (h, w, cfg["unet"].get("cond_in_dim", 1))
    elif cfg["unet"].get("class_name") in _T2I_UNETS:
        cond_shape = (cfg["unet"].get("context_length", 77),)
        cond_dtype = "int32"

    if perceptual_fn is None and float(cfg.get("perceptual_weight", 0.0)) > 0:
        import os

        if os.environ.get("ADM_TPU_DISABLE_LPIPS"):
            log.warning("perceptual_weight > 0 but LPIPS disabled via env")
        else:
            from adm_tpu.metrics.lpips import build_lpips_params, make_perceptual_fn

            if not os.environ.get("ADM_TPU_VGG16_WEIGHTS") and not os.environ.get(
                "ADM_TPU_ALLOW_RANDOM_LPIPS"
            ):
                # a random perceptual net silently corrupts training — the
                # reference always ships real lpips weights (taming/
                # modules/losses/lpips.py:10-54), so hard-fail unless the
                # user explicitly opts in
                raise RuntimeError(
                    "perceptual_weight > 0 but no VGG16 weights: set "
                    "ADM_TPU_VGG16_WEIGHTS to a converted torchvision vgg16 "
                    ".npz (cli/convert_weights.py), or force random weights "
                    "with ADM_TPU_ALLOW_RANDOM_LPIPS=1, or disable with "
                    "ADM_TPU_DISABLE_LPIPS=1"
                )
            lp = build_lpips_params()
            perceptual_fn = make_perceptual_fn(lp)
            if not os.environ.get("ADM_TPU_VGG16_WEIGHTS"):
                log.warning(
                    "LPIPS running with RANDOM VGG16 backbone weights "
                    "(ADM_TPU_ALLOW_RANDOM_LPIPS override)"
                )

    if augment_fn is None and cfg.get("use_augment", False):
        from adm_tpu.core.augment import AugmentPipe

        # reference: p=0.15 for const, p=0.12 for const2
        # (ddm/ddm_const.py:179-181, ddm/ddm_const_2.py:112-113)
        p = 0.15 if process_name == "const" else 0.12
        augment_fn = AugmentPipe(p=p)

    common = dict(
        cond_shape=cond_shape,
        cond_dtype=cond_dtype,
        net=net,
        process_name=process_name,
        image_size=tuple(cfg.get("image_size", (32, 32))),
        channels=cfg["unet"].get("img_channels", cfg["unet"].get("channels", 3)),
        sampling_timesteps=cfg.get("sampling_timesteps", 10),
        eps=float(cfg.get("eps", 1e-4)),
        sigma_min=float(cfg.get("sigma_min", 1e-2)),
        sigma_max=float(cfg.get("sigma_max", 1.0)),
        weighting_loss=bool(cfg.get("weighting_loss", False)),
        use_l1=bool(cfg.get("use_l1", False)),
        loss_main=loss_main,
        loss_main_kwargs=loss_main_kwargs,
        perceptual_weight=float(cfg.get("perceptual_weight", 0.0)),
        clip_x_start=bool(cfg.get("clip_x_start", True)),
        scale_input=float(cfg.get("scale_input", 1.0)),
        start_dist=cfg.get("start_dist", "normal"),
        sample_type=cfg.get("sample_type", "deterministic"),
        perceptual_fn=perceptual_fn,
        augment_fn=augment_fn,
    )
    if cls is LatentDiffusion:
        return LatentDiffusion(
            first_stage=first_stage,
            scale_factor=float(cfg.get("scale_factor", 1.0)),
            scale_by_std=bool(cfg.get("scale_by_std", True)),
            scale_by_softsign=bool(cfg.get("scale_by_softsign", False)),
            use_disloss=bool(cfg.get("use_disloss", False)),
            **common,
        )
    return DDPM(**common)


# ---------------------------------------------------------------------------
# Dataset registry
# ---------------------------------------------------------------------------


# edge-style `data: name:` sections (configs/edge_detection/*.yaml) name
# the task, not a class; map onto the matching dataset
_DATA_NAME_MAP = {
    "edge": "EdgeDataset",
    "cityscapes": "CityscapesDataset",
    "ade20k": "ADE20KDataset",
    "sr": "SRDataset",
    "duts": "DUTSDataset",
    "sketch": "SketchDataset",
    "nyud": "NYUDv2DepthDataset",
}


def build_dataset(data_cfg: Dict[str, Any]):
    from adm_tpu import data as data_mod

    cfg = dict(data_cfg)
    if "class_name" in cfg:
        name = cfg.pop("class_name").rsplit(".", 1)[-1]
    elif "name" in cfg:
        task = cfg.pop("name")
        if task not in _DATA_NAME_MAP:
            raise KeyError(f"unknown dataset task name '{task}'")
        name = _DATA_NAME_MAP[task]
    else:
        raise KeyError("data section needs class_name or name")
    cfg.pop("batch_size", None)
    cfg.pop("num_workers", None)
    if name == "WebdatasetReader":
        from adm_tpu.data.webdata import WebdatasetReader

        return WebdatasetReader(**cfg)
    if not hasattr(data_mod, name):
        raise KeyError(f"unknown dataset class '{name}'")
    return getattr(data_mod, name)(**cfg)
