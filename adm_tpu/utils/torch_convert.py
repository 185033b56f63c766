"""One-way torch -> JAX weight conversion for reference checkpoints.

Maps the reference's state_dict naming (unet/uncond_unet.py EDMPrecond /
DhariwalUNet, ddm/encoder_decoder.py AutoencoderKL) onto adm_tpu's flax
param trees, enabling (a) loading released DDM checkpoints and (b) seed
parity tests that run the actual torch reference side-by-side.

Conventions:
  torch Linear weight (out,in)        -> jax kernel (in,out)
  torch Conv2d weight (O,I,kh,kw)     -> jax kernel (kh,kw,I,O)
  torch GroupNorm weight/bias         -> jax scale/bias
  qkv conv channels: the reference reshapes (B,3C,HW) ->
  (B*heads, C/heads, 3, HW), i.e. channel index = (head*(C/h) + ch)*3 + q;
  ours is head-major then qkv then ch — permuted here.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t_linear(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _t_conv(w):
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def _qkv_permutation(c: int, heads: int) -> np.ndarray:
    """Output-channel permutation torch->ours for the fused qkv conv."""
    d = c // heads
    perm = np.zeros(3 * c, np.int64)
    for head in range(heads):
        for q in range(3):
            for ch in range(d):
                ours = (head * 3 + q) * d + ch
                theirs = (head * d + ch) * 3 + q
                perm[ours] = theirs
    return perm


def _convert_unet_block(
    sd: Dict, prefix: str, heads: int = 0, channels_per_head: int = 64
) -> Dict:
    out = {
        "norm0": {"scale": np.asarray(sd[f"{prefix}.norm0.weight"]),
                  "bias": np.asarray(sd[f"{prefix}.norm0.bias"])},
        "conv0": {"kernel": _t_conv(sd[f"{prefix}.conv0.weight"]),
                  "bias": np.asarray(sd[f"{prefix}.conv0.bias"])},
        "affine": {"kernel": _t_linear(sd[f"{prefix}.affine.weight"]),
                   "bias": np.asarray(sd[f"{prefix}.affine.bias"])},
        "norm1": {"scale": np.asarray(sd[f"{prefix}.norm1.weight"]),
                  "bias": np.asarray(sd[f"{prefix}.norm1.bias"])},
        "conv1": {"kernel": _t_conv(sd[f"{prefix}.conv1.weight"]),
                  "bias": np.asarray(sd[f"{prefix}.conv1.bias"])},
    }
    if f"{prefix}.skip.weight" in sd:
        out["skip"] = {"kernel": _t_conv(sd[f"{prefix}.skip.weight"]),
                       "bias": np.asarray(sd[f"{prefix}.skip.bias"])}
    if f"{prefix}.qkv.weight" in sd:
        qkv_w = _t_conv(sd[f"{prefix}.qkv.weight"])  # (1,1,C,3C)
        qkv_b = np.asarray(sd[f"{prefix}.qkv.bias"])
        c = qkv_w.shape[2]
        h = heads if heads else max(c // channels_per_head, 1)
        perm = _qkv_permutation(c, h)
        out["norm2"] = {"scale": np.asarray(sd[f"{prefix}.norm2.weight"]),
                        "bias": np.asarray(sd[f"{prefix}.norm2.bias"])}
        out["qkv"] = {"kernel": qkv_w[..., perm], "bias": qkv_b[perm]}
        out["proj"] = {"kernel": _t_conv(sd[f"{prefix}.proj.weight"]),
                       "bias": np.asarray(sd[f"{prefix}.proj.bias"])}
    return out


def _convert_spatial_att(sd: Dict, prefix: str) -> Dict:
    return {
        name: {"kernel": _t_conv(sd[f"{prefix}.{name}.weight"]),
               "bias": np.asarray(sd[f"{prefix}.{name}.bias"])}
        for name in ("map", "q_conv", "k_conv")
    }


# BN folding shared with the backbone converters — ONE implementation
# (backbone_convert handles torch tensors and numpy alike)
from adm_tpu.utils.backbone_convert import fold_batchnorm  # noqa: E402,F401


def convert_autoencoder_kl(sd: Dict) -> Dict:
    """Reference AutoencoderKL state_dict (ddm/encoder_decoder.py:894, also
    CompVis kl-f* checkpoints under their 'state_dict' key) -> flax params
    for adm_tpu.vae.AutoencoderKL."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in sd.items()}

    def conv(prefix):
        return {"kernel": _t_conv(sd[f"{prefix}.weight"]),
                "bias": np.asarray(sd[f"{prefix}.bias"])}

    def norm(prefix):
        return {"scale": np.asarray(sd[f"{prefix}.weight"]),
                "bias": np.asarray(sd[f"{prefix}.bias"])}

    def resblock(tp):
        out = {"norm1": norm(f"{tp}.norm1"), "conv1": conv(f"{tp}.conv1"),
               "norm2": norm(f"{tp}.norm2"), "conv2": conv(f"{tp}.conv2")}
        if f"{tp}.nin_shortcut.weight" in sd:
            out["nin_shortcut"] = conv(f"{tp}.nin_shortcut")
        if f"{tp}.conv_shortcut.weight" in sd:
            out["conv_shortcut"] = conv(f"{tp}.conv_shortcut")
        return out

    def attnblock(tp):
        return {"norm": norm(f"{tp}.norm"), "q": conv(f"{tp}.q"),
                "k": conv(f"{tp}.k"), "v": conv(f"{tp}.v"),
                "proj_out": conv(f"{tp}.proj_out")}

    def tower(side):  # 'encoder' | 'decoder'
        out = {"conv_in": conv(f"{side}.conv_in"),
               "norm_out": norm(f"{side}.norm_out"),
               "conv_out": conv(f"{side}.conv_out"),
               "mid_block_1": resblock(f"{side}.mid.block_1"),
               "mid_attn_1": attnblock(f"{side}.mid.attn_1"),
               "mid_block_2": resblock(f"{side}.mid.block_2")}
        key = "down" if side == "encoder" else "up"
        lvl = 0
        while f"{side}.{key}.{lvl}.block.0.norm1.weight" in sd:
            blk = 0
            while f"{side}.{key}.{lvl}.block.{blk}.norm1.weight" in sd:
                out[f"{key}_{lvl}_block_{blk}"] = resblock(
                    f"{side}.{key}.{lvl}.block.{blk}")
                if f"{side}.{key}.{lvl}.attn.{blk}.norm.weight" in sd:
                    out[f"{key}_{lvl}_attn_{blk}"] = attnblock(
                        f"{side}.{key}.{lvl}.attn.{blk}")
                blk += 1
            if f"{side}.{key}.{lvl}.downsample.conv.weight" in sd:
                out[f"down_{lvl}_downsample"] = {
                    "conv": conv(f"{side}.{key}.{lvl}.downsample.conv")}
            if f"{side}.{key}.{lvl}.upsample.conv.weight" in sd:
                out[f"up_{lvl}_upsample"] = {
                    "conv": conv(f"{side}.{key}.{lvl}.upsample.conv")}
            lvl += 1
        return out

    return {"params": {
        "encoder": tower("encoder"),
        "decoder": tower("decoder"),
        "quant_conv": conv("quant_conv"),
        "post_quant_conv": conv("post_quant_conv"),
    }}


def convert_reference_checkpoint(path: str, use_ema: bool = True) -> Dict:
    """Load a reference trainer checkpoint (torch.save of {step, model, opt,
    lr_scheduler, ema, scaler} — train_uncond_dpm.py:211-220) and convert the
    diffusion model weights to a flax param tree. EMA keys use the
    'ema_model.' prefix (ddm/ddm_const_2.py:119-131)."""
    import torch

    data = torch.load(path, map_location="cpu")
    if use_ema and "ema" in data:
        sd = {k[len("ema_model."):]: v for k, v in data["ema"].items()
              if k.startswith("ema_model.")}
    else:
        sd = data["model"] if "model" in data else data
    # strip the process-level 'model.' nesting if the ckpt stores the full
    # DDPM module (model.model.* = uncond net, model.relation_layers_down.*
    # / model.init_conv_mask.* = cond net; loose keys like eps are
    # process-level buffers)
    if any(k.startswith(("model.model.", "model.relation_layers_down."))
           for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items()
              if k.startswith("model.")}
    if any(k.startswith("relation_layers_down.") for k in sd):
        # conditional family (unet/cond_unet_sd.py): detect the backbone
        # kind from its signature keys and the level count from projects.*
        if any(k.startswith("init_conv_mask.features.") for k in sd):
            cond_net = "swin"
        elif any(k.startswith("init_conv_mask.layer1.") for k in sd):
            cond_net = "resnet"
        else:
            cond_net = "effnet"
        n = 1 + max(int(k.split(".")[1]) for k in sd
                    if k.startswith("projects."))
        n_dec = 2 if any(k.startswith("ups2.") for k in sd) else 1
        return convert_cond_unet_sd(sd, dim_mults=(1,) * n,
                                    cond_net=cond_net, n_decoders=n_dec)
    return convert_dhariwal_edm(sd)


def convert_dhariwal_edm(sd: Dict, channels_per_head: int = 64) -> Dict:
    """Convert a reference EDMPrecond(DhariwalUNet) state_dict (possibly
    torch tensors) to the adm_tpu EDMPrecond param tree {'params': ...}."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in sd.items()}
    model: Dict = {}

    # mapping layers
    if "model.map_augment.weight" in sd:
        model["map_augment"] = {"kernel": _t_linear(sd["model.map_augment.weight"])}
    model["map_layer0"] = {"kernel": _t_linear(sd["model.map_layer0.weight"]),
                           "bias": np.asarray(sd["model.map_layer0.bias"])}
    model["map_layer1"] = {"kernel": _t_linear(sd["model.map_layer1.weight"]),
                           "bias": np.asarray(sd["model.map_layer1.bias"])}
    if "model.map_label.weight" in sd:
        model["map_label"] = {"kernel": _t_linear(sd["model.map_label.weight"])}

    # encoder / decoders / decouple / out heads
    keys = list(sd.keys())
    for k in keys:
        parts = k.split(".")
        if len(parts) < 3 or parts[0] != "model":
            continue
        section = parts[1]
        if section in ("enc", "dec", "dec2"):
            block_name = parts[2]  # e.g. '32x32_block0'
            res = block_name.split("x")[0]
            rest = block_name.split("_", 1)[1]
            prefix_map = {"enc": "enc", "dec": "dec", "dec2": "dec2"}
            ours = f"{prefix_map[section]}_{res}_{rest}"
            if ours in model:
                continue
            tprefix = f"model.{section}.{block_name}"
            if rest == "conv":
                model[ours] = {"kernel": _t_conv(sd[f"{tprefix}.weight"]),
                               "bias": np.asarray(sd[f"{tprefix}.bias"])}
            else:
                model[ours] = _convert_unet_block(
                    sd, tprefix, channels_per_head=channels_per_head
                )
    for d in ("1", "2"):
        if f"model.decouple{d}.0.weight" in sd:
            model[f"decouple{d}"] = {
                "conv": {"kernel": _t_conv(sd[f"model.decouple{d}.0.weight"]),
                         "bias": np.asarray(sd[f"model.decouple{d}.0.bias"])},
                "att": _convert_spatial_att(sd, f"model.decouple{d}.1"),
            }
    for suffix, t_suffix in (("", ""), ("2", "2")):
        nk = f"model.out_norm{t_suffix}.weight"
        if nk in sd:
            model[f"out_norm{suffix}"] = {
                "scale": np.asarray(sd[nk]),
                "bias": np.asarray(sd[f"model.out_norm{t_suffix}.bias"]),
            }
            model[f"out_conv{suffix}"] = {
                "kernel": _t_conv(sd[f"model.out_conv{t_suffix}.weight"]),
                "bias": np.asarray(sd[f"model.out_conv{t_suffix}.bias"]),
            }
    return {"params": {"model": model}}


# ---------------------------------------------------------------------------
# Conditional UNet (reference unet/cond_unet_sd.py Unet, single decoder)
# ---------------------------------------------------------------------------


def _lucid_resblock(sd: Dict, prefix: str) -> Dict:
    """lucidrains ResnetBlock (cond_unet_sd.py:444-467): mlp = Sequential(
    SiLU, Linear); block{1,2} = WeightStandardizedConv2d + GroupNorm;
    res_conv only when in/out dims differ."""
    out = {
        "mlp": {"kernel": _t_linear(sd[f"{prefix}.mlp.1.weight"]),
                "bias": np.asarray(sd[f"{prefix}.mlp.1.bias"])},
    }
    for b in ("block1", "block2"):
        out[b] = {
            "proj": {"kernel": _t_conv(sd[f"{prefix}.{b}.proj.weight"]),
                     "bias": np.asarray(sd[f"{prefix}.{b}.proj.bias"])},
            "norm": {"scale": np.asarray(sd[f"{prefix}.{b}.norm.weight"]),
                     "bias": np.asarray(sd[f"{prefix}.{b}.norm.bias"])},
        }
    if f"{prefix}.res_conv.weight" in sd:
        out["res_conv"] = {
            "kernel": _t_conv(sd[f"{prefix}.res_conv.weight"]),
            "bias": np.asarray(sd[f"{prefix}.res_conv.bias"]),
        }
    return out


def _conv_wb(sd: Dict, prefix: str) -> Dict:
    return {"kernel": _t_conv(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _lin_wb(sd: Dict, prefix: str) -> Dict:
    return {"kernel": _t_linear(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _gn_wb(sd: Dict, prefix: str) -> Dict:
    return {"scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _lin_attention(sd: Dict, prefix: str) -> Dict:
    """LinearAttention (cond_unet_sd.py:502-529): to_qkv conv (no bias),
    to_out = Sequential(Conv2d, LayerNorm(g))."""
    return {
        "to_qkv": {"kernel": _t_conv(sd[f"{prefix}.to_qkv.weight"])},
        "to_out": _conv_wb(sd, f"{prefix}.to_out.0"),
        "out_norm": {"g": np.asarray(sd[f"{prefix}.to_out.1.g"]).reshape(-1)},
    }


def _relation_net(sd: Dict, prefix: str, layers: int = 1,
                  fold_bn: bool = True) -> Dict:
    """RelationNet (cond_unet_sd.py:240-283): input_conv{1,2} =
    Sequential(Conv2d 1x1, BatchNorm2d) — BN folded to the frozen affine
    input_bn{1,2} (fold_bn=False: raw affine for batch-stats/train mode) —
    plus BasicAttetnionLayer(s) (q/k/v Linear, conv MLP, concat conv,
    GroupNorm, out conv)."""
    out = {}
    for i in (1, 2):
        out[f"input_conv{i}"] = _conv_wb(sd, f"{prefix}.input_conv{i}.0")
        # BatchNorm2d(momentum=0.03, eps=0.001) — cond_unet_sd.py:250
        bnp = f"{prefix}.input_conv{i}.1"
        out[f"input_bn{i}"] = (
            fold_batchnorm(sd, bnp, eps=1e-3) if fold_bn
            else {"scale": np.asarray(sd[f"{bnp}.weight"]),
                  "bias": np.asarray(sd[f"{bnp}.bias"])}
        )
    for a in range(layers):
        ap = f"{prefix}.attentions.{a}"
        out[f"attention_{a}"] = {
            "q_lin": _lin_wb(sd, f"{ap}.q_lin"),
            "k_lin": _lin_wb(sd, f"{ap}.k_lin"),
            "v_lin": _lin_wb(sd, f"{ap}.v_lin"),
            "mlp_fc1": _conv_wb(sd, f"{ap}.mlp.fc1"),
            "mlp_fc2": _conv_wb(sd, f"{ap}.mlp.fc2"),
            "concat_conv": _conv_wb(sd, f"{ap}.concat_conv"),
            "gn": _gn_wb(sd, f"{ap}.gn"),
            "out_conv": _conv_wb(sd, f"{ap}.out_conv"),
        }
    return out


def convert_cond_unet_sd(
    sd: Dict, dim_mults=(1, 2, 4, 4), cond_net: str = "swin",
    bn_mode: str = "frozen", n_decoders: int = 1,
) -> Dict:
    """Reference conditional Unet state_dict -> CondUnet variables.

    n_decoders=1: unet/cond_unet_sd.py (LDM conditional checkpoints);
    n_decoders=2: unet/cond_unet.py — identical trunk plus the second
    decoder groups (ups2/relation_layers_up2/decouple2/final_*2, the
    image-space train_cond_dpm pairing, e.g. saliency DUTS_ddm_const_dpm).

    Returns the full variables dict {params, buffers} for
    CondUnet(backbone_norm='frozen_bn'): the cond backbone
    ('init_conv_mask') converts via the matching backbone converter with
    BatchNorm folded to inference affines (bn_mode='batch_stats': raw
    affines for train-mode batch statistics — the twin harness's mode).
    The reference hardcodes 4 projection scales (cond_unet_sd.py:669-679)
    — len(dim_mults) must be 4.
    """
    from adm_tpu.utils.backbone_convert import (
        convert_efficientnet_b7,
        convert_resnet101,
        convert_swin_b,
    )

    # validate up front: a typo'd mode must not silently fall into the
    # batch-stats branch (code-review r4). 'frozen_bn' — the CondUnet
    # backbone_norm spelling — is accepted as an alias of 'frozen'.
    if bn_mode == "frozen_bn":
        bn_mode = "frozen"
    if bn_mode not in ("frozen", "batch_stats"):
        raise ValueError(
            f"bn_mode must be 'frozen' (alias 'frozen_bn') or "
            f"'batch_stats', got {bn_mode!r}"
        )
    if bn_mode == "batch_stats" and cond_net == "effnet":
        raise NotImplementedError(
            "convert_efficientnet_b7 always folds running stats into "
            "inference affines; feeding folded affines to train-mode batch "
            "statistics would double-normalize — use bn_mode='frozen' for "
            "the effnet backbone (swin has no BatchNorm, resnet supports "
            "both modes)"
        )

    n_levels = len(dim_mults)
    if n_levels != 4:
        raise ValueError(
            "reference cond_unet_sd supports exactly 4 levels "
            f"(hardcoded projects), got {n_levels}"
        )
    p: Dict = {
        "init_conv": _conv_wb(sd, "init_conv.0"),
        "init_norm": _gn_wb(sd, "init_conv.1"),
        "time_mlp1": _lin_wb(sd, "time_mlp.1"),
        "time_mlp2": _lin_wb(sd, "time_mlp.3"),
        "mid_block1": _lucid_resblock(sd, "mid_block1"),
        "mid_block2": _lucid_resblock(sd, "mid_block2"),
        "mid_attn_fn": {
            "to_qkv": {"kernel": _t_conv(sd["mid_attn.fn.fn.to_qkv.weight"])},
            "to_out": _conv_wb(sd, "mid_attn.fn.fn.to_out"),
        },
        "decouple1": {
            "norm": _gn_wb(sd, "decouple1.0"),
            "conv": _conv_wb(sd, "decouple1.1"),
            "att": _convert_spatial_att(sd, "decouple1.2"),
        },
        "final_res_block": _lucid_resblock(sd, "final_res_block"),
        "final_conv": _conv_wb(sd, "final_conv"),
    }
    if n_decoders == 2:
        p["decouple2"] = {
            "norm": _gn_wb(sd, "decouple2.0"),
            "conv": _conv_wb(sd, "decouple2.1"),
            "att": _convert_spatial_att(sd, "decouple2.2"),
        }
        p["final_res_block2"] = _lucid_resblock(sd, "final_res_block2")
        p["final_conv2"] = _conv_wb(sd, "final_conv2")
    p["mid_attn"] = {"norm": {"g": np.asarray(
        sd["mid_attn.fn.norm.g"]).reshape(-1)}}
    for i in range(n_levels):
        p[f"projects_{i}"] = _conv_wb(sd, f"projects.{i}")
        p[f"down_{i}_block1"] = _lucid_resblock(sd, f"downs.{i}.0")
        p[f"down_{i}_block2"] = _lucid_resblock(sd, f"downs.{i}.1")
        p[f"down_{i}_attn"] = {"norm": {"g": np.asarray(
            sd[f"downs.{i}.2.fn.norm.g"]).reshape(-1)}}
        p[f"down_{i}_attn_fn"] = _lin_attention(sd, f"downs.{i}.2.fn.fn")
        p[f"down_{i}_downsample"] = _conv_wb(sd, f"downs.{i}.3")
        p[f"relation_down_{i}"] = _relation_net(
            sd, f"relation_layers_down.{i}", fold_bn=bn_mode == "frozen")
        # Upsample = Sequential(nearest x2, Conv 3x3) except the last level
        # (plain Conv 3x3) — cond_unet_sd.py:335-341,752
        for dec, tsuf in (("", "ups"), ("2", "ups2"))[:n_decoders]:
            up_conv = (f"{tsuf}.{i}.3.1" if f"{tsuf}.{i}.3.1.weight" in sd
                       else f"{tsuf}.{i}.3")
            p[f"up{dec}_{i}_block1"] = _lucid_resblock(sd, f"{tsuf}.{i}.0")
            p[f"up{dec}_{i}_block2"] = _lucid_resblock(sd, f"{tsuf}.{i}.1")
            p[f"up{dec}_{i}_attn"] = {"norm": {"g": np.asarray(
                sd[f"{tsuf}.{i}.2.fn.norm.g"]).reshape(-1)}}
            p[f"up{dec}_{i}_attn_fn"] = _lin_attention(sd, f"{tsuf}.{i}.2.fn.fn")
            p[f"up{dec}_{i}_upsample"] = _conv_wb(sd, up_conv)
            p[f"relation_up{dec}_{i}"] = _relation_net(
                sd, f"relation_layers_up{dec}.{i}",
                fold_bn=bn_mode == "frozen")

    bb_sd = {k[len("init_conv_mask."):]: v for k, v in sd.items()
             if k.startswith("init_conv_mask.")}
    if cond_net == "resnet":
        p["init_conv_mask"] = convert_resnet101(
            bb_sd, fold=bn_mode == "frozen")["params"]
    else:
        converter = {"swin": convert_swin_b,
                     "effnet": convert_efficientnet_b7}[cond_net]
        p["init_conv_mask"] = converter(bb_sd)["params"]

    buffers = {"time_fourier": {"W": np.asarray(sd["time_mlp.0.W"])}}
    return {"params": p, "buffers": buffers}
