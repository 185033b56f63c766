"""torch -> flax weight converters for the conditioning backbones.

Maps the reference's vendored torchvision state_dicts onto our NHWC flax
backbones (adm_tpu/nn/backbones.py):

  swin_b           unet/swin_transformer.py:308-650  (+ the fork's
                   `first_coonv` patch-embed stem, :363-369; the _for_sci
                   single-channel variant shares the layout)
  resnet101        unet/resnet.py:166-290
  efficientnet_b7  unet/efficientnet.py:233-373

BatchNorm layers are FOLDED into per-channel affines for the 'frozen_bn'
norm mode (the reference backbones run frozen/eval inside the conditional
UNets, unet/cond_unet_sd.py:637-679): scale = w/sqrt(var+eps),
bias = b - mean*scale.

All converters take a plain state_dict (torch tensors or numpy arrays) and
return {'params': ...} pytrees of numpy arrays.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def _np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _conv(w):  # torch (O, I, kH, kW) -> flax (kH, kW, I, O)
    return _np(w).transpose(2, 3, 1, 0)


def _dw_conv(w):  # torch depthwise (C, 1, kH, kW) -> flax (kH, kW, 1, C)
    return _np(w).transpose(2, 3, 1, 0)


def _dense(w):  # torch (O, I) -> flax (I, O)
    return _np(w).transpose(1, 0)


def fold_batchnorm(sd: Dict, prefix: str, eps: float = 1e-5):
    """BatchNorm running stats + affine -> {'scale','bias'} (inference)."""
    w = _np(sd[f"{prefix}.weight"])
    b = _np(sd[f"{prefix}.bias"])
    mean = _np(sd[f"{prefix}.running_mean"])
    var = _np(sd[f"{prefix}.running_var"])
    scale = w / np.sqrt(var + eps)
    return {"scale": scale, "bias": b - mean * scale}


def _ln(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


# ---------------------------------------------------------------------------
# Swin-B
# ---------------------------------------------------------------------------


def convert_swin_b(sd: Dict, depths: Sequence[int] = (2, 2, 18, 2)) -> Dict:
    """Vendored swin_b state_dict -> SwinBackbone params.

    Layout (unet/swin_transformer.py): first_coonv = [Conv(patch), Permute,
    LN]; features = [stage0, merge0, stage1, merge1, stage2, merge2, stage3]
    with stages at indices 0,2,4,6.
    """
    p = {
        "patch_embed": {
            "kernel": _conv(sd["first_coonv.0.weight"]),
            "bias": _np(sd["first_coonv.0.bias"]),
        },
        "patch_norm": _ln(sd, "first_coonv.2"),
    }
    for stage, depth in enumerate(depths):
        fi = stage * 2
        for blk in range(depth):
            base = f"features.{fi}.{blk}"
            p[f"stage{stage}_block{blk}"] = {
                "norm1": _ln(sd, f"{base}.norm1"),
                "norm2": _ln(sd, f"{base}.norm2"),
                "attn": {
                    "qkv": {
                        "kernel": _dense(sd[f"{base}.attn.qkv.weight"]),
                        "bias": _np(sd[f"{base}.attn.qkv.bias"]),
                    },
                    "proj": {
                        "kernel": _dense(sd[f"{base}.attn.proj.weight"]),
                        "bias": _np(sd[f"{base}.attn.proj.bias"]),
                    },
                    "relative_position_bias_table": _np(
                        sd[f"{base}.attn.relative_position_bias_table"]
                    ),
                },
                "mlp_fc1": {
                    "kernel": _dense(sd[f"{base}.mlp.0.weight"]),
                    "bias": _np(sd[f"{base}.mlp.0.bias"]),
                },
                "mlp_fc2": {
                    "kernel": _dense(sd[f"{base}.mlp.3.weight"]),
                    "bias": _np(sd[f"{base}.mlp.3.bias"]),
                },
            }
        if stage < len(depths) - 1:
            mi = fi + 1
            p[f"merge{stage}"] = {
                "norm": _ln(sd, f"features.{mi}.norm"),
                "reduction": {
                    "kernel": _dense(sd[f"features.{mi}.reduction.weight"])
                },
            }
    return {"params": p}


# ---------------------------------------------------------------------------
# ResNet-101
# ---------------------------------------------------------------------------


def convert_resnet101(sd: Dict, blocks: Sequence[int] = (3, 4, 23, 3),
                      fold: bool = True) -> Dict:
    """Vendored resnet101 state_dict -> ResNetBackbone params. Flax
    auto-names: Conv_0/_GNorm_0 stem, then Bottleneck_{k} with
    Conv_0.._GNorm_2 (+ Conv_3/_GNorm_3 downsample).

    fold=True: running stats folded to inference affines — pair with
    norm_mode='frozen_bn' (exact BN.eval()). fold=False: raw BN affine —
    pair with norm_mode='batch_stats' (exact BN.train(), the twin-training
    harness's mode)."""

    def bn(prefix):
        if fold:
            return fold_batchnorm(sd, prefix)
        return {"scale": _np(sd[f"{prefix}.weight"]),
                "bias": _np(sd[f"{prefix}.bias"])}

    p = {
        "Conv_0": {"kernel": _conv(sd["conv1.weight"])},
        "_GNorm_0": bn("bn1"),
    }
    k = 0
    for stage, n in enumerate(blocks):
        for blk in range(n):
            base = f"layer{stage + 1}.{blk}"
            bp = {}
            for j in (1, 2, 3):
                bp[f"Conv_{j - 1}"] = {"kernel": _conv(sd[f"{base}.conv{j}.weight"])}
                bp[f"_GNorm_{j - 1}"] = bn(f"{base}.bn{j}")
            if f"{base}.downsample.0.weight" in sd:
                bp["Conv_3"] = {"kernel": _conv(sd[f"{base}.downsample.0.weight"])}
                bp["_GNorm_3"] = bn(f"{base}.downsample.1")
            p[f"Bottleneck_{k}"] = bp
            k += 1
    return {"params": p}


# ---------------------------------------------------------------------------
# EfficientNet-B7
# ---------------------------------------------------------------------------


def convert_efficientnet_b7(
    sd: Dict,
    stage_depths: Sequence[int] = (4, 7, 7, 10, 10, 13, 4),
    bn_eps: float = 1e-3,  # EfficientNet BN eps (unet/efficientnet.py:927)
) -> Dict:
    """Vendored efficientnet_b7 state_dict -> EfficientNetBackbone(
    norm_mode='frozen_bn') params.

    torch layout: first_coonv = Conv2dNormActivation stem; features.{s}.{b}
    .block = [expand CNA]? + [depthwise CNA, SE(fc1,fc2), project CNA]
    (stage 0 has expand_ratio 1 and no expand conv).
    """
    p = {
        "Conv_0": {"kernel": _conv(sd["first_coonv.0.weight"])},
        "_GNorm_0": fold_batchnorm(sd, "first_coonv.1", bn_eps),
    }
    k = 0
    for s, depth in enumerate(stage_depths):
        for b in range(depth):
            base = f"features.{s}.{b}.block"
            bp = {}
            expand = s != 0
            j = 0
            ours = 0
            if expand:
                bp[f"Conv_{ours}"] = {"kernel": _conv(sd[f"{base}.{j}.0.weight"])}
                bp[f"_GNorm_{ours}"] = fold_batchnorm(sd, f"{base}.{j}.1", bn_eps)
                j += 1
                ours += 1
            # depthwise
            bp[f"Conv_{ours}"] = {"kernel": _dw_conv(sd[f"{base}.{j}.0.weight"])}
            bp[f"_GNorm_{ours}"] = fold_batchnorm(sd, f"{base}.{j}.1", bn_eps)
            j += 1
            ours += 1
            # squeeze-excite (torch Conv2d 1x1 with bias)
            bp["SqueezeExcite_0"] = {
                "Conv_0": {
                    "kernel": _conv(sd[f"{base}.{j}.fc1.weight"]),
                    "bias": _np(sd[f"{base}.{j}.fc1.bias"]),
                },
                "Conv_1": {
                    "kernel": _conv(sd[f"{base}.{j}.fc2.weight"]),
                    "bias": _np(sd[f"{base}.{j}.fc2.bias"]),
                },
            }
            j += 1
            # project
            bp[f"Conv_{ours}"] = {"kernel": _conv(sd[f"{base}.{j}.0.weight"])}
            bp[f"_GNorm_{ours}"] = fold_batchnorm(sd, f"{base}.{j}.1", bn_eps)
            p[f"MBConv_{k}"] = bp
            k += 1
    return {"params": p}
