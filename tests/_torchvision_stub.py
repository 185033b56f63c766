"""Minimal torchvision stub so the reference's vendored backbone files
import on this torch-cpu-only image (no torchvision wheel).

Implements just the utility surface those files touch — faithful
re-implementations of small public torchvision helpers:
  ops.misc.MLP / Permute / Conv2dNormActivation / SqueezeExcitation,
  ops.stochastic_depth.StochasticDepth (identity at p=0 / eval),
  models._api.Weights/WeightsEnum, models._utils helpers, etc.

Call install() BEFORE importing /root/reference/unet/*.
"""

from __future__ import annotations

import sys
import types

import torch
from torch import nn


class Permute(nn.Module):
    def __init__(self, dims):
        super().__init__()
        self.dims = list(dims)

    def forward(self, x):
        return torch.permute(x, self.dims)


class MLP(nn.Sequential):
    """torchvision.ops.misc.MLP: Linear(+act)(+dropout) stack; the swin
    usage is MLP(dim, [hidden, dim], activation_layer=nn.GELU) -> indices
    0: Linear, 1: act, 2: dropout, 3: Linear, 4: dropout."""

    def __init__(self, in_channels, hidden_channels, norm_layer=None,
                 activation_layer=nn.ReLU, inplace=None, bias=True,
                 dropout=0.0):
        layers = []
        in_dim = in_channels
        params = {} if inplace is None else {"inplace": inplace}
        for hidden_dim in hidden_channels[:-1]:
            layers.append(nn.Linear(in_dim, hidden_dim, bias=bias))
            if norm_layer is not None:
                layers.append(norm_layer(hidden_dim))
            layers.append(activation_layer(**params))
            layers.append(nn.Dropout(dropout, **params))
            in_dim = hidden_dim
        layers.append(nn.Linear(in_dim, hidden_channels[-1], bias=bias))
        layers.append(nn.Dropout(dropout, **params))
        super().__init__(*layers)


class Conv2dNormActivation(nn.Sequential):
    def __init__(self, in_channels, out_channels, kernel_size=3, stride=1,
                 padding=None, groups=1, norm_layer=nn.BatchNorm2d,
                 activation_layer=nn.ReLU, dilation=1, inplace=True,
                 bias=None):
        if padding is None:
            padding = (kernel_size - 1) // 2 * dilation
        if bias is None:
            bias = norm_layer is None
        layers = [
            nn.Conv2d(in_channels, out_channels, kernel_size, stride,
                      padding, dilation=dilation, groups=groups, bias=bias)
        ]
        if norm_layer is not None:
            layers.append(norm_layer(out_channels))
        if activation_layer is not None:
            params = {} if inplace is None else {"inplace": inplace}
            layers.append(activation_layer(**params))
        super().__init__(*layers)
        self.out_channels = out_channels


class SqueezeExcitation(nn.Module):
    def __init__(self, input_channels, squeeze_channels,
                 activation=nn.ReLU, scale_activation=nn.Sigmoid):
        super().__init__()
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc1 = nn.Conv2d(input_channels, squeeze_channels, 1)
        self.fc2 = nn.Conv2d(squeeze_channels, input_channels, 1)
        self.activation = activation()
        self.scale_activation = scale_activation()

    def forward(self, x):
        scale = self.avgpool(x)
        scale = self.fc1(scale)
        scale = self.activation(scale)
        scale = self.fc2(scale)
        return x * self.scale_activation(scale)


class StochasticDepth(nn.Module):
    def __init__(self, p: float, mode: str):
        super().__init__()
        self.p = p
        self.mode = mode

    def forward(self, x):
        if not self.training or self.p == 0.0:
            return x
        survival = 1.0 - self.p
        shape = [x.shape[0]] + [1] * (x.ndim - 1) if self.mode == "row" else [1] * x.ndim
        noise = torch.empty(shape, dtype=x.dtype, device=x.device)
        noise = noise.bernoulli_(survival)
        if survival > 0.0:
            noise.div_(survival)
        return x * noise


def stochastic_depth(x, p, mode, training=True):
    return StochasticDepth(p, mode).train(training)(x)


class Weights:
    def __init__(self, *a, **k):
        self.url = k.get("url", "")
        self.transforms = k.get("transforms")
        self.meta = k.get("meta", {"categories": [0] * 1000})


class WeightsEnum:
    @classmethod
    def verify(cls, obj):
        return obj


def _log_api_usage_once(*a, **k):
    pass


def _ovewrite_named_param(kwargs, name, value):
    if name in kwargs:
        if kwargs[name] != value:
            raise ValueError(f"{name}: {kwargs[name]} != {value}")
    else:
        kwargs[name] = value


def _make_divisible(v, divisor, min_value=None):
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def handle_legacy_interface(**weights):
    def decorator(builder):
        return builder

    return decorator


class _ModelURLs(dict):
    pass


class InterpolationMode:
    BILINEAR = "bilinear"
    BICUBIC = "bicubic"


class ImageClassification:
    def __init__(self, *a, **k):
        pass


def install():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    ops_misc = types.ModuleType("torchvision.ops.misc")
    ops_sd = types.ModuleType("torchvision.ops.stochastic_depth")
    transforms = types.ModuleType("torchvision.transforms")
    presets = types.ModuleType("torchvision.transforms._presets")
    utils = types.ModuleType("torchvision.utils")
    models = types.ModuleType("torchvision.models")
    m_api = types.ModuleType("torchvision.models._api")
    m_meta = types.ModuleType("torchvision.models._meta")
    m_utils = types.ModuleType("torchvision.models._utils")

    ops_misc.MLP = MLP
    ops_misc.Permute = Permute
    ops_misc.Conv2dNormActivation = Conv2dNormActivation
    ops_misc.SqueezeExcitation = SqueezeExcitation
    ops_sd.StochasticDepth = StochasticDepth
    ops_sd.stochastic_depth = stochastic_depth
    ops.StochasticDepth = StochasticDepth
    ops.misc = ops_misc
    ops.stochastic_depth = ops_sd
    presets.ImageClassification = ImageClassification
    presets.InterpolationMode = InterpolationMode
    utils._log_api_usage_once = _log_api_usage_once
    m_api.WeightsEnum = WeightsEnum
    m_api.Weights = Weights
    m_api.register_model = lambda *a, **k: (lambda f: f)
    m_meta._IMAGENET_CATEGORIES = [str(i) for i in range(1000)]
    m_utils._ovewrite_named_param = _ovewrite_named_param
    m_utils.handle_legacy_interface = handle_legacy_interface
    m_utils._make_divisible = _make_divisible
    m_utils._ModelURLs = _ModelURLs
    transforms._presets = presets

    tv.ops = ops
    tv.transforms = transforms
    tv.utils = utils
    tv.models = models
    models._api = m_api
    models._meta = m_meta
    models._utils = m_utils

    datasets = types.ModuleType("torchvision.datasets")

    class _UnavailableDataset:
        def __init__(self, *a, **k):
            raise RuntimeError("torchvision datasets are stubbed out")

    datasets.CIFAR10 = _UnavailableDataset
    datasets.STL10 = _UnavailableDataset
    tv.datasets = datasets

    def _unavailable_model(*a, **k):
        raise RuntimeError("torchvision models are stubbed out")

    models.vgg16 = _unavailable_model

    for name, mod in [
        ("torchvision", tv),
        ("torchvision.datasets", datasets),
        ("torchvision.ops", ops),
        ("torchvision.ops.misc", ops_misc),
        ("torchvision.ops.stochastic_depth", ops_sd),
        ("torchvision.transforms", transforms),
        ("torchvision.transforms._presets", presets),
        ("torchvision.utils", utils),
        ("torchvision.models", models),
        ("torchvision.models._api", m_api),
        ("torchvision.models._meta", m_meta),
        ("torchvision.models._utils", m_utils),
    ]:
        sys.modules[name] = mod
