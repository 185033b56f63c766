"""Backbone weight-converter parity vs the reference's vendored torch
backbones (random weights + randomized BN running stats, eval mode).

Covers VERDICT item 3: elementwise 4-scale feature parity for
swin_b (unet/swin_transformer.py:412-425, incl. the _for_sci
single-channel variant), resnet101 (unet/resnet.py:266-288), and
efficientnet_b7 (unet/efficientnet.py:355-370).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

from tests._torchvision_stub import install as _install_tv  # noqa: E402

_install_tv()


def _randomize_bn_stats(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    for name, buf in module.named_buffers():
        if name.endswith("running_mean"):
            buf.copy_(torch.randn(buf.shape, generator=g) * 0.2)
        elif name.endswith("running_var"):
            buf.copy_(torch.rand(buf.shape, generator=g) + 0.5)


def _cmp(feats_jax, feats_torch, atol, what):
    """Elementwise with tolerance scaled to each scale's activation
    magnitude — deep random-weight stacks blow activations up to 1e5+
    (ReLU+residual compounding), where fixed atol measures fp32 noise."""
    assert len(feats_jax) == len(feats_torch) == 4
    for i, (fj, ft) in enumerate(zip(feats_jax, feats_torch)):
        ft = ft.detach().numpy()
        if ft.ndim == 4:  # NCHW -> NHWC
            ft = ft.transpose(0, 2, 3, 1)
        scale = max(1.0, float(np.abs(ft).max()))
        np.testing.assert_allclose(
            np.asarray(fj), ft, atol=atol * scale,
            err_msg=f"{what} scale {i} diverged",
        )


def test_swin_parity_tiny():
    """Tiny swin through the vendored SwinTransformer code path."""
    from unet.swin_transformer import SwinTransformer

    from adm_tpu.nn.backbones import SwinBackbone
    from adm_tpu.utils.backbone_convert import convert_swin_b

    torch.manual_seed(0)
    depths, heads = [1, 1, 2, 1], [2, 4, 8, 16]
    tm = SwinTransformer(
        patch_size=[4, 4], embed_dim=32, depths=depths, num_heads=heads,
        window_size=[4, 4], stochastic_depth_prob=0.0,
    )
    tm.eval()
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_swin_b(tm.state_dict(), depths=depths)
    )
    jm = SwinBackbone(embed_dim=32, depths=tuple(depths), heads=tuple(heads),
                      window_size=4)

    x = np.random.RandomState(1).randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x))
    ours = jm.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _cmp(ours, ref, 2e-4, "swin")


def test_swin_b_full_layout():
    """Full Swin-B layout: converter consumes the real swin_b state_dict."""
    from unet.swin_transformer import swin_b

    from adm_tpu.nn.backbones import SwinBackbone
    from adm_tpu.utils.backbone_convert import convert_swin_b

    torch.manual_seed(0)
    tm = swin_b(weights=None)
    tm.eval()
    params = jax.tree_util.tree_map(jnp.asarray, convert_swin_b(tm.state_dict()))
    jm = SwinBackbone()  # Swin-B defaults
    x = np.random.RandomState(2).randn(1, 3, 56, 56).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x))
    ours = jm.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _cmp(ours, ref, 5e-4, "swin_b")


def test_swin_for_sci_single_channel():
    """The _for_sci fork variant takes 1-channel input (its first_coonv,
    unet/swin_transformer_for_sci.py:363-369)."""
    from unet.swin_transformer_for_sci import SwinTransformer

    from adm_tpu.nn.backbones import SwinBackbone
    from adm_tpu.utils.backbone_convert import convert_swin_b

    torch.manual_seed(3)
    depths, heads = [1, 1], [2, 4]
    tm = SwinTransformer(
        patch_size=[4, 4], embed_dim=16, depths=depths, num_heads=heads,
        window_size=[4, 4], stochastic_depth_prob=0.0,
    )
    tm.eval()
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_swin_b(tm.state_dict(), depths=depths)
    )
    jm = SwinBackbone(embed_dim=16, depths=tuple(depths), heads=tuple(heads),
                      window_size=4, in_channels=1)
    x = np.random.RandomState(3).randn(2, 1, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x))
    ours = jm.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(ours) == len(ref) == 2
    for fj, ft in zip(ours, ref):
        np.testing.assert_allclose(
            np.asarray(fj), ft.detach().numpy().transpose(0, 2, 3, 1),
            atol=2e-4,
        )


@pytest.mark.parametrize("blocks", [(1, 1, 1, 1)])
def test_resnet_parity_tiny(blocks):
    from unet.resnet import Bottleneck as TorchBottleneck
    from unet.resnet import ResNet as TorchResNet

    from adm_tpu.nn.backbones import ResNetBackbone
    from adm_tpu.utils.backbone_convert import convert_resnet101

    torch.manual_seed(1)
    tm = TorchResNet(TorchBottleneck, list(blocks))
    _randomize_bn_stats(tm)
    tm.eval()
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_resnet101(tm.state_dict(), blocks=blocks)
    )
    jm = ResNetBackbone(blocks=blocks, norm_mode="frozen_bn")
    x = np.random.RandomState(4).randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x))
    ours = jm.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _cmp(ours, ref, 3e-4, "resnet")


def test_resnet101_full_layout():
    """Converter consumes the real resnet101 state_dict; spot-check scale 0
    and 3 (full fwd at 64x64 to bound runtime)."""
    from unet.resnet import resnet101

    from adm_tpu.nn.backbones import ResNetBackbone
    from adm_tpu.utils.backbone_convert import convert_resnet101

    torch.manual_seed(2)
    tm = resnet101(weights=None)
    _randomize_bn_stats(tm)
    tm.eval()
    params = jax.tree_util.tree_map(jnp.asarray, convert_resnet101(tm.state_dict()))
    jm = ResNetBackbone(norm_mode="frozen_bn")
    x = np.random.RandomState(5).randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x))
    ours = jm.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _cmp(ours, ref, 1e-3, "resnet101")


def test_efficientnet_b7_parity():
    from unet.efficientnet import efficientnet_b7

    from adm_tpu.nn.backbones import EfficientNetBackbone
    from adm_tpu.utils.backbone_convert import convert_efficientnet_b7

    torch.manual_seed(3)
    tm = efficientnet_b7(weights=None)
    _randomize_bn_stats(tm)
    tm.eval()
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_efficientnet_b7(tm.state_dict())
    )
    jm = EfficientNetBackbone(norm_mode="frozen_bn")
    x = np.random.RandomState(6).randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x))
    ours = jm.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _cmp(ours, ref, 1e-3, "efficientnet_b7")
