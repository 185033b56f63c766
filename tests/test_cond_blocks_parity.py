"""Elementwise parity for the remaining conditional building blocks:
lucidrains ResnetBlock (weight-standardized convs), LinearAttention,
full Attention, and the t2i CondAttention — all vs the reference torch.
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_module():
    # reuse the torchvision stubbing from the RelationNet parity suite
    from tests.test_relationnet_parity import _stub  # noqa: F401

    import tests.test_relationnet_parity as rp

    class _Req:
        pass

    # build stubs by invoking the fixture logic through a tiny shim
    gen = rp.ref_module.__wrapped__ if hasattr(rp.ref_module, "__wrapped__") else None
    # simplest: call the same stubbing inline
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    class _SD(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, x):
            return x

    class _Weights:
        def __init__(self, **kw):
            self.__dict__.update(kw)

        def __getattr__(self, name):
            return None

    class _WeightsEnum:
        pass

    class _Interp:
        BICUBIC = "bicubic"
        BILINEAR = "bilinear"
        NEAREST = "nearest"

    tv = rp._stub("torchvision")
    tv.__path__ = []
    rp._stub("torchvision.models")
    rp._stub("torchvision.ops", StochasticDepth=_SD,
             stochastic_depth=lambda x, *a, **k: x)
    rp._stub("torchvision.ops.misc", Conv2dNormActivation=_SD,
             SqueezeExcitation=_SD, MLP=_SD, Permute=_SD)
    rp._stub("torchvision.ops.stochastic_depth", StochasticDepth=_SD)
    rp._stub("torchvision.transforms")
    rp._stub("torchvision.transforms._presets", ImageClassification=object,
             InterpolationMode=_Interp)
    rp._stub("torchvision.utils", _log_api_usage_once=lambda *a: None)
    rp._stub("torchvision.models._api", WeightsEnum=_WeightsEnum,
             Weights=_Weights, register_model=lambda *a, **k: (lambda f: f))
    rp._stub("torchvision.models._meta", _IMAGENET_CATEGORIES=[])
    rp._stub("torchvision.models._utils",
             _ovewrite_named_param=lambda *a, **k: None,
             _make_divisible=lambda v, *a, **k: v,
             _ModelURLs=dict,
             handle_legacy_interface=lambda **k: (lambda f: f))
    fv = rp._stub("fvcore")
    fv.__path__ = []
    rp._stub("fvcore.common")
    rp._stub("fvcore.common.config", CfgNode=dict)

    import unet.cond_unet_sd as ref

    return ref


def _t_conv(w):
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def test_resnet_block_parity(ref_module, rng):
    from adm_tpu.nn.cond_blocks import ResnetBlock

    torch.manual_seed(0)
    ref = ref_module.ResnetBlock(16, 32, time_emb_dim=24, groups=8).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {"params": jax.tree_util.tree_map(jnp.asarray, {
        "mlp": {"kernel": np.ascontiguousarray(sd["mlp.1.weight"].T),
                "bias": sd["mlp.1.bias"]},
        "block1": {"proj": {"kernel": _t_conv(sd["block1.proj.weight"]),
                            "bias": sd["block1.proj.bias"]},
                   "norm": {"scale": sd["block1.norm.weight"],
                            "bias": sd["block1.norm.bias"]}},
        "block2": {"proj": {"kernel": _t_conv(sd["block2.proj.weight"]),
                            "bias": sd["block2.proj.bias"]},
                   "norm": {"scale": sd["block2.norm.weight"],
                            "bias": sd["block2.norm.bias"]}},
        "res_conv": {"kernel": _t_conv(sd["res_conv.weight"]),
                     "bias": sd["res_conv.bias"]},
    })}
    ours = ResnetBlock(32, groups=8)
    rngnp = np.random.RandomState(0)
    x = rngnp.randn(2, 16, 8, 8).astype(np.float32)
    temb = rngnp.randn(2, 24).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x), torch.from_numpy(temb)).numpy()
    out_j = ours.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                       jnp.asarray(temb))
    np.testing.assert_allclose(
        np.asarray(out_j), out_ref.transpose(0, 2, 3, 1), atol=5e-4)


def test_linear_attention_parity(ref_module, rng):
    from adm_tpu.nn.cond_blocks import LinearAttention

    torch.manual_seed(0)
    ref = ref_module.LinearAttention(32, heads=4, dim_head=8).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {"params": jax.tree_util.tree_map(jnp.asarray, {
        "to_qkv": {"kernel": _t_conv(sd["to_qkv.weight"])},
        "to_out": {"kernel": _t_conv(sd["to_out.0.weight"]),
                   "bias": sd["to_out.0.bias"]},
        "out_norm": {"g": sd["to_out.1.g"].reshape(-1)},
    })}
    ours = LinearAttention(heads=4, dim_head=8)
    rngnp = np.random.RandomState(0)
    x = rngnp.randn(2, 32, 8, 8).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x)).numpy()
    out_j = ours.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out_j), out_ref.transpose(0, 2, 3, 1), atol=5e-4)


def test_full_attention_parity(ref_module, rng):
    from adm_tpu.nn.cond_blocks import Attention

    torch.manual_seed(0)
    ref = ref_module.Attention(32, heads=4, dim_head=8).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {"params": jax.tree_util.tree_map(jnp.asarray, {
        "to_qkv": {"kernel": _t_conv(sd["to_qkv.weight"])},
        "to_out": {"kernel": _t_conv(sd["to_out.weight"]),
                   "bias": sd["to_out.bias"]},
    })}
    ours = Attention(heads=4, dim_head=8)
    rngnp = np.random.RandomState(0)
    x = rngnp.randn(2, 32, 8, 8).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x)).numpy()
    out_j = ours.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(out_j), out_ref.transpose(0, 2, 3, 1), atol=5e-4)
