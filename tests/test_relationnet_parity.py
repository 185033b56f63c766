"""RelationNet / BasicAttentionLayer parity vs the reference torch modules
(the conditional family's fusion core, unet/cond_unet_sd.py:155-279).

The reference file imports torchvision-backed vendored backbones at module
scope; we stub the torchvision surface (never instantiated here) to reach
the attention classes.
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _stub(name, **attrs):
    m = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


@pytest.fixture(scope="module")
def ref_module():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    class _SD(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, x):
            return x

    tv = _stub("torchvision")
    tv.__path__ = []
    _stub("torchvision.models")
    _stub("torchvision.ops", StochasticDepth=_SD,
          stochastic_depth=lambda x, *a, **k: x)
    _stub("torchvision.ops.misc", Conv2dNormActivation=_SD,
          SqueezeExcitation=_SD, MLP=_SD, Permute=_SD)
    _stub("torchvision.ops.stochastic_depth", StochasticDepth=_SD)
    _stub("torchvision.transforms")
    class _Interp:
        BICUBIC = "bicubic"
        BILINEAR = "bilinear"
        NEAREST = "nearest"

    _stub("torchvision.transforms._presets", ImageClassification=object,
          InterpolationMode=_Interp)
    _stub("torchvision.utils", _log_api_usage_once=lambda *a: None)
    class _Weights:
        def __init__(self, **kw):
            self.__dict__.update(kw)

        def __getattr__(self, name):
            return None

    class _WeightsEnum:
        pass

    _stub("torchvision.models._api", WeightsEnum=_WeightsEnum, Weights=_Weights,
          register_model=lambda *a, **k: (lambda f: f))
    _stub("torchvision.models._meta", _IMAGENET_CATEGORIES=[])
    _stub("torchvision.models._utils",
          _ovewrite_named_param=lambda *a, **k: None,
          _make_divisible=lambda v, *a, **k: v,
          _ModelURLs=dict,
          handle_legacy_interface=lambda **k: (lambda f: f))
    fv = _stub("fvcore")
    fv.__path__ = []
    _stub("fvcore.common")
    _stub("fvcore.common.config", CfgNode=dict)

    import unet.cond_unet_sd as ref

    return ref


def _convert_basic_attention(sd, prefix=""):
    from adm_tpu.utils.torch_convert import _t_conv, _t_linear

    g = lambda k: np.asarray(sd[prefix + k])
    return {
        "concat_conv": {"kernel": _t_conv(g("concat_conv.weight")),
                        "bias": g("concat_conv.bias")},
        "gn": {"scale": g("gn.weight"), "bias": g("gn.bias")},
        "q_lin": {"kernel": _t_linear(g("q_lin.weight")), "bias": g("q_lin.bias")},
        "k_lin": {"kernel": _t_linear(g("k_lin.weight")), "bias": g("k_lin.bias")},
        "v_lin": {"kernel": _t_linear(g("v_lin.weight")), "bias": g("v_lin.bias")},
        "mlp_fc1": {"kernel": _t_conv(g("mlp.fc1.weight")), "bias": g("mlp.fc1.bias")},
        "mlp_fc2": {"kernel": _t_conv(g("mlp.fc2.weight")), "bias": g("mlp.fc2.bias")},
        "out_conv": {"kernel": _t_conv(g("out_conv.weight")),
                     "bias": g("out_conv.bias")},
    }


def test_basic_attention_layer_parity(ref_module):
    from adm_tpu.nn.cond_blocks import BasicAttentionLayer

    torch.manual_seed(0)
    ref = ref_module.BasicAttetnionLayer(
        embed_dim=32, nhead=4, ffn_dim=64, window_size1=[4, 4],
        window_size2=[2, 2], dropout=0.0,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {"params": jax.tree_util.tree_map(
        jnp.asarray, _convert_basic_attention(sd))}

    ours = BasicAttentionLayer(embed_dim=32, nhead=4, ffn_dim=64,
                               window_size1=(4, 4), window_size2=(2, 2))
    rng = np.random.RandomState(0)
    x1 = rng.randn(2, 32, 8, 8).astype(np.float32)   # cond (Q side)
    x2 = rng.randn(2, 32, 16, 16).astype(np.float32)  # features (K/V side)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x1), torch.from_numpy(x2)).numpy()
    out_j = ours.apply(
        params,
        jnp.asarray(x1.transpose(0, 2, 3, 1)),
        jnp.asarray(x2.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(out_j), out_ref.transpose(0, 2, 3, 1), atol=2e-4,
        err_msg="BasicAttentionLayer output mismatch",
    )


def test_relationnet_parity(ref_module):
    """Full RelationNet: 1x1+BN input convs + attention layer. The input
    BNs run in training mode (batch statistics) — matching our stateless
    _BatchStatsNorm — with dropout disabled."""
    from adm_tpu.nn.cond_blocks import RelationNet

    torch.manual_seed(1)
    ref = ref_module.RelationNet(
        in_channel1=16, in_channel2=24, nhead=4, layers=1, embed_dim=32,
        ffn_dim=64, window_size1=[4, 4], window_size2=[2, 2],
    )
    ref.train()
    for m in ref.modules():  # disable the Mlp dropout only
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    from adm_tpu.utils.torch_convert import _t_conv

    params = {
        "input_conv1": {"kernel": _t_conv(sd["input_conv1.0.weight"]),
                        "bias": sd["input_conv1.0.bias"]},
        "input_bn1": {"scale": sd["input_conv1.1.weight"],
                      "bias": sd["input_conv1.1.bias"]},
        "input_conv2": {"kernel": _t_conv(sd["input_conv2.0.weight"]),
                        "bias": sd["input_conv2.0.bias"]},
        "input_bn2": {"scale": sd["input_conv2.1.weight"],
                      "bias": sd["input_conv2.1.bias"]},
        "attention_0": _convert_basic_attention(sd, "attentions.0."),
    }
    params = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
    ours = RelationNet(embed_dim=32, nhead=4, layers=1, ffn_dim=64,
                       window_size1=(4, 4), window_size2=(2, 2))

    rng = np.random.RandomState(1)
    cond = rng.randn(2, 16, 8, 8).astype(np.float32)
    feat = rng.randn(2, 24, 16, 16).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(cond), torch.from_numpy(feat)).numpy()
    out_j = ours.apply(
        params,
        jnp.asarray(cond.transpose(0, 2, 3, 1)),
        jnp.asarray(feat.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(out_j), out_ref.transpose(0, 2, 3, 1), atol=5e-4,
        err_msg="RelationNet output mismatch",
    )
