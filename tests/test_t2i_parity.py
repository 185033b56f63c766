"""t2i CondAttention parity vs the reference torch module
(unet/cond_unet_t2i.py:555-613; only `clip` needs stubbing)."""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_module():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    sys.modules.setdefault("clip", types.ModuleType("clip"))
    fv = sys.modules.setdefault("fvcore", types.ModuleType("fvcore"))
    fv.__path__ = []
    sys.modules.setdefault("fvcore.common", types.ModuleType("fvcore.common"))
    cfgmod = types.ModuleType("fvcore.common.config")
    cfgmod.CfgNode = dict
    sys.modules.setdefault("fvcore.common.config", cfgmod)
    import unet.cond_unet_t2i as ref

    return ref


def test_cond_attention_parity(ref_module):
    from adm_tpu.nn.t2i_unet import CondAttention
    from adm_tpu.utils.torch_convert import _t_conv, _t_linear

    torch.manual_seed(0)
    ref = ref_module.CondAttention(
        dim=32, dim2=48, hidden_dim=32, heads=4, window_size_q=[4, 4], drop=0.0,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {"params": jax.tree_util.tree_map(jnp.asarray, {
        "q_lin": {"kernel": _t_linear(sd["q_lin.weight"]), "bias": sd["q_lin.bias"]},
        "k_lin": {"kernel": _t_linear(sd["k_lin.weight"]), "bias": sd["k_lin.bias"]},
        "v_lin": {"kernel": _t_linear(sd["v_lin.weight"]), "bias": sd["v_lin.bias"]},
        "mlp_fc1": {"kernel": _t_conv(sd["mlp.fc1.weight"]),
                    "bias": sd["mlp.fc1.bias"]},
        "mlp_fc2": {"kernel": _t_conv(sd["mlp.fc2.weight"]),
                    "bias": sd["mlp.fc2.bias"]},
        "out_conv": {"kernel": _t_conv(sd["out_conv.0.weight"]),
                     "bias": sd["out_conv.0.bias"]},
        "out_norm": {"scale": sd["out_conv.1.weight"],
                     "bias": sd["out_conv.1.bias"]},
    })}
    ours = CondAttention(dim=32, window_size_q=(4, 4), heads=4)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 32, 16, 16).astype(np.float32)
    cond = rng.randn(2, 48).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x), torch.from_numpy(cond)).numpy()
    out_j = ours.apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(cond)
    )
    np.testing.assert_allclose(
        np.asarray(out_j), out_ref.transpose(0, 2, 3, 1), atol=5e-4,
        err_msg="CondAttention output mismatch",
    )
