"""FULL-MODEL conditional UNet parity vs the reference torch implementation.

Extends the block-level suites (test_cond_blocks_parity, ResnetBlock /
LinearAttention / RelationNet) to the COMPOSED unet/cond_unet_sd.py Unet:
instantiate the reference model (cond_net='resnet', random torch init),
convert the complete state_dict with
utils.torch_convert.convert_cond_unet_sd (backbone BN folded to the
frozen-affine inference form), and compare both outputs (x1 prediction and
the analytic eps branch x2) elementwise. This is the checkpoint-migration
path for the reference's released conditional models
(train_cond_dpm/ldm: saliency, depth, SR, inpainting families).

Reference: unet/cond_unet_sd.py:591-883 (4-level trunk, hardcoded 4-scale
cond projections :669-679, forward :801-883).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

DIM = 16
MULTS = (1, 2, 4, 4)
RES = 64  # x resolution; cond is RES x RES too
WINDOWS = ((8, 8), (4, 4), (2, 2), (1, 1))


@pytest.fixture(scope="module")
def ref_unet():
    import types

    import _torchvision_stub as tvs

    tvs.install()

    def stub(name, **attrs):
        m = sys.modules.get(name) or types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    fv = stub("fvcore")
    fv.__path__ = []
    stub("fvcore.common")
    stub("fvcore.common.config", CfgNode=dict)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import unet.cond_unet_sd as ref
    from unet.resnet import resnet101 as _r101

    # the reference hardcodes resnet101(weights=ResNet101_Weights); the
    # weights enum is env-absent so instantiate randomly-initialized
    ref.resnet101 = lambda weights=None, **k: _r101(weights=None, **k)

    class Cfg(dict):
        __getattr__ = dict.__getitem__

    torch.manual_seed(0)
    net = ref.Unet(
        dim=DIM, dim_mults=MULTS, channels=1, cond_in_dim=3,
        window_sizes1=[list(w) for w in WINDOWS],
        window_sizes2=[list(w) for w in WINDOWS],
        resnet_block_groups=8, cfg=Cfg(cond_net="resnet"),
    ).eval()
    # At RANDOM init the 23-block resnet101 (eval-mode BN with fresh
    # running stats) amplifies activations to ~2.4e4, saturating the
    # downstream relation-attention softmaxes where float-order noise
    # flips outputs — a test-condition artifact (real checkpoints carry
    # calibrated stats). Tame the residual branches so magnitudes stay
    # O(1); the converter sees the SAME tamed weights, so parity is
    # still end-to-end exact.
    with torch.no_grad():
        for name, p in net.init_conv_mask.named_parameters():
            if "conv3.weight" in name:
                p.mul_(0.05)
    return net


def test_cond_unet_sd_full_parity(ref_unet):
    from adm_tpu.nn.cond_unet import CondUnet
    from adm_tpu.utils.torch_convert import convert_cond_unet_sd

    sd = {k: v.detach() for k, v in ref_unet.state_dict().items()}
    variables = jax.tree_util.tree_map(
        jnp.asarray, convert_cond_unet_sd(sd, MULTS, cond_net="resnet")
    )

    ours = CondUnet(
        dim=DIM, dim_mults=MULTS, channels=1, cond_in_dim=3,
        window_sizes1=WINDOWS, window_sizes2=WINDOWS,
        resnet_block_groups=8, cond_net="resnet",
        backbone_norm="frozen_bn", n_decoders=1,
    )

    rng = np.random.RandomState(0)
    x = rng.randn(2, 1, RES, RES).astype(np.float32)
    cond = rng.rand(2, 3, RES, RES).astype(np.float32)
    t = np.array([0.5124, 0.0317], np.float32)

    with torch.no_grad():
        r1, r2 = ref_unet(
            torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(cond)
        )
    j1, j2 = ours.apply(
        variables,
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(t),
        jnp.asarray(cond.transpose(0, 2, 3, 1)),
    )

    np.testing.assert_allclose(
        np.asarray(j1), r1.numpy().transpose(0, 2, 3, 1), atol=2e-3,
        err_msg="x1 (prediction head) diverged",
    )
    np.testing.assert_allclose(
        np.asarray(j2), r2.numpy().transpose(0, 2, 3, 1), atol=5e-3,
        err_msg="x2 (analytic eps) diverged",
    )


def test_reference_checkpoint_dispatch_cond(ref_unet, tmp_path):
    """convert_reference_checkpoint auto-detects a conditional trainer
    checkpoint (train_cond_dpm.py save format: data['model'] with the
    DDPM's 'model.' nesting) and routes to convert_cond_unet_sd."""
    from adm_tpu.utils.torch_convert import convert_reference_checkpoint

    sd = {f"model.{k}": v for k, v in ref_unet.state_dict().items()}
    sd["eps"] = torch.tensor(1e-4)  # process-level extra key, must be ignored
    path = tmp_path / "model-1.pt"
    torch.save({"step": 1, "model": sd}, path)

    variables = convert_reference_checkpoint(str(path), use_ema=False)
    assert "buffers" in variables and "params" in variables
    p = variables["params"]
    assert "relation_down_0" in p and "init_conv_mask" in p
    assert p["init_conv_mask"].get("Bottleneck_0"), "resnet not detected"
    ref_w = ref_unet.state_dict()["final_conv.weight"].numpy()
    np.testing.assert_array_equal(
        p["final_conv"]["kernel"], ref_w.transpose(2, 3, 1, 0)
    )


@pytest.fixture(scope="module")
def ref_unet2():
    """The 2-decoder unet/cond_unet.py Unet (image-space train_cond_dpm
    pairing, e.g. saliency DUTS_ddm_const_dpm_114.yaml) — identical trunk
    plus ups2/relation_layers_up2/decouple2/final_*2."""
    import types

    import _torchvision_stub as tvs

    tvs.install()

    def stub(name, **attrs):
        m = sys.modules.get(name) or types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    fv = stub("fvcore")
    fv.__path__ = []
    stub("fvcore.common")
    stub("fvcore.common.config", CfgNode=dict)
    stub("pytorch_lightning", LightningModule=torch.nn.Module)
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import unet.cond_unet as ref
    from unet.resnet import resnet101 as _r101

    ref.resnet101 = lambda weights=None, **k: _r101(weights=None, **k)

    torch.manual_seed(0)
    net = ref.Unet(
        dim=DIM, dim_mults=MULTS, channels=1, cond_in_dim=3,
        window_sizes1=[list(w) for w in WINDOWS],
        window_sizes2=[list(w) for w in WINDOWS],
        resnet_block_groups=8, cond_net="resnet",
    ).eval()
    with torch.no_grad():  # same random-init activation taming as ref_unet
        for name, p in net.init_conv_mask.named_parameters():
            if "conv3.weight" in name:
                p.mul_(0.05)
    return net


def test_cond_unet_two_decoder_full_parity(ref_unet2):
    from adm_tpu.nn.cond_unet import CondUnet
    from adm_tpu.utils.torch_convert import convert_cond_unet_sd

    sd = {k: v.detach() for k, v in ref_unet2.state_dict().items()}
    variables = jax.tree_util.tree_map(
        jnp.asarray,
        convert_cond_unet_sd(sd, MULTS, cond_net="resnet", n_decoders=2),
    )
    ours = CondUnet(
        dim=DIM, dim_mults=MULTS, channels=1, cond_in_dim=3,
        window_sizes1=WINDOWS, window_sizes2=WINDOWS,
        resnet_block_groups=8, cond_net="resnet",
        backbone_norm="frozen_bn", n_decoders=2,
    )
    rng = np.random.RandomState(0)
    x = rng.randn(2, 1, RES, RES).astype(np.float32)
    cond = rng.rand(2, 3, RES, RES).astype(np.float32)
    t = np.array([0.5124, 0.0317], np.float32)
    with torch.no_grad():
        r1, r2 = ref_unet2(
            torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(cond)
        )
    j1, j2 = ours.apply(
        variables,
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(t),
        jnp.asarray(cond.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(j1), r1.numpy().transpose(0, 2, 3, 1), atol=2e-3,
        err_msg="x1 (C decoder) diverged",
    )
    np.testing.assert_allclose(
        np.asarray(j2), r2.numpy().transpose(0, 2, 3, 1), atol=2e-3,
        err_msg="x2 (noise decoder) diverged",
    )


def test_convert_bn_mode_is_validated():
    """A typo'd bn_mode must raise, not silently convert in the wrong BN
    regime; effnet + batch_stats would double-normalize (folded affines
    into train-mode batch statistics) and must refuse (code-review r4).
    Validation happens before the state_dict is touched."""
    from adm_tpu.utils.torch_convert import convert_cond_unet_sd

    with pytest.raises(ValueError, match="bn_mode"):
        convert_cond_unet_sd({}, bn_mode="fozen")
    with pytest.raises(NotImplementedError, match="double-normalize"):
        convert_cond_unet_sd({}, bn_mode="batch_stats", cond_net="effnet")
