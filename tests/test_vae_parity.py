"""VAE parity: converted reference Encoder/Decoder weights must reproduce
encode/decode outputs elementwise (enables loading CompVis kl-f* and
reference-trained first stages)."""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

DD = dict(
    double_z=True,
    z_channels=3,
    resolution=(32, 32),
    in_channels=3,
    out_ch=3,
    ch=32,
    ch_mult=[1, 2],
    num_res_blocks=1,
    attn_resolutions=[],  # fork compares tuple resolutions; all VAE configs use []
    dropout=0.0,
)


@pytest.fixture(scope="module")
def ref_vae():
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        tv.models.vgg16 = lambda *a, **k: (_ for _ in ()).throw(RuntimeError)
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    from ddm.encoder_decoder import Decoder as RefDecoder, Encoder as RefEncoder

    torch.manual_seed(0)
    enc = RefEncoder(**DD).eval()
    dec = RefDecoder(**{k: v for k, v in DD.items()}).eval()
    return enc, dec


def test_vae_encode_decode_parity(ref_vae):
    from adm_tpu.utils.torch_convert import convert_autoencoder_kl
    from adm_tpu.vae.autoencoder import AutoencoderKL

    enc, dec = ref_vae
    # stitch a state dict in the AutoencoderKL layout
    sd = {}
    for k, v in enc.state_dict().items():
        sd[f"encoder.{k}"] = v
    for k, v in dec.state_dict().items():
        sd[f"decoder.{k}"] = v
    # identity-ish quant convs
    zc = DD["z_channels"]
    sd["quant_conv.weight"] = torch.eye(2 * zc).reshape(2 * zc, 2 * zc, 1, 1)
    sd["quant_conv.bias"] = torch.zeros(2 * zc)
    sd["post_quant_conv.weight"] = torch.eye(zc).reshape(zc, zc, 1, 1)
    sd["post_quant_conv.bias"] = torch.zeros(zc)

    params = jax.tree_util.tree_map(jnp.asarray, convert_autoencoder_kl(sd))
    dd = dict(DD)
    dd["ch_mult"] = tuple(dd["ch_mult"])
    dd["attn_resolutions"] = tuple(dd["attn_resolutions"])
    module = AutoencoderKL(ddconfig=dd, embed_dim=zc)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        moments_ref = enc(torch.from_numpy(x)).numpy()
    post = module.apply(
        {"params": params["params"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        method=AutoencoderKL.encode,
    )
    ours_moments = np.concatenate(
        [np.asarray(post.mean), np.asarray(post.logvar)], axis=-1
    )
    ref_mean = moments_ref[:, :zc].transpose(0, 2, 3, 1)
    ref_logvar = np.clip(moments_ref[:, zc:], -30, 20).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(
        ours_moments[..., :zc], ref_mean, atol=2e-4, err_msg="encoder mean"
    )
    np.testing.assert_allclose(
        ours_moments[..., zc:], ref_logvar, atol=2e-4, err_msg="encoder logvar"
    )

    z = rng.randn(2, zc, 16, 16).astype(np.float32)
    with torch.no_grad():
        dec_ref = dec(torch.from_numpy(z)).numpy()
    dec_ours = module.apply(
        {"params": params["params"]},
        jnp.asarray(z.transpose(0, 2, 3, 1)),
        method=AutoencoderKL.decode,
    )
    np.testing.assert_allclose(
        np.asarray(dec_ours), dec_ref.transpose(0, 2, 3, 1), atol=5e-4,
        err_msg="decoder output",
    )
