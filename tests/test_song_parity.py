"""SongUNet (DDPM++/NCSN++) numerical parity vs the reference torch model.

Covers what the Dhariwal parity test doesn't: fourier embedding with
sin/cos swap, residual/skip encoder aux paths, skip_scale sqrt(0.5),
non-adaptive emb shift, per-level aux output heads, FIR [1,3,3,1]
resampling, xavier init modes.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _convert_song(sd):
    """Reference SongUNet state_dict -> our flax tree (encoder name
    translation: '{res}x{res}_key' -> '{enc|dec}_{res}_{key}')."""
    from adm_tpu.utils.torch_convert import (
        _convert_spatial_att,
        _convert_unet_block,
        _t_conv,
        _t_linear,
    )

    sd = {k: v.detach().cpu().numpy() for k, v in sd.items()}
    model = {}
    model["map_layer0"] = {"kernel": _t_linear(sd["model.map_layer0.weight"]),
                           "bias": sd["model.map_layer0.bias"]}
    model["map_layer1"] = {"kernel": _t_linear(sd["model.map_layer1.weight"]),
                           "bias": sd["model.map_layer1.bias"]}
    if "model.map_noise.freqs" in sd:
        model["map_noise"] = {}  # buffer handled separately
    for k in sd:
        parts = k.split(".")
        if len(parts) < 3 or parts[0] != "model":
            continue
        section, block_name = parts[1], parts[2]
        if section not in ("enc", "dec", "dec2"):
            continue
        res = block_name.split("x")[0]
        rest = block_name.split("_", 1)[1]
        ours = f"{section}_{res}_{rest}"
        if ours in model:
            continue
        tp = f"model.{section}.{block_name}"
        if rest == "conv" or rest.startswith("aux_"):
            w = sd.get(f"{tp}.weight")
            if w is None:
                continue  # kernel-0 resample-only conv (no params)
            if w.ndim == 1:  # aux_norm GroupNorm
                model[ours] = {"scale": w, "bias": sd[f"{tp}.bias"]}
            else:
                model[ours] = {"kernel": _t_conv(w)}
                if f"{tp}.bias" in sd:
                    model[ours]["bias"] = sd[f"{tp}.bias"]
        else:
            model[ours] = _convert_unet_block(sd, tp, heads=1)
    for d in ("1", "2"):
        if f"model.decouple{d}.0.weight" in sd:
            model[f"decouple{d}"] = {
                "conv": {"kernel": _t_conv(sd[f"model.decouple{d}.0.weight"]),
                         "bias": sd[f"model.decouple{d}.0.bias"]},
                "att": _convert_spatial_att(sd, f"model.decouple{d}.1"),
            }
    return model


def test_song_unet_forward_parity():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from unet.uncond_unet import EDMPrecond as TorchEDM

    from adm_tpu.nn.unets import EDMPrecond

    kw = dict(model_channels=32, channel_mult=[1, 2], channel_mult_emb=2,
              num_blocks=2, attn_resolutions=[8], dropout=0.0,
              embedding_type="positional", channel_mult_noise=1,
              encoder_type="residual", decoder_type="standard",
              resample_filter=[1, 3, 3, 1])
    torch.manual_seed(0)
    tm = TorchEDM(img_resolution=16, img_channels=3, sigma_data=1.0,
                  model_type="SongUNet", **kw)
    tm.eval()

    model = _convert_song(tm.state_dict())
    # aux norm blocks: GroupNorm scale/bias naming
    params = {"params": {"model": {
        k: v for k, v in model.items() if not k.endswith("aux_norm") or True
    }}}
    params = jax.tree_util.tree_map(jnp.asarray, params)

    jkw = dict(kw)
    jkw["channel_mult"] = tuple(kw["channel_mult"])
    jkw["attn_resolutions"] = tuple(kw["attn_resolutions"])
    jkw["resample_filter"] = tuple(kw["resample_filter"])
    net = EDMPrecond(img_resolution=16, img_channels=3, sigma_data=1.0,
                     model_type="SongUNet", variant="const", n_decoders=2,
                     model_kwargs=jkw)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)
    t = np.asarray([0.3, 0.8], np.float32)
    with torch.no_grad():
        a_t, b_t = tm(torch.from_numpy(x), torch.from_numpy(t))
    a_j, b_j = net.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                         jnp.asarray(t))
    np.testing.assert_allclose(
        np.asarray(a_j), a_t.numpy().transpose(0, 2, 3, 1), atol=5e-4,
        err_msg="Song D_x mismatch")
    np.testing.assert_allclose(
        np.asarray(b_j), b_t.numpy().transpose(0, 2, 3, 1), atol=5e-4,
        err_msg="Song D_y mismatch")
