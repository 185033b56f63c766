"""Real-weights drop rehearsal (VERDICT r4 next #5).

The env has no egress, so the pretrained files the reference downloads at
runtime (torch-fidelity Inception weights, torchvision VGG16 for LPIPS,
CompVis kl-f* VAE checkpoints, OpenAI CLIP) have never been ingested
end-to-end. These tests fabricate random-VALUED files in the EXACT
layouts of those artifacts (the key schema of the genuine file is the
vendored/receiving torch module's own state_dict), push each through the
production drop path — file -> `adm_tpu.cli.convert_weights` -> npz ->
dedicated loader -> forward — and compare against the torch source
elementwise. The day real weights appear, nothing new has to be written.

Reference drop points: metrics/feature_extractor_inceptionv3.py:19-20
(FID weights URL), taming/modules/losses/lpips.py:10-54 (VGG16),
ddm/encoder_decoder.py:934-940 (init_from_ckpt), ddm/webdata.py:53 (CLIP).
"""

from __future__ import annotations

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _run_convert_cli(monkeypatch, *argv):
    from adm_tpu.cli import convert_weights

    monkeypatch.setattr(sys, "argv", ["convert_weights", *map(str, argv)])
    convert_weights.main()


# ---------------------------------------------------------------------------
# 1. torch-fidelity Inception .pth  ->  real '2048' FID features
# ---------------------------------------------------------------------------

def test_inception_pth_drop(tmp_path, monkeypatch):
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import metrics.feature_extractor_inceptionv3 as fx

    torch.manual_seed(0)
    orig_load = torch.nn.Module.load_state_dict
    fx.load_state_dict_from_url = lambda *a, **k: {}
    torch.nn.Module.load_state_dict = lambda self, sd, strict=True: None
    try:
        ref = fx.FeatureExtractorInceptionV3("x", features_list=["2048"])
    finally:
        torch.nn.Module.load_state_dict = orig_load
    ref.eval()
    # keep random-init activations alive through the depth (see
    # test_metrics.test_inception_architecture_parity)
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if name.endswith("conv.weight"):
                p.mul_(1.8)
            if name.endswith("bn.bias"):
                p.add_(0.05)

    # the genuine weights-inception-2015-12-05 file IS this state_dict
    pth = tmp_path / "weights-inception-2015-12-05.pth"
    torch.save(ref.state_dict(), str(pth))
    npz = tmp_path / "inception.npz"
    _run_convert_cli(monkeypatch, "inception", pth, npz)

    from adm_tpu.metrics.metric import (
        extract_features, fid_feature_key, load_inception_params)

    # real weights must route to the standard '2048' pool, never the proxy
    assert fid_feature_key(str(npz)) == "2048"
    assert fid_feature_key(str(pth)) == "2048"

    rng = np.random.RandomState(0)
    imgs_nchw = rng.randint(0, 256, (4, 3, 64, 64)).astype(np.uint8)
    with torch.no_grad():
        want = ref(torch.from_numpy(imgs_nchw))[0].numpy()

    for path in (npz, pth):  # both accepted file formats
        params = load_inception_params(str(path))
        got = extract_features(
            imgs_nchw.transpose(0, 2, 3, 1), params, ("2048",),
            batch_size=4)["2048"]
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3,
                                   atol=2e-4)


# ---------------------------------------------------------------------------
# 2. torchvision vgg16 .pth  ->  LPIPS backbone via ADM_TPU_VGG16_WEIGHTS
# ---------------------------------------------------------------------------

# torchvision vgg16 'D' config: conv layer indices in the features stack
_VGG16_CONVS = [
    (0, 3, 64), (2, 64, 64),
    (5, 64, 128), (7, 128, 128),
    (10, 128, 256), (12, 256, 256), (14, 256, 256),
    (17, 256, 512), (19, 512, 512), (21, 512, 512),
    (24, 512, 512), (26, 512, 512), (28, 512, 512),
]


def test_vgg16_pth_drop(tmp_path, monkeypatch):
    torch.manual_seed(1)
    sd = {}
    for idx, cin, cout in _VGG16_CONVS:
        sd[f"features.{idx}.weight"] = torch.randn(cout, cin, 3, 3) * 0.05
        sd[f"features.{idx}.bias"] = torch.randn(cout) * 0.05
    # the genuine torchvision file also carries the classifier head —
    # present in the drop, ignored by the converter
    sd["classifier.0.weight"] = torch.randn(4096, 25088)
    sd["classifier.0.bias"] = torch.randn(4096)

    pth = tmp_path / "vgg16-397923af.pth"
    torch.save(sd, str(pth))
    npz = tmp_path / "vgg16.npz"
    _run_convert_cli(monkeypatch, "vgg16", pth, npz)

    from adm_tpu.metrics.lpips import build_lpips_params, make_perceptual_fn

    monkeypatch.setenv("ADM_TPU_VGG16_WEIGHTS", str(npz))
    params_env = build_lpips_params(
        lin_path="/root/reference/taming/modules/autoencoder/lpips/vgg.pth")
    # the env-file route must agree exactly with the in-memory converter
    # route (whose output is parity-tested vs torch in test_lpips)
    params_mem = build_lpips_params(
        lin_path="/root/reference/taming/modules/autoencoder/lpips/vgg.pth",
        vgg_sd=sd)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        params_env, params_mem)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 16, 3).astype(np.float32)
    y = rng.randn(2, 16, 16, 3).astype(np.float32)
    d = make_perceptual_fn(params_env)(jnp.asarray(x), jnp.asarray(y))
    assert d.shape == (2,) and bool(jnp.all(jnp.isfinite(d))) and float(
        jnp.min(d)) > 0


# ---------------------------------------------------------------------------
# 3. CompVis kl-f* .ckpt ('state_dict' key, loss.* extras)  ->  VAE params
# ---------------------------------------------------------------------------

_DD = dict(double_z=True, z_channels=3, resolution=(32, 32), in_channels=3,
           out_ch=3, ch=32, ch_mult=[1, 2], num_res_blocks=1,
           attn_resolutions=[], dropout=0.0)


def test_compvis_vae_ckpt_drop(tmp_path, monkeypatch):
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
    enc, dec = RefEncoder(**_DD).eval(), RefDecoder(**_DD).eval()
    zc = _DD["z_channels"]
    sd = {f"encoder.{k}": v for k, v in enc.state_dict().items()}
    sd.update({f"decoder.{k}": v for k, v in dec.state_dict().items()})
    sd["quant_conv.weight"] = torch.randn(2 * zc, 2 * zc, 1, 1) * 0.3
    sd["quant_conv.bias"] = torch.randn(2 * zc) * 0.01
    sd["post_quant_conv.weight"] = torch.randn(zc, zc, 1, 1) * 0.3
    sd["post_quant_conv.bias"] = torch.randn(zc) * 0.01
    # a genuine CompVis ckpt nests under 'state_dict' and carries the
    # LPIPS-discriminator loss tower — ignored by the converter
    ckpt = {"state_dict": dict(
        sd, **{"loss.discriminator.main.0.weight": torch.randn(4, 3, 4, 4)}),
        "global_step": 123}
    path = tmp_path / "kl-f4.ckpt"
    torch.save(ckpt, str(path))
    npz = tmp_path / "vae.npz"
    _run_convert_cli(monkeypatch, "vae", path, npz)

    from adm_tpu.vae.autoencoder import AutoencoderKL

    tree = np.load(npz, allow_pickle=True)["params"].item()
    dd = dict(_DD, ch_mult=(1, 2), attn_resolutions=())
    module = AutoencoderKL(ddconfig=dd, embed_dim=zc)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        moments_want = torch.nn.functional.conv2d(
            enc(torch.from_numpy(x)),
            ckpt["state_dict"]["quant_conv.weight"],
            ckpt["state_dict"]["quant_conv.bias"]).numpy()
    post = module.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, tree["params"]
                                          if "params" in tree else tree)},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        method=AutoencoderKL.encode)
    got = np.concatenate([np.asarray(post.mean), np.asarray(post.logvar)],
                         axis=-1).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, moments_want, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# 4. OpenAI CLIP checkpoint (text tower + visual extras)  ->  CLIPTextEncoder
# ---------------------------------------------------------------------------

def _quick_gelu(x):
    return x * torch.sigmoid(1.702 * x)


def _torch_clip_text(sd, tokens, width, heads, layers):
    """Transcription of OpenAI CLIP's encode_text (the reference consumes
    it through `clip.load` at ddm/webdata.py:53): token+positional embed,
    pre-LN resblocks with causal attention and QuickGELU, ln_final,
    argmax-token pool, text projection."""
    x = sd["token_embedding.weight"][tokens] + sd["positional_embedding"]
    n = tokens.shape[1]
    mask = torch.triu(torch.full((n, n), float("-inf")), diagonal=1)
    hd = width // heads

    def ln(x, w, b):
        return torch.nn.functional.layer_norm(x, (width,), w, b)

    for i in range(layers):
        p = f"transformer.resblocks.{i}"
        h = ln(x, sd[f"{p}.ln_1.weight"], sd[f"{p}.ln_1.bias"])
        qkv = h @ sd[f"{p}.attn.in_proj_weight"].T + sd[f"{p}.attn.in_proj_bias"]
        q, k, v = qkv.chunk(3, dim=-1)
        b, n, _ = q.shape

        def split(t):
            return t.reshape(b, n, heads, hd).transpose(1, 2)

        att = (split(q) @ split(k).transpose(-1, -2)) / hd ** 0.5 + mask
        att = att.softmax(dim=-1) @ split(v)
        att = att.transpose(1, 2).reshape(b, n, width)
        x = x + att @ sd[f"{p}.attn.out_proj.weight"].T + sd[
            f"{p}.attn.out_proj.bias"]
        h = ln(x, sd[f"{p}.ln_2.weight"], sd[f"{p}.ln_2.bias"])
        h = _quick_gelu(h @ sd[f"{p}.mlp.c_fc.weight"].T + sd[f"{p}.mlp.c_fc.bias"])
        x = x + h @ sd[f"{p}.mlp.c_proj.weight"].T + sd[f"{p}.mlp.c_proj.bias"]
    x = ln(x, sd["ln_final.weight"], sd["ln_final.bias"])
    pooled = x[torch.arange(x.shape[0]), tokens.argmax(dim=-1)]
    return pooled @ sd["text_projection"]


def test_clip_text_ckpt_drop(tmp_path, monkeypatch):
    width, heads, layers, vocab, ctx, embed = 64, 4, 2, 300, 16, 32
    torch.manual_seed(2)
    sd = {
        "token_embedding.weight": torch.randn(vocab, width) * 0.02,
        "positional_embedding": torch.randn(ctx, width) * 0.01,
        "ln_final.weight": torch.rand(width) + 0.5,
        "ln_final.bias": torch.randn(width) * 0.02,
        "text_projection": torch.randn(width, embed) * width ** -0.5,
        # a genuine CLIP checkpoint also carries the vision tower and
        # logit_scale — present in the drop, ignored by the converter
        "visual.conv1.weight": torch.randn(8, 3, 4, 4),
        "logit_scale": torch.tensor(4.6),
    }
    for i in range(layers):
        p = f"transformer.resblocks.{i}"
        sd[f"{p}.ln_1.weight"] = torch.rand(width) + 0.5
        sd[f"{p}.ln_1.bias"] = torch.randn(width) * 0.02
        sd[f"{p}.ln_2.weight"] = torch.rand(width) + 0.5
        sd[f"{p}.ln_2.bias"] = torch.randn(width) * 0.02
        sd[f"{p}.attn.in_proj_weight"] = torch.randn(3 * width, width) * 0.05
        sd[f"{p}.attn.in_proj_bias"] = torch.randn(3 * width) * 0.01
        sd[f"{p}.attn.out_proj.weight"] = torch.randn(width, width) * 0.05
        sd[f"{p}.attn.out_proj.bias"] = torch.randn(width) * 0.01
        sd[f"{p}.mlp.c_fc.weight"] = torch.randn(4 * width, width) * 0.05
        sd[f"{p}.mlp.c_fc.bias"] = torch.randn(4 * width) * 0.01
        sd[f"{p}.mlp.c_proj.weight"] = torch.randn(width, 4 * width) * 0.05
        sd[f"{p}.mlp.c_proj.bias"] = torch.randn(width) * 0.01

    path = tmp_path / "ViT-B-32.pt"
    torch.save(sd, str(path))
    npz = tmp_path / "clip_text.npz"
    _run_convert_cli(monkeypatch, "clip", path, npz)

    from adm_tpu.nn.text_encoder import CLIPTextEncoder

    tree = np.load(npz, allow_pickle=True)["params"].item()
    enc = CLIPTextEncoder(vocab_size=vocab, context_length=ctx, width=width,
                          layers=layers, heads=heads, embed_dim=embed,
                          act="quick_gelu")
    rng = np.random.RandomState(0)
    tokens = rng.randint(1, vocab, (3, ctx)).astype(np.int32)
    tokens[:, -1] = vocab - 1  # a clear argmax "eos" slot, CLIP-style
    got = enc.apply(jax.tree_util.tree_map(jnp.asarray, tree),
                    jnp.asarray(tokens))
    with torch.no_grad():
        want = _torch_clip_text(sd, torch.from_numpy(tokens.astype(np.int64)),
                                width, heads, layers).numpy()
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
