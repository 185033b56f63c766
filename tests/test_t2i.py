"""Text2img: tokenizer, text encoder, CondAttention UNet end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np

from adm_tpu.nn.t2i_unet import CondAttention, Text2ImgUnet
from adm_tpu.nn.text_encoder import ByteTokenizer, CLIPTextEncoder


def test_byte_tokenizer():
    tok = ByteTokenizer()
    ids = tok(["a cat", "a very long prompt " * 20])
    assert ids.shape == (2, 77)
    assert ids[0, 0] == tok.bos
    assert tok.eos in ids[0]
    assert tok.eos in ids[1]  # truncation still terminates with eos


def test_text_encoder_shapes(rng):
    enc = CLIPTextEncoder(vocab_size=300, layers=2, width=64, heads=4, embed_dim=128)
    tokens = jnp.asarray(ByteTokenizer()(["hello", "world"]))
    params = enc.init(rng, tokens)
    emb = enc.apply(params, tokens)
    assert emb.shape == (2, 128)
    # different text -> different embedding
    emb2 = enc.apply(params, jnp.asarray(ByteTokenizer()(["goodbye", "moon"])))
    assert not bool(jnp.allclose(emb, emb2))


def test_cond_attention(rng):
    att = CondAttention(dim=32, window_size_q=(4, 4))
    x = jax.random.normal(rng, (2, 16, 16, 32))
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, 128))
    params = att.init(jax.random.PRNGKey(0), x, cond)
    out = att.apply(params, x, cond)
    assert out.shape == x.shape
    out2 = att.apply(params, x, cond * 2)
    assert not bool(jnp.allclose(out, out2))  # text changes output


def test_t2i_unet_forward(rng):
    model = Text2ImgUnet(
        dim=16, dim_mults=(1, 2), channels=3,
        window_sizes1=((4, 4), (2, 2)), resnet_block_groups=4,
        text_encoder_cfg=dict(vocab_size=300, layers=1, width=32, heads=2),
        text_dim=512,
    )
    x = jax.random.normal(rng, (2, 16, 16, 3))
    tokens = jnp.asarray(ByteTokenizer()(["red square", "blue circle"]))
    t = jnp.array([0.4, 0.7])
    params = model.init(jax.random.PRNGKey(0), x, t, tokens)
    x1, x2 = model.apply(params, x, t, tokens)
    assert x1.shape == x.shape and x2.shape == x.shape
    tb = t.reshape(-1, 1, 1, 1)
    np.testing.assert_allclose(
        np.asarray(x2), np.asarray((x - (tb - 1) * x1) / jnp.sqrt(tb)), atol=1e-5
    )


def test_t2i_config_and_training(rng):
    from adm_tpu.utils.config import build_model

    cfg = {
        "class_name": "ddm.ddm_const.DDPM",
        "image_size": [16, 16],
        "sampling_timesteps": 2,
        "weighting_loss": True,
        "unet": {
            "class_name": "unet.cond_unet_t2i.Unet",
            "dim": 16, "dim_mults": [1, 2], "channels": 3,
            "window_sizes1": [[4, 4], [2, 2]], "resnet_block_groups": 4,
            "context_length": 77,
        },
    }
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    tokens = ByteTokenizer()(["a", "b", "c", "d"])
    batch = {
        "image": jax.random.uniform(rng, (4, 16, 16, 3), minval=-1, maxval=1),
        "cond": jnp.asarray(tokens),
    }
    loss, _ = jax.jit(lambda p, b, k: model.training_step(p, b, k))(
        params, batch, jax.random.PRNGKey(1)
    )
    assert bool(jnp.isfinite(loss))
    imgs = model.sample(params, jax.random.PRNGKey(2), cond=jnp.asarray(tokens))
    assert imgs.shape == (4, 16, 16, 3)
