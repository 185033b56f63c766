"""Cond-backbone caching in the sampling loop (core/diffusion.py
_cond_cached_fn): CondUnet's backbone + projections depend only on `cond`,
constant across the scan — hoisting them is EXACT, so the cached sampler
must match the per-step-recompute path bit for bit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adm_tpu.core.diffusion import DDPM
from adm_tpu.nn.cond_unet import CondUnet

RES = 16


@pytest.fixture(scope="module")
def model_and_params():
    net = CondUnet(
        dim=16, dim_mults=(1, 2), channels=1, cond_in_dim=3,
        window_sizes1=[[4, 4], [2, 2]], window_sizes2=[[4, 4], [2, 2]],
        resnet_block_groups=4, cond_net="conv", n_decoders=2,
    )
    model = DDPM(net=net, process_name="const", image_size=(RES, RES),
                 channels=1, sampling_timesteps=4,
                 cond_shape=(RES, RES, 3))
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_cond_cache_mode_bitexact(model_and_params):
    model, params = model_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, RES, RES, 1))
    t = jnp.array([0.6, 0.2], jnp.float32)
    cond = jax.random.uniform(jax.random.PRNGKey(2), (2, RES, RES, 3))
    full = model.net.apply(params, x, t, cond)
    cache = model.net.apply(params, x, t, cond, mode="cond_cache")
    split = model.net.apply(params, x, t, cond, mode="main", cache=cache)
    for a, b in zip(full, split):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cached_sampling_bitexact(model_and_params, monkeypatch):
    model, params = model_and_params
    key = jax.random.PRNGKey(3)
    cond = jax.random.uniform(jax.random.PRNGKey(4), (2, RES, RES, 3))

    cached = jax.jit(lambda p, k: model.sample(p, k, cond=cond))(params, key)
    monkeypatch.setattr(CondUnet, "supports_cond_cache", False)
    plain = jax.jit(lambda p, k: model.sample(p, k, cond=cond))(params, key)
    np.testing.assert_array_equal(np.asarray(cached), np.asarray(plain))


def test_t2i_text_cache_bitexact():
    """Text2ImgUnet: the CLIP tower + projections depend only on tokens —
    cond_cache/main must compose to the full apply bitwise, and the
    cached sampler must match the per-step path."""
    from adm_tpu.nn.t2i_unet import Text2ImgUnet
    from adm_tpu.nn.text_encoder import ByteTokenizer

    net = Text2ImgUnet(
        dim=16, dim_mults=(1, 2), channels=3,
        window_sizes1=((4, 4), (2, 2)), resnet_block_groups=4,
        text_encoder_cfg=dict(vocab_size=300, layers=1, width=32, heads=2),
        text_dim=512,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    tokens = jnp.asarray(ByteTokenizer()(["red square", "blue circle"]))
    t = jnp.array([0.4, 0.7], jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x, t, tokens)
    full = net.apply(params, x, t, tokens)
    cache = net.apply(params, x, t, tokens, mode="cond_cache")
    split = net.apply(params, x, t, tokens, mode="main", cache=cache)
    for a, b in zip(full, split):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    model = DDPM(net=net, process_name="const", image_size=(16, 16),
                 channels=3, sampling_timesteps=4,
                 cond_shape=(tokens.shape[1],), cond_dtype="int32")
    cached = jax.jit(lambda p, k: model.sample(p, k, cond=tokens))(
        params, jax.random.PRNGKey(3))
    import unittest.mock as mock
    with mock.patch.object(Text2ImgUnet, "supports_cond_cache", False):
        plain = jax.jit(lambda p, k: model.sample(p, k, cond=tokens))(
            params, jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(cached), np.asarray(plain))
