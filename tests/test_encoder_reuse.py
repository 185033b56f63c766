"""Encoder-propagation sampling ("Faster Diffusion", arXiv 2312.09608 —
PAPERS.md): the UNet encoder runs every k-th denoising step; decoders run
over the cached (bottleneck, skips) in between, with the time embedding
recomputed per step. Beyond-reference serving feature (opt-in,
`DDPM.sample(encoder_reuse=k)`); k=1 is the unchanged reference path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adm_tpu.core.diffusion import DDPM
from adm_tpu.nn.unets import EDMPrecond

RES = 16


@pytest.fixture(scope="module")
def model_and_params():
    net = EDMPrecond(
        img_resolution=RES, img_channels=3, sigma_data=1.0, variant="const",
        n_decoders=2, dtype=jnp.float32,
        model_kwargs=dict(model_channels=32, channel_mult=(1, 2),
                          num_blocks=1, attn_resolutions=(8,), dropout=0.0),
    )
    model = DDPM(net=net, process_name="const", image_size=(RES, RES),
                 channels=3, sampling_timesteps=10)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_encode_decode_bitexact_vs_full(model_and_params):
    """encode+decode composed at ONE step must equal the full apply
    bitwise — same ops, split at the bottleneck."""
    model, params = model_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, RES, RES, 3))
    t = jnp.array([0.7, 0.3], jnp.float32)
    full = model.net.apply(params, x, t)
    cache = model.net.apply(params, x, t, mode="encode")
    split = model.net.apply(params, x, t, mode="decode", cache=cache)
    for a, b in zip(full, split):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sample_with_reuse_runs_and_stays_close(model_and_params):
    """Reused-encoder sampling must jit, stay finite, and remain close to
    the exact sampler — adjacent-step encoder drift is the small term the
    technique exploits (measured ~1e-2 at random weights, 10 steps, k=2)."""
    model, params = model_and_params
    key = jax.random.PRNGKey(2)
    noise = jax.random.normal(jax.random.PRNGKey(3), (2, RES, RES, 3))

    base = jax.jit(
        lambda p, k: model.sample(p, k, batch_size=2, init_noise=noise)
    )(params, key)
    reuse2 = jax.jit(
        lambda p, k: model.sample(p, k, batch_size=2, init_noise=noise,
                                  encoder_reuse=2)
    )(params, key)
    assert bool(jnp.all(jnp.isfinite(reuse2)))
    assert base.shape == reuse2.shape
    # outputs live in [0,1]; random-weight drift must stay a small fraction
    diff = float(jnp.mean(jnp.abs(base - reuse2)))
    assert diff < 0.1, f"encoder-reuse drift too large: {diff}"
    # maximal reuse (encode once) still runs and is finite
    reuse10 = jax.jit(
        lambda p, k: model.sample(p, k, batch_size=2, init_noise=noise,
                                  encoder_reuse=10)
    )(params, key)
    assert bool(jnp.all(jnp.isfinite(reuse10)))


def test_reuse_rejects_conditional(model_and_params):
    model, params = model_and_params
    with pytest.raises(NotImplementedError, match="encoder_reuse"):
        model.sample(params, jax.random.PRNGKey(0),
                     cond=jnp.zeros((2, RES, RES, 3)), encoder_reuse=2)


def test_stochastic_sampler_reuse_runs(model_and_params):
    """The stochastic family (image-space sample_fn_s) supports encoder
    propagation too: runs under jit, finite, close to the exact path."""
    import dataclasses

    model, params = model_and_params
    model_s = dataclasses.replace(model, sample_type="stochastic")
    key = jax.random.PRNGKey(5)
    noise = jax.random.normal(jax.random.PRNGKey(6), (2, RES, RES, 3))
    base = jax.jit(
        lambda p, k: model_s.sample(p, k, batch_size=2, init_noise=noise)
    )(params, key)
    reuse = jax.jit(
        lambda p, k: model_s.sample(p, k, batch_size=2, init_noise=noise,
                                    encoder_reuse=2)
    )(params, key)
    assert bool(jnp.all(jnp.isfinite(reuse)))
    diff = float(jnp.mean(jnp.abs(base - reuse)))
    assert diff < 0.1, f"stochastic encoder-reuse drift too large: {diff}"


def test_ldm_sampler_reuse_runs():
    """LatentDiffusion.sample(encoder_reuse=k): encoder propagation in the
    LATENT sampler, decoded through the first stage."""
    from adm_tpu.core.diffusion import LatentDiffusion
    from adm_tpu.vae.autoencoder import AutoencoderKL, FirstStage

    dd = dict(ch=8, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
              attn_resolutions=[], in_channels=3, resolution=32,
              z_channels=4, double_z=True)
    vae = AutoencoderKL(ddconfig=dd, embed_dim=4)
    fs = FirstStage(vae)
    fs_params = fs.init(jax.random.PRNGKey(0), (32, 32), 3)
    net = EDMPrecond(
        img_resolution=16, img_channels=4, variant="const2", n_decoders=2,
        model_kwargs=dict(model_channels=16, channel_mult=(1, 2),
                          num_blocks=1, attn_resolutions=(8,), dropout=0.0),
    )
    model = LatentDiffusion(
        net=net, process_name="const2", image_size=(32, 32), channels=4,
        sampling_timesteps=4, first_stage=fs, scale_factor=2.0,
        scale_by_std=True,
    )
    params = model.init(jax.random.PRNGKey(1))
    noise = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 4))
    base = jax.jit(lambda p, f: model.sample(
        p, jax.random.PRNGKey(3), batch_size=2, fs_params=f,
        init_noise=noise))(params, fs_params)
    reuse = jax.jit(lambda p, f: model.sample(
        p, jax.random.PRNGKey(3), batch_size=2, fs_params=f,
        init_noise=noise, encoder_reuse=2))(params, fs_params)
    assert base.shape == reuse.shape == (2, 32, 32, 3)
    assert bool(jnp.all(jnp.isfinite(reuse)))
    diff = float(jnp.mean(jnp.abs(base - reuse)))
    assert diff < 0.1, f"LDM encoder-reuse drift too large: {diff}"


def test_songunet_mode_raises_clearly():
    from adm_tpu.nn.unets import EDMPrecond as _EP

    net = _EP(img_resolution=16, img_channels=3, model_type="SongUNet",
              variant="const", n_decoders=2,
              model_kwargs=dict(model_channels=16, channel_mult=(1, 2),
                                num_blocks=1, attn_resolutions=()))
    x = jnp.zeros((1, 16, 16, 3))
    t = jnp.full((1,), 0.5)
    params = net.init(jax.random.PRNGKey(0), x, t)
    with pytest.raises(NotImplementedError, match="DhariwalUNet only"):
        net.apply(params, x, t, mode="encode")
