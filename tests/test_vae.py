"""VAE: roundtrip shapes, posterior math, GAN trainer smoke on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adm_tpu.data.loader import batch_iterator
from adm_tpu.data.synthetic import SyntheticImages
from adm_tpu.train.state import EmaConfig
from adm_tpu.vae.autoencoder import (
    AutoencoderKL,
    DiagonalGaussianDistribution,
    FirstStage,
    apply_conv_out,
)
from adm_tpu.vae.losses import (
    NLayerDiscriminator,
    VAELossConfig,
    hinge_d_loss,
    vanilla_d_loss,
)
from adm_tpu.vae.trainer import VAETrainer

TINY_DD = dict(
    ch=16,
    out_ch=3,
    ch_mult=(1, 2),
    num_res_blocks=1,
    attn_resolutions=(),
    dropout=0.0,
    in_channels=3,
    resolution=32,
    z_channels=4,
    double_z=True,
)


@pytest.fixture(scope="module")
def vae_and_params():
    module = AutoencoderKL(ddconfig=TINY_DD, embed_dim=4)
    x = jnp.zeros((2, 32, 32, 3))
    params = module.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))
    return module, params


def test_vae_roundtrip_shapes(vae_and_params, rng):
    module, params = vae_and_params
    x = jax.random.normal(rng, (2, 32, 32, 3))
    recon, posterior = module.apply(params, x, jax.random.PRNGKey(1))
    assert recon.shape == x.shape
    # down_ratio = 2^(len(ch_mult)-1) = 2 -> latent 16x16x4
    assert posterior.mean.shape == (2, 16, 16, 4)
    assert module.down_ratio == 2


def test_posterior_math():
    """kl/nll of a standard normal posterior (mean 0, logvar 0)."""
    params = jnp.zeros((2, 4, 4, 8))  # mean 0 | logvar 0
    post = DiagonalGaussianDistribution(params)
    np.testing.assert_allclose(np.asarray(post.kl()), 0.0, atol=1e-6)
    nll = post.nll(jnp.zeros((2, 4, 4, 4)))
    # 0.5 * sum(log 2pi) over 64 elements
    np.testing.assert_allclose(
        np.asarray(nll), 0.5 * np.log(2 * np.pi) * 64, rtol=1e-5
    )
    s = post.sample(jax.random.PRNGKey(0))
    assert s.shape == (2, 4, 4, 4)


def test_decode_split_consistency(vae_and_params, rng):
    """decode == apply_conv_out(conv_out params, decode_pre)."""
    module, params = vae_and_params
    z = jax.random.normal(rng, (2, 16, 16, 4))
    full = module.apply(params, z, method=AutoencoderKL.decode)
    h_pre = module.apply(params, z, method=AutoencoderKL.decode_pre)
    w = params["params"]["decoder"]["conv_out"]
    split = apply_conv_out(w, h_pre)
    np.testing.assert_allclose(np.asarray(full), np.asarray(split), atol=1e-5)


def test_gan_loss_shapes():
    logits_r = jnp.ones((2, 4, 4, 1))
    logits_f = -jnp.ones((2, 4, 4, 1))
    assert float(hinge_d_loss(logits_r, logits_f)) == 0.0  # perfectly separated
    assert float(vanilla_d_loss(logits_r, logits_f)) > 0.0


def test_discriminator_patch_output(rng):
    disc = NLayerDiscriminator(ndf=16, n_layers=2)
    x = jax.random.normal(rng, (2, 32, 32, 3))
    params = disc.init(jax.random.PRNGKey(0), x)
    out = disc.apply(params, x)
    assert out.shape[0] == 2 and out.shape[-1] == 1
    assert out.shape[1] < 32  # patch logits, spatially reduced


def test_vae_trainer_smoke(devices):
    module = AutoencoderKL(ddconfig=TINY_DD, embed_dim=4)
    dataset = SyntheticImages(image_size=(32, 32), length=128)
    data_iter = batch_iterator(dataset, 16)
    trainer = VAETrainer(
        module,
        data_iter,
        image_size=(32, 32),
        loss_cfg=VAELossConfig(disc_start=5, kl_weight=1e-6, disc_num_layers=2),
        train_num_steps=12,
        train_lr=1e-4,
        warmup_steps=2,
        log_freq=4,
        save_and_sample_every=0,
        results_folder="/tmp/adm_vae_test",
        ema_cfg=EmaConfig(update_after_step=0, update_every=1, beta=0.99),
    )
    state = trainer.train()
    assert int(state.step) == 12
    # after disc_start, discriminator loss must engage (disc_factor=1)
    x = jnp.zeros((2, 32, 32, 3))
    recon = trainer._recon(state.ae_params, x, jax.random.PRNGKey(0))
    assert recon.shape == x.shape
    assert bool(jnp.isfinite(recon).all())


def test_first_stage_adapter(vae_and_params, rng):
    module, params = vae_and_params
    fs = FirstStage(module)
    x = jax.random.normal(rng, (2, 32, 32, 3))
    z = fs.encode_sample(params, x, jax.random.PRNGKey(0))
    assert z.shape == (2, 16, 16, 4)
    out = fs.decode(params, z)
    assert out.shape == (2, 32, 32, 3)
