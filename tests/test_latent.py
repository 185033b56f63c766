"""LatentDiffusion: encode->diffuse->decode pipeline on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adm_tpu.core.diffusion import LatentDiffusion
from adm_tpu.nn.unets import EDMPrecond
from adm_tpu.vae.autoencoder import AutoencoderKL, FirstStage

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
TINY_UNET = dict(model_channels=16, channel_mult=(1, 2), num_blocks=1,
                 attn_resolutions=(8,), dropout=0.0)


@pytest.fixture(scope="module")
def ldm_setup():
    vae = AutoencoderKL(ddconfig=TINY_DD, embed_dim=4)
    fs = FirstStage(vae)
    fs_params = fs.init(jax.random.PRNGKey(0), (32, 32), 3)
    net = EDMPrecond(
        img_resolution=16, img_channels=4, variant="const2", n_decoders=2,
        model_kwargs=TINY_UNET,
    )
    model = LatentDiffusion(
        net=net,
        process_name="const2",
        image_size=(32, 32),
        channels=4,
        sampling_timesteps=4,
        weighting_loss=True,
        first_stage=fs,
        scale_factor=2.0,
        scale_by_std=True,
    )
    params = model.init(jax.random.PRNGKey(1))
    return model, params, fs_params


def test_ldm_init_shapes(ldm_setup):
    model, params, fs_params = ldm_setup
    # net must consume latent-resolution latents
    z = jnp.zeros((2, 16, 16, 4))
    t = jnp.array([0.5, 0.5])
    d, n = model.apply_net(params, z, t)
    assert d.shape == z.shape and n.shape == z.shape


def test_ldm_training_step(ldm_setup, rng):
    model, params, fs_params = ldm_setup
    batch = {"image": jax.random.normal(rng, (4, 32, 32, 3))}
    loss, logs = model.training_step(params, batch, jax.random.PRNGKey(2),
                                     fs_params=fs_params)
    assert jnp.isfinite(loss)
    assert "train/loss_simple" in logs

    # jit + grad
    def loss_fn(p):
        return model.training_step(p, batch, jax.random.PRNGKey(2),
                                   fs_params=fs_params)[0]

    g = jax.jit(jax.grad(loss_fn))(params)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_ldm_sample_decodes_to_image_space(ldm_setup):
    model, params, fs_params = ldm_setup
    imgs = model.sample(params, jax.random.PRNGKey(3), batch_size=2,
                        fs_params=fs_params)
    assert imgs.shape == (2, 32, 32, 3)
    assert float(jnp.min(imgs)) >= 0.0 and float(jnp.max(imgs)) <= 1.0


def test_ldm_scale_calibration(ldm_setup, rng):
    model, params, fs_params = ldm_setup
    x = jax.random.normal(rng, (8, 32, 32, 3))
    sf = model.calibrate_scale_factor(fs_params, x, jax.random.PRNGKey(0))
    z = model.first_stage.encode_sample(fs_params, x, jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        float(sf), 1.0 / float(jnp.std(z.reshape(-1))), rtol=1e-5
    )


def test_ldm_softsign_scaling(ldm_setup, rng):
    model, params, fs_params = ldm_setup
    import dataclasses

    m2 = dataclasses.replace(model, scale_by_softsign=True, scale_by_std=False)
    x = jax.random.normal(rng, (2, 32, 32, 3))
    z = m2.encode_input(fs_params, x, jax.random.PRNGKey(0))
    assert float(jnp.max(jnp.abs(z))) < 1.0  # softsign bounds to (-1,1)
