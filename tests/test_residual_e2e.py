"""Residual process end-to-end: training diffuses x - ref; sampling
reconstructs ref + residual (reference ddm/ddm_res.py semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adm_tpu.nn.unets import EDMPrecond
from adm_tpu.utils.config import build_model

TINY = dict(
    dim=16, dim_mults=(1, 2), channels=3, cond_in_dim=3,
    window_sizes1=((4, 4), (2, 2)), window_sizes2=((4, 4), (2, 2)),
    cond_net="conv", resnet_block_groups=4,
)


@pytest.fixture(scope="module")
def res_model():
    cfg = {
        "class_name": "ddm.ddm_res.DDPM",
        "image_size": [32, 32],
        "sampling_timesteps": 3,
        "weighting_loss": True,
        "unet": {
            "class_name": "unet.cond_unet_sd.Unet",
            **{k: list(v) if isinstance(v, tuple) else v for k, v in TINY.items()},
        },
    }
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_residual_training_requires_ref(res_model, rng):
    model, params = res_model
    batch = {"image": jax.random.uniform(rng, (2, 32, 32, 3), minval=-1, maxval=1)}
    with pytest.raises(ValueError, match="ref"):
        model.training_step(params, batch, jax.random.PRNGKey(1))


def test_residual_ldm_trains_on_latent_residual(rng, monkeypatch):
    """res LatentDiffusion diffuses z - ref_z (ddm/ddm_res.py:744-752) and
    sampling decodes (ref + z)/scale_factor (:829-837,867)."""
    from adm_tpu.core.diffusion import LatentDiffusion
    from adm_tpu.nn.unets import EDMPrecond
    from adm_tpu.vae.autoencoder import AutoencoderKL, FirstStage

    from tests.test_latent import TINY_DD, TINY_UNET

    fs = FirstStage(AutoencoderKL(ddconfig=TINY_DD, embed_dim=4))
    fs_params = fs.init(jax.random.PRNGKey(0), (32, 32), 3)
    net = EDMPrecond(
        img_resolution=16, img_channels=4, variant="const", n_decoders=2,
        model_kwargs=TINY_UNET,
    )
    model = LatentDiffusion(
        net=net, process_name="res", image_size=(32, 32), channels=4,
        sampling_timesteps=2, first_stage=fs, scale_factor=2.0,
        scale_by_std=True,
    )
    params = model.init(jax.random.PRNGKey(1))
    img = jax.random.uniform(rng, (2, 32, 32, 3), minval=-1, maxval=1)
    ref = jax.random.uniform(jax.random.PRNGKey(9), (2, 32, 32, 3),
                             minval=-1, maxval=1)

    # spy on p_losses: the diffused variable must be EXACTLY z - ref_z for
    # the same per-branch encode keys training_step derives
    captured = {}
    orig = LatentDiffusion.p_losses

    def spy(self, p, x_start, t, key, cond=None, train=True, extras=None):
        captured["x_start"] = x_start
        captured["extras"] = extras
        return orig(self, p, x_start, t, key, cond, train=train, extras=extras)

    monkeypatch.setattr(LatentDiffusion, "p_losses", spy)
    key = jax.random.PRNGKey(3)
    batch = {"image": img, "ref": ref}
    loss, _ = model.training_step(params, batch, key, fs_params=fs_params)
    assert bool(jnp.isfinite(loss))
    k_e, k_r, *_ = jax.random.split(key, 4)
    z = model.encode_input(fs_params, img, k_e)
    ref_z = model.encode_input(fs_params, ref, k_r)
    np.testing.assert_allclose(
        np.asarray(captured["x_start"]), np.asarray(z - ref_z), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(captured["extras"]["ref_z"]), np.asarray(ref_z), atol=1e-6
    )
    monkeypatch.undo()

    # missing ref raises
    with pytest.raises(ValueError, match="ref"):
        model.training_step(
            params, {"image": img}, jax.random.PRNGKey(3), fs_params=fs_params
        )

    # sampling applies the decode_first_stage 1/scale_factor inverse:
    # doubling scale_factor must change the decoded output
    ref_z = model.encode_input(fs_params, img, jax.random.PRNGKey(4))
    out1 = model.sample(
        params, jax.random.PRNGKey(5), batch_size=2, fs_params=fs_params,
        ref=ref_z,
    )
    import dataclasses

    model2 = dataclasses.replace(model, scale_factor=4.0)
    out2 = model2.sample(
        params, jax.random.PRNGKey(5), batch_size=2, fs_params=fs_params,
        ref=ref_z,
    )
    assert out1.shape == (2, 32, 32, 3)
    assert float(jnp.abs(out1 - out2).max()) > 1e-4


def test_residual_training_and_sampling(res_model, rng):
    model, params = res_model
    ref = jax.random.uniform(jax.random.PRNGKey(5), (2, 32, 32, 3),
                             minval=-1, maxval=1)
    batch = {
        "image": jnp.clip(ref + 0.1 * jax.random.normal(rng, ref.shape), -1, 1),
        "cond": ref,
    }
    loss, logs = jax.jit(lambda p, b, k: model.training_step(p, b, k))(
        params, batch, jax.random.PRNGKey(1)
    )
    assert bool(jnp.isfinite(loss))

    imgs = model.sample(params, jax.random.PRNGKey(2), cond=ref)
    assert imgs.shape == (2, 32, 32, 3)
    assert float(imgs.min()) >= 0.0 and float(imgs.max()) <= 1.0
    # an untrained net predicts ~small residuals near t=0, so the sample
    # should stay in the vicinity of ref rather than pure noise
    ref01 = (ref + 1) / 2
    assert float(jnp.mean(jnp.abs(imgs - ref01))) < 0.5
