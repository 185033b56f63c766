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
