"""AugmentPipe: label dims, identity at p=0, geometry sanity."""

import jax
import jax.numpy as jnp
import numpy as np

from adm_tpu.core.augment import AugmentPipe


def test_label_dim_matches_cifar_config():
    """DDM cifar config uses augment_dim: 9 (configs/cifar10/...yaml:31)."""
    pipe = AugmentPipe(p=0.12)
    assert pipe.label_dim == 9
    x = jnp.zeros((4, 16, 16, 3))
    out, labels = pipe(x, jax.random.PRNGKey(0))
    assert out.shape == x.shape
    assert labels.shape == (4, 9)


def test_p_zero_is_identity(rng):
    """With p=0 and xflip=0 every op is gated off -> labels all zero,
    warp is identity."""
    pipe = AugmentPipe(p=0.0, xflip=0.0)
    x = jax.random.uniform(rng, (2, 16, 16, 3))
    out, labels = pipe(x, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(labels), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)


def test_xflip_always_label_consistent(rng):
    """xflip=1e8 -> flip decided by coin; label 1 iff image was flipped."""
    pipe = AugmentPipe(p=0.12, xflip=1e8, yflip=0, scale=0, rotate_frac=0,
                       aniso=0, translate_frac=0)
    x = jnp.tile(jnp.linspace(-1, 1, 16)[None, None, :, None], (8, 16, 1, 3))
    out, labels = pipe(x, jax.random.PRNGKey(2))
    assert labels.shape == (8, 1)
    flipped = np.asarray(jnp.flip(x, axis=2))
    xs = np.asarray(x)
    outs = np.asarray(out)
    for i in range(8):
        if labels[i, 0] == 1:
            np.testing.assert_allclose(outs[i], flipped[i], atol=1e-4)
        else:
            np.testing.assert_allclose(outs[i], xs[i], atol=1e-4)


def test_augment_in_training_step(rng):
    """use_augment wiring: model trains with augment labels feeding the
    UNet's map_augment embedding."""
    from adm_tpu.utils.config import build_model

    cfg = {
        "class_name": "ddm.ddm_const_2.DDPM",
        "image_size": [16, 16],
        "sampling_timesteps": 2,
        "weighting_loss": True,
        "use_augment": True,
        "unet": {
            "class_name": "unet.uncond_unet_2.EDMPrecond",
            "img_resolution": 16,
            "img_channels": 3,
            "model_channels": 16,
            "channel_mult": [1, 2],
            "num_blocks": 1,
            "attn_resolutions": [8],
            "dropout": 0.0,
            "augment_dim": 9,
        },
    }
    model = build_model(cfg)
    assert model.augment_fn is not None
    params = model.init(jax.random.PRNGKey(0))
    batch = {"image": jax.random.uniform(rng, (4, 16, 16, 3), minval=-1, maxval=1)}
    loss, _ = jax.jit(lambda p, b, k: model.training_step(p, b, k))(
        params, batch, jax.random.PRNGKey(1)
    )
    assert bool(jnp.isfinite(loss))
