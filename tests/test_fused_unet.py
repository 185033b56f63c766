"""Fused-block UNet path: same param tree, identical outputs (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from adm_tpu.nn.unets import EDMPrecond

KW = dict(model_channels=32, channel_mult=(1, 2), num_blocks=1,
          attn_resolutions=(8,), dropout=0.0)


def test_fused_unet_matches_base(rng):
    net_a = EDMPrecond(img_resolution=16, img_channels=3, variant="const",
                       n_decoders=2, model_kwargs=KW)
    net_b = EDMPrecond(img_resolution=16, img_channels=3, variant="const",
                       n_decoders=2,
                       model_kwargs=dict(KW, use_fused_block=True))
    x = jax.random.normal(rng, (2, 16, 16, 3))
    t = jnp.array([0.4, 0.8])
    params = net_a.init(jax.random.PRNGKey(1), x, t)
    a = net_a.apply(params, x, t)
    with pltpu.force_tpu_interpret_mode():
        b = net_b.apply(params, x, t)
    for ya, yb in zip(a, b):
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=1e-5)


def test_fused_unet_init_names_match(rng):
    """Fused and base paths must create identical param trees (checkpoints
    interchange freely)."""
    net_a = EDMPrecond(img_resolution=16, img_channels=3, variant="const",
                       n_decoders=1, model_kwargs=KW)
    net_b = EDMPrecond(img_resolution=16, img_channels=3, variant="const",
                       n_decoders=1,
                       model_kwargs=dict(KW, use_fused_block=True))
    x = jnp.zeros((1, 16, 16, 3))
    t = jnp.array([0.5])
    pa = net_a.init(jax.random.PRNGKey(0), x, t)
    with pltpu.force_tpu_interpret_mode():
        pb = net_b.init(jax.random.PRNGKey(0), x, t)
    sa = jax.tree_util.tree_structure(pa)
    sb = jax.tree_util.tree_structure(pb)
    assert sa == sb
