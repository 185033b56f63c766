"""Conditional UNet: shapes, precond consistency, backbone contracts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adm_tpu.nn.backbones import ConvBackbone, ResNetBackbone, SwinBackbone
from adm_tpu.nn.cond_unet import CondUnet

TINY = dict(
    dim=16,
    dim_mults=(1, 2),
    channels=3,
    cond_in_dim=3,
    window_sizes1=((4, 4), (2, 2)),
    window_sizes2=((4, 4), (2, 2)),
    cond_net="conv",
    resnet_block_groups=4,
)


def test_backbone_four_scales(rng):
    x = jnp.zeros((1, 64, 64, 3))
    for cls, c0 in [(ConvBackbone, 32), (SwinBackbone, 128)]:
        kwargs = {}
        if cls is SwinBackbone:
            kwargs = dict(embed_dim=32, depths=(1, 1, 1, 1), heads=(2, 4, 8, 16),
                          window_size=4)
            c0 = 32
        bb = cls(**kwargs)
        params = bb.init(rng, x)
        feats = bb.apply(params, x)
        assert len(feats) == 4
        assert feats[0].shape == (1, 16, 16, c0)
        for i in range(1, 4):
            assert feats[i].shape[1] == feats[i - 1].shape[1] // 2
            assert feats[i].shape[-1] == feats[i - 1].shape[-1] * 2


def test_resnet_backbone_scales(rng):
    bb = ResNetBackbone(blocks=(1, 1, 1, 1))
    x = jnp.zeros((1, 64, 64, 3))
    feats = bb.apply(bb.init(rng, x), x)
    assert [f.shape[-1] for f in feats] == [256, 512, 1024, 2048]
    assert feats[0].shape[1] == 16  # stride 4


@pytest.mark.parametrize("n_dec", [1, 2])
def test_cond_unet_forward(n_dec, rng):
    model = CondUnet(n_decoders=n_dec, **TINY)
    x = jax.random.normal(rng, (2, 32, 32, 3))
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    t = jnp.array([0.4, 0.7])
    params = model.init(jax.random.PRNGKey(0), x, t, cond)
    x1, x2 = model.apply(params, x, t, cond)
    assert x1.shape == x.shape and x2.shape == x.shape
    assert bool(jnp.isfinite(x1).all() and jnp.isfinite(x2).all())


def test_cond_unet_single_decoder_analytic(rng):
    """x2 must satisfy the analytic relation to x1 (cond_unet_sd.py:878-883)."""
    model = CondUnet(n_decoders=1, **TINY)
    x = jax.random.normal(rng, (2, 32, 32, 3))
    cond = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    t = jnp.array([0.3, 0.9])
    params = model.init(jax.random.PRNGKey(0), x, t, cond)
    x1, x2 = model.apply(params, x, t, cond)
    tb = t.reshape(-1, 1, 1, 1)
    expected = (x - (tb - 1) * x1) / jnp.sqrt(tb)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(expected), atol=1e-5)


def test_cond_unet_conditioning_matters(rng):
    """Different cond inputs must change the prediction."""
    model = CondUnet(n_decoders=1, **TINY)
    x = jax.random.normal(rng, (1, 32, 32, 3))
    c1 = jnp.zeros((1, 32, 32, 3))
    c2 = jnp.ones((1, 32, 32, 3))
    t = jnp.array([0.5])
    params = model.init(jax.random.PRNGKey(0), x, t, c1)
    a, _ = model.apply(params, x, t, c1)
    b, _ = model.apply(params, x, t, c2)
    assert not bool(jnp.allclose(a, b))


def test_cond_unet_grad(rng):
    model = CondUnet(n_decoders=1, **TINY)
    x = jax.random.normal(rng, (1, 32, 32, 3))
    cond = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    t = jnp.array([0.5])
    params = model.init(jax.random.PRNGKey(0), x, t, cond)

    def loss_fn(p):
        x1, x2 = model.apply(p, x, t, cond)
        return jnp.mean(x1**2) + jnp.mean(x2**2)

    g = jax.jit(jax.grad(loss_fn))(params)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_swin_shifted_window_mask(rng):
    """Shifted block must differ from unshifted on the same input/params."""
    from adm_tpu.nn.backbones import SwinBlock

    x = jax.random.normal(rng, (1, 8, 8, 16))
    blk0 = SwinBlock(dim=16, heads=2, window_size=4, shift=0)
    blk1 = SwinBlock(dim=16, heads=2, window_size=4, shift=2)
    p = blk0.init(jax.random.PRNGKey(0), x)
    a = blk0.apply(p, x)
    b = blk1.apply(p, x)
    assert a.shape == x.shape
    assert not bool(jnp.allclose(a, b))
