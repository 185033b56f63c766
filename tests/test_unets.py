"""Forward-shape, jit, and precondition-consistency tests for the UNet zoo."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adm_tpu.nn import precond as precond_lib
from adm_tpu.nn.unets import DhariwalUNet, EDMPrecond, SongUNet

TINY = dict(model_channels=16, channel_mult=(1, 2), num_blocks=1, attn_resolutions=(8,))


def _make(model_cls, n_decoders, **kw):
    cfg = dict(TINY, **kw)
    return model_cls(img_resolution=16, out_channels=3, n_decoders=n_decoders, **cfg)


@pytest.mark.parametrize("model_cls", [DhariwalUNet, SongUNet])
@pytest.mark.parametrize("n_dec", [1, 2])
def test_unet_forward_shapes(model_cls, n_dec, rng):
    model = _make(model_cls, n_dec)
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.array([0.5, 0.9])
    params = model.init(rng, x, t)
    outs = model.apply(params, x, t)
    assert len(outs) == n_dec
    for o in outs:
        assert o.shape == (2, 16, 16, 3)


def test_dhariwal_augment_and_labels(rng):
    model = DhariwalUNet(
        img_resolution=16, out_channels=3, n_decoders=2, label_dim=10, augment_dim=9, **TINY
    )
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.array([0.5, 0.9])
    lab = jax.nn.one_hot(jnp.array([3, 7]), 10)
    aug = jnp.zeros((2, 9))
    params = model.init(rng, x, t, lab, aug)
    o1, o2 = model.apply(params, x, t, lab, aug)
    assert o1.shape == o2.shape == (2, 16, 16, 3)


@pytest.mark.parametrize("variant", ["const", "const2"])
def test_edmprecond_two_decoder(variant, rng):
    net = EDMPrecond(
        img_resolution=16,
        img_channels=3,
        variant=variant,
        n_decoders=2,
        model_kwargs=TINY,
    )
    x = jax.random.normal(rng, (2, 16, 16, 3))
    sigma = jnp.array([0.3, 0.8])
    params = net.init(rng, x, sigma)
    d_x, d_y = net.apply(params, x, sigma)
    assert d_x.shape == x.shape and d_y.shape == x.shape
    # must be finite and fp32
    assert d_x.dtype == jnp.float32
    assert bool(jnp.isfinite(d_x).all() and jnp.isfinite(d_y).all())


def test_edmprecond_single_decoder_analytic(rng):
    """n_decoders=1: D_y must equal the analytic derivation from D_x."""
    net = EDMPrecond(
        img_resolution=16,
        img_channels=3,
        variant="const",
        n_decoders=1,
        model_kwargs=TINY,
    )
    x = jax.random.normal(rng, (2, 16, 16, 3))
    sigma = jnp.array([0.4, 0.6])
    params = net.init(rng, x, sigma)
    d_x, d_y = net.apply(params, x, sigma)
    expected = precond_lib.derive_noise_branch(
        "const", x, d_x, sigma.reshape(-1, 1, 1, 1)
    )
    np.testing.assert_allclose(np.asarray(d_y), np.asarray(expected), atol=1e-5)


def test_edmprecond_jit_and_grad(rng):
    net = EDMPrecond(
        img_resolution=16, img_channels=3, variant="const", n_decoders=2, model_kwargs=TINY
    )
    x = jax.random.normal(rng, (2, 16, 16, 3))
    sigma = jnp.array([0.5, 0.5])
    params = net.init(rng, x, sigma)

    @jax.jit
    def loss_fn(p):
        d_x, d_y = net.apply(p, x, sigma)
        return jnp.mean(d_x**2) + jnp.mean(d_y**2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    # zero-init layers (conv1/proj) must still receive gradient signal
    # through the skip path; total grad norm should be nonzero
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert total > 0


def test_skip_tuning_changes_output(rng):
    x = jax.random.normal(rng, (1, 16, 16, 3))
    sigma = jnp.array([0.5])
    net_a = EDMPrecond(
        img_resolution=16, img_channels=3, variant="const2", n_decoders=1,
        model_kwargs=TINY,
    )
    net_b = EDMPrecond(
        img_resolution=16, img_channels=3, variant="const2", n_decoders=1,
        model_kwargs=dict(TINY, skip_tuning=True),
    )
    params = net_a.init(rng, x, sigma)
    out_a = net_a.apply(params, x, sigma)[0]
    out_b = net_b.apply(params, x, sigma)[0]
    assert not bool(jnp.allclose(out_a, out_b))


def test_song_encoder_types(rng):
    for enc in ["standard", "skip", "residual"]:
        model = SongUNet(
            img_resolution=16,
            out_channels=3,
            n_decoders=2,
            encoder_type=enc,
            **TINY,
        )
        x = jnp.zeros((1, 16, 16, 3))
        t = jnp.array([0.5])
        params = model.init(jax.random.PRNGKey(0), x, t)
        outs = model.apply(params, x, t)
        assert outs[0].shape == (1, 16, 16, 3)
