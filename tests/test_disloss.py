"""use_disloss / specify_gradient / aux-loss hook behavior."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from adm_tpu.core.diffusion import specify_gradient


def test_specify_gradient_value_and_grad(rng):
    x = jax.random.normal(rng, (2, 4, 4, 3))
    g = jnp.asarray(2.5)

    def f(xx):
        return specify_gradient(xx, g)

    # value contributes 0 (pure gradient injector)
    assert float(f(x)) == 0.0
    grads = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(grads), 2.5, atol=1e-6)


def test_disloss_changes_gradients(rng):
    from adm_tpu.nn.unets import EDMPrecond
    from adm_tpu.core.diffusion import LatentDiffusion
    from adm_tpu.vae.autoencoder import AutoencoderKL, FirstStage

    dd = dict(ch=16, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
              attn_resolutions=(), dropout=0.0, in_channels=3, resolution=16,
              z_channels=4, double_z=True)
    vae = AutoencoderKL(ddconfig=dd, embed_dim=4)
    fs = FirstStage(vae)
    fs_params = fs.init(jax.random.PRNGKey(0), (16, 16), 3)
    net = EDMPrecond(img_resolution=8, img_channels=4, variant="const2",
                     n_decoders=2,
                     model_kwargs=dict(model_channels=16, channel_mult=(1, 2),
                                       num_blocks=1, attn_resolutions=(4,),
                                       dropout=0.0))
    base = LatentDiffusion(net=net, process_name="const2", image_size=(16, 16),
                           channels=4, sampling_timesteps=2, first_stage=fs)
    with_dis = dataclasses.replace(base, use_disloss=True)
    params = base.init(jax.random.PRNGKey(1))
    batch = {"image": jax.random.uniform(rng, (2, 16, 16, 3), minval=-1, maxval=1)}

    def grads(model):
        def loss_fn(p):
            return model.training_step(p, batch, jax.random.PRNGKey(2),
                                       fs_params=fs_params)[0]

        return jax.grad(loss_fn)(params)

    g0 = grads(base)
    g1 = grads(with_dis)
    diff = sum(
        float(jnp.sum(jnp.abs(a - b)))
        for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1))
    )
    assert diff > 0, "use_disloss must alter gradients"


def test_disloss_gradient_magnitude(rng):
    """The disloss term must inject exactly mean(loss_tmp) per z_rec element
    after p_losses' sum/B — the reference's effective coefficient
    (ddm_const_2.py:577-580: SpecifyGradient ones survive loss_vlb.sum()/B).

    Isolated from the network: differentiate the extra_vlb -> p_losses-style
    reduction w.r.t. z_rec directly.
    """
    from adm_tpu.core.diffusion import specify_gradient

    B = 3
    z_rec = jax.random.normal(rng, (B, 4, 4, 2))
    g_scalar = jnp.asarray(1.7)  # stands in for mean(loss_tmp)

    def loss_fn(z):
        vlb = jnp.zeros((B,))
        vlb = vlb + specify_gradient(z, g_scalar)  # added once per sample
        return jnp.sum(vlb) / B

    grads = jax.grad(loss_fn)(z_rec)
    np.testing.assert_allclose(np.asarray(grads), 1.7, atol=1e-6)


def test_aux_loss_hook(rng):
    from adm_tpu.nn.unets import EDMPrecond
    from adm_tpu.core.diffusion import LatentDiffusion
    from adm_tpu.vae.autoencoder import AutoencoderKL, FirstStage

    dd = dict(ch=16, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
              attn_resolutions=(), dropout=0.0, in_channels=3, resolution=16,
              z_channels=4, double_z=True)
    vae = AutoencoderKL(ddconfig=dd, embed_dim=4)
    fs = FirstStage(vae)
    fs_params = fs.init(jax.random.PRNGKey(0), (16, 16), 3)
    net = EDMPrecond(img_resolution=8, img_channels=4, variant="const2",
                     n_decoders=2,
                     model_kwargs=dict(model_channels=16, channel_mult=(1, 2),
                                       num_blocks=1, attn_resolutions=(4,),
                                       dropout=0.0))
    calls = []

    def aux(img_rec, batch):
        calls.append(1)
        return jnp.zeros((img_rec.shape[0],))

    model = LatentDiffusion(net=net, process_name="const2", image_size=(16, 16),
                            channels=4, sampling_timesteps=2, first_stage=fs,
                            use_disloss=True, aux_loss_fn=aux)
    params = model.init(jax.random.PRNGKey(1))
    batch = {"image": jnp.zeros((2, 16, 16, 3))}
    loss, logs = model.training_step(params, batch, jax.random.PRNGKey(2),
                                     fs_params=fs_params)
    assert calls, "aux hook must be traced"
    assert bool(jnp.isfinite(loss))
