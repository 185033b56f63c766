"""Per-family smoke: one config-driven train step + tiny sample for each
task family added in round 2 (depth / edge / sketch2img / inpainting).

Each family's tiny config keeps the reference class_names (including the
stale fork names the registry maps, SURVEY.md section 0) so the wiring under
test is exactly what the shipped YAMLs use — just at toy sizes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adm_tpu.utils.config import build_model

TINY_COND_UNET = dict(
    dim=16,
    dim_mults=[1, 2],
    cond_in_dim=3,
    window_sizes1=[[4, 4], [2, 2]],
    window_sizes2=[[4, 4], [2, 2]],
    cond_net="conv",
    resnet_block_groups=4,
)

TINY_AE = dict(
    class_name="ddm.encoder_decoder.AutoencoderKL",
    embed_dim=2,
    ddconfig=dict(double_z=True, z_channels=2, resolution=[32, 32],
                  in_channels=1, out_ch=1, ch=8, ch_mult=[1, 2],
                  num_res_blocks=1, attn_resolutions=[], dropout=0.0),
)


def _first_stage(ae_cfg):
    from adm_tpu.cli.train_vae import build_vae
    from adm_tpu.vae.autoencoder import FirstStage

    fs = FirstStage(build_vae(ae_cfg))
    in_ch = ae_cfg["ddconfig"]["in_channels"]
    fs_params = fs.init(jax.random.PRNGKey(0), (32, 32), in_ch)
    return fs, fs_params


def _smoke(model_cfg, img_ch, cond_ch, latent=False, ae_cfg=None):
    fs = fs_params = None
    if latent:
        fs, fs_params = _first_stage(ae_cfg)
    model = build_model(model_cfg, first_stage=fs)
    params = model.init(jax.random.PRNGKey(1))
    batch = {
        "image": jax.random.uniform(
            jax.random.PRNGKey(2), (2, 32, 32, img_ch), minval=-1, maxval=1
        ),
        "cond": jax.random.uniform(
            jax.random.PRNGKey(3), (2, 32, 32, cond_ch), minval=-1, maxval=1
        ),
    }
    kw = dict(fs_params=fs_params) if latent else {}
    loss, logs = model.training_step(params, batch, jax.random.PRNGKey(4), **kw)
    assert np.isfinite(float(loss)), logs
    skw = dict(fs_params=fs_params) if latent else {}
    img = model.sample(params, jax.random.PRNGKey(5), cond=batch["cond"], **skw)
    assert img.shape[0] == 2 and np.isfinite(np.asarray(img)).all()
    return model


def test_depth_family_image_space():
    """NYUD image-space DPM: stale ddm_const4 + cond_unet2 names, MAE main
    loss (configs/depth_estimation/NYUD_ddm_const4_dpm_6630.yaml)."""
    cfg = dict(
        class_name="ddm.ddm_const4.DDPM",
        image_size=[32, 32],
        sampling_timesteps=2,
        weighting_loss=True,
        loss_main=dict(class_name="ddm.loss.MAE_Loss"),
        unet=dict(class_name="unet.cond_unet2.Unet", channels=1,
                  **TINY_COND_UNET),
    )
    model = _smoke(cfg, img_ch=1, cond_ch=3)
    assert model.process_name == "const"
    assert model.loss_main == "l1"


def test_edge_family_ldm():
    """Edge LDM via the fork's model_type/model_name convention
    (configs/edge_detection/cond_const_sde4_unet6.yaml)."""
    cfg = dict(
        model_type="const_sde4",
        model_name="cond_unet6",
        image_size=[32, 32],
        sampling_timesteps=2,
        scale_by_std=True,
        scale_factor=0.235,
        first_stage=TINY_AE,
        unet=dict(channels=2, **TINY_COND_UNET),
    )
    model = _smoke(cfg, img_ch=1, cond_ch=3, latent=True, ae_cfg=TINY_AE)
    assert model.process_name == "const"


def test_sketch_family_ldm_disloss():
    """Sketch2img LDM with 1-channel cond and use_disloss
    (configs/sketch2img/sketchcoco_ddm_const4_ldm_unet6_114.yaml)."""
    ae = dict(TINY_AE)
    ae["ddconfig"] = dict(TINY_AE["ddconfig"], in_channels=3, out_ch=3)
    unet = dict(TINY_COND_UNET, cond_in_dim=1)
    cfg = dict(
        class_name="ddm.ddm_const.LatentDiffusion",
        image_size=[32, 32],
        sampling_timesteps=2,
        use_disloss=True,
        use_l1=True,
        scale_factor=0.125,
        first_stage=ae,
        unet=dict(class_name="unet.cond_unet.Unet", channels=2, **unet),
    )
    model = _smoke(cfg, img_ch=3, cond_ch=1, latent=True, ae_cfg=ae)
    assert model.use_disloss


def test_inpaint_family_mask_compositing():
    """Inpainting LDM: masked-cond batch + mask compositing at sample time
    (configs/inpainting/celebahq_ddm_const4_condunet5_6202.yaml)."""
    ae = dict(TINY_AE)
    ae["ddconfig"] = dict(TINY_AE["ddconfig"], in_channels=3, out_ch=3)
    cfg = dict(
        class_name="ddm.ddm_const.LatentDiffusion",
        image_size=[32, 32],
        sampling_timesteps=2,
        use_l1=True,
        scale_factor=0.165,
        first_stage=ae,
        unet=dict(class_name="unet.cond_unet5.Unet", channels=2,
                  **TINY_COND_UNET),
    )
    fs, fs_params = _first_stage(ae)
    model = build_model(cfg, first_stage=fs)
    params = model.init(jax.random.PRNGKey(1))
    from adm_tpu.data.paired import random_rect_mask

    mask = random_rect_mask((32, 32), np.random.RandomState(0))[..., None]
    mask = jnp.asarray(np.stack([mask, mask]))
    img = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3),
                             minval=-1, maxval=1)
    batch = {"image": img, "cond": img * mask, "ori_mask": mask}
    loss, _ = model.training_step(params, batch, jax.random.PRNGKey(3),
                                  fs_params=fs_params)
    assert np.isfinite(float(loss))
    out = model.sample(params, jax.random.PRNGKey(4), cond=batch["cond"],
                       mask=mask, fs_params=fs_params)
    # masked (kept) region must be composited from the cond image
    kept = np.asarray(mask[0, ..., 0]) == 1
    expect = np.asarray((batch["cond"][0] + 1) / 2)
    np.testing.assert_allclose(
        np.asarray(out[0])[kept], expect[kept], atol=1e-5
    )


def test_channel_round_widths():
    """channel_round (non-parity lane-alignment knob, BASELINE.md lever (b))
    rounds level widths up to the multiple while keeping output shapes."""
    from adm_tpu.nn.unets import EDMPrecond

    def build(cr):
        return EDMPrecond(
            img_resolution=16, img_channels=3, sigma_data=1.0,
            variant="const", n_decoders=2,
            model_kwargs=dict(model_channels=96, channel_mult=[1, 2],
                              num_blocks=1, attn_resolutions=[8],
                              dropout=0.0, channel_round=cr),
        )

    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.full((2,), 0.5)
    for cr, want_l0 in ((0, 96), (128, 128)):
        net = build(cr)
        params = net.init(jax.random.PRNGKey(0), x, t)
        kern = params["params"]["model"]["enc_16_conv"]["kernel"]
        assert kern.shape[-1] == want_l0
        outs = net.apply(params, x, t)
        assert all(o.shape == (2, 16, 16, 3) for o in outs)
