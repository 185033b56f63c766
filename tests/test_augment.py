"""AugmentPipe: label dims, identity at p=0, geometry sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def _ref_warp_torch(images_nchw, g_inv, torch):
    """Transcription of the reference's anti-aliased warp execution
    (ddm/augment.py:232-270), incl. its data-dependent asymmetric margins."""
    import numpy as np

    from adm_tpu.core.augment import SYM6

    N, C, H, W = images_nchw.shape
    images = images_nchw.clone()
    G_inv = g_inv.clone().to(torch.float32)
    cx, cy = (W - 1) / 2, (H - 1) / 2
    cp = torch.tensor(
        [[-cx, -cy, 1], [cx, -cy, 1], [cx, cy, 1], [-cx, cy, 1]],
        dtype=torch.float32,
    )
    cp = G_inv @ cp.t()
    Hz = np.asarray(SYM6, dtype=np.float32)
    Hz_pad = len(Hz) // 4
    margin = cp[:, :2, :].permute(1, 0, 2).flatten(1)
    margin = torch.cat([-margin, margin]).max(dim=1).values
    margin = margin + torch.tensor([Hz_pad * 2 - cx, Hz_pad * 2 - cy] * 2)
    margin = margin.max(torch.tensor([0.0, 0, 0, 0]))
    margin = margin.min(torch.tensor([W - 1.0, H - 1, W - 1, H - 1]))
    mx0, my0, mx1, my1 = margin.ceil().to(torch.int32)

    images = torch.nn.functional.pad(
        images, pad=[mx0, mx1, my0, my1], mode="reflect"
    )

    def t2d(tx, ty):
        return torch.tensor(
            [[1.0, 0, tx], [0, 1.0, ty], [0, 0, 1.0]], dtype=torch.float32
        )

    def s2d(sx, sy):
        return torch.tensor(
            [[sx, 0, 0], [0, sy, 0], [0, 0, 1.0]], dtype=torch.float32
        )

    G_inv = t2d((mx0 - mx1) / 2, (my0 - my1) / 2) @ G_inv

    conv_weight = torch.tensor(Hz[None, None, ::-1].copy()).tile(
        [images.shape[1], 1, 1]
    )
    conv_pad = (len(Hz) + 1) // 2
    images = torch.stack([images, torch.zeros_like(images)], dim=4).reshape(
        N, C, images.shape[2], -1
    )[:, :, :, :-1]
    images = torch.nn.functional.conv2d(
        images, conv_weight.unsqueeze(2), groups=images.shape[1],
        padding=[0, conv_pad],
    )
    images = torch.stack([images, torch.zeros_like(images)], dim=3).reshape(
        N, C, -1, images.shape[3]
    )[:, :, :-1, :]
    images = torch.nn.functional.conv2d(
        images, conv_weight.unsqueeze(3), groups=images.shape[1],
        padding=[conv_pad, 0],
    )
    G_inv = s2d(2, 2) @ G_inv @ s2d(0.5, 0.5)
    G_inv = t2d(-0.5, -0.5) @ G_inv @ t2d(0.5, 0.5)

    shape = [N, C, (H + Hz_pad * 2) * 2, (W + Hz_pad * 2) * 2]
    G_inv = (
        s2d(2 / images.shape[3], 2 / images.shape[2])
        @ G_inv
        @ s2d(shape[3] / 2, shape[2] / 2)
    )
    grid = torch.nn.functional.affine_grid(
        theta=G_inv[:, :2, :], size=shape, align_corners=False
    )
    images = torch.nn.functional.grid_sample(
        images, grid, mode="bilinear", padding_mode="zeros",
        align_corners=False,
    )

    conv_weight = torch.tensor(Hz[None, None, :].copy()).tile(
        [images.shape[1], 1, 1]
    )
    conv_pad = (len(Hz) - 1) // 2
    images = torch.nn.functional.conv2d(
        images, conv_weight.unsqueeze(2), groups=images.shape[1],
        stride=[1, 2], padding=[0, conv_pad],
    )[:, :, :, Hz_pad:-Hz_pad]
    images = torch.nn.functional.conv2d(
        images, conv_weight.unsqueeze(3), groups=images.shape[1],
        stride=[2, 1], padding=[conv_pad, 0],
    )[:, :, Hz_pad:-Hz_pad, :]
    return images


def test_antialiased_warp_matches_reference_transcription():
    """Our static-margin anti-aliased warp must match the reference's
    dynamic-margin execution elementwise across transform strengths
    (VERDICT item 7 — the deviation is now closed, not just bounded)."""
    torch = pytest.importorskip("torch")
    from adm_tpu.core.augment import (
        _antialiased_warp,
        _rotate2d,
        _scale2d,
        _translate2d,
    )

    rng = np.random.RandomState(0)
    img = rng.rand(2, 16, 16, 3).astype(np.float32) * 2 - 1

    cases = []
    for theta, s, tx in [(0.0, 1.0, 0.0), (0.4, 1.2, 1.5), (-0.9, 0.7, -2.0),
                         (2.4, 1.35, 3.0)]:
        g = (
            np.asarray(_scale2d(jnp.asarray([1 / s]), jnp.asarray([1 / s])))[0]
            @ np.asarray(_rotate2d(jnp.asarray([theta])))[0]
            @ np.asarray(_translate2d(jnp.asarray([-tx]), jnp.asarray([0.8])))[0]
        )
        cases.append(g)
    g_inv = np.stack([cases[0], cases[1]]).astype(np.float32)
    g_inv2 = np.stack([cases[2], cases[3]]).astype(np.float32)

    for g in (g_inv, g_inv2):
        ours = np.asarray(_antialiased_warp(jnp.asarray(img), jnp.asarray(g)))
        ref = _ref_warp_torch(
            torch.from_numpy(img.transpose(0, 3, 1, 2)),
            torch.from_numpy(g),
            torch,
        ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, ref, atol=2e-4)
