"""Color/luma + integer-blit AugmentPipe parity (VERDICT r4 missing #1).

Reference math: ddm/augment.py:162-192 (rotate_int/translate_int) and
:276-325 (brightness/contrast/lumaflip/hue/saturation as a 4x4 matrix in
luma space). Strategy: run our pipe with every gate forced open (p=1,
multiplier=1 -> uniform < 1 always fires), reconstruct the drawn parameters
from the emitted labels (the label layout is itself part of the contract),
rebuild the reference's transform with a numpy transcription of its matrix
helpers, and compare elementwise.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adm_tpu.core.augment import AugmentPipe

V = np.asarray([1.0, 1.0, 1.0, 0.0]) / np.sqrt(3.0)


def _translate3d(t):
    m = np.eye(4)
    m[:3, 3] = t
    return m


def _scale3d(s):
    return np.diag([s, s, s, 1.0])


def _rotate3d(v, theta):
    # transcription of reference rotate3d (ddm/augment.py:90-100)
    vx, vy, vz = v[:3]
    s, c = np.sin(theta), np.cos(theta)
    cc = 1 - c
    return np.asarray([
        [vx * vx * cc + c, vx * vy * cc - vz * s, vx * vz * cc + vy * s, 0],
        [vy * vx * cc + vz * s, vy * vy * cc + c, vy * vz * cc - vx * s, 0],
        [vz * vx * cc - vy * s, vz * vy * cc + vx * s, vz * vz * cc + c, 0],
        [0, 0, 0, 1.0],
    ])


def _color_only_pipe(**kw):
    """All geometric/blit ops off so the warp is skipped."""
    return AugmentPipe(
        p=1.0, xflip=0, yflip=0, scale=0, rotate_frac=0, aniso=0,
        translate_frac=0, **kw)


N, H, W = 7, 8, 8


def _imgs(c=3, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(N, H, W, c)).astype(np.float32))


def _oracle_matrix(labels):
    """Rebuild the reference's M from our labels for the full color config
    (brightness, contrast, lumaflip, hue, saturation -> 6 label dims)."""
    b_w, c_w, lf_w = labels[:, 0], labels[:, 1], labels[:, 2]
    hue_w = np.arctan2(labels[:, 4], labels[:, 3] + 1.0)
    sat_w = labels[:, 5]
    ms = []
    vv = np.outer(V, V)
    for i in range(labels.shape[0]):
        m = np.eye(4)
        m = _translate3d(np.full(3, b_w[i] * 0.2)) @ m          # brightness_std
        m = _scale3d(np.exp2(c_w[i] * 0.5)) @ m                 # contrast_std
        m = (np.eye(4) - 2 * vv * lf_w[i]) @ m                  # lumaflip
        m = _rotate3d(V, hue_w[i]) @ m                          # hue
        m = (vv + (np.eye(4) - vv) * np.exp2(sat_w[i] * 1.0)) @ m  # saturation
        ms.append(m)
    return np.stack(ms)


def test_color_full_config_parity_rgb():
    pipe = _color_only_pipe(brightness=1, contrast=1, lumaflip=1, hue=1,
                            saturation=1)
    assert pipe.label_dim == 6
    imgs = _imgs(3)
    out, labels = jax.jit(pipe)(imgs, jax.random.PRNGKey(3))
    labels = np.asarray(labels)
    assert labels.shape == (N, 6)
    m = _oracle_matrix(labels)
    x = np.asarray(imgs).reshape(N, H * W, 3)
    want = np.einsum("nij,npj->npi", m[:, :3, :3], x) + m[:, :3, 3][:, None, :]
    np.testing.assert_allclose(
        np.asarray(out), want.reshape(N, H, W, 3), rtol=1e-4, atol=1e-5)
    # the gates were forced open: the strength draws must be non-degenerate
    assert np.std(labels[:, 0]) > 0.1 and np.std(labels[:, 5]) > 0.1


def test_color_grayscale_path():
    pipe = _color_only_pipe(brightness=1, contrast=1, lumaflip=1, hue=1,
                            saturation=1)
    imgs = _imgs(1, seed=1)
    out, labels = pipe(imgs, jax.random.PRNGKey(5))
    m = _oracle_matrix(np.asarray(labels))
    # reference C==1 branch (augment.py:320-322): rows averaged, rgb summed
    mg = m[:, :3, :].mean(axis=1)  # (n, 4)
    want = (np.asarray(imgs) * mg[:, :3].sum(-1)[:, None, None, None]
            + mg[:, 3][:, None, None, None])
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)


def test_color_bad_channels_raises():
    pipe = _color_only_pipe(brightness=1)
    with pytest.raises(ValueError, match="RGB"):
        pipe(_imgs(2), jax.random.PRNGKey(0))


def test_color_gates_closed_is_identity():
    """p=0 must leave pixels untouched and labels all-zero (non-leaky)."""
    pipe = AugmentPipe(p=0.0, xflip=0, yflip=0, scale=0, rotate_frac=0,
                       aniso=0, translate_frac=0, brightness=1, contrast=1,
                       lumaflip=1, hue=1, saturation=1)
    imgs = _imgs(3, seed=2)
    out, labels = pipe(imgs, jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(labels), 0.0, atol=1e-7)


def test_rotate_int_parity():
    pipe = _color_only_pipe(rotate_int=1)
    assert pipe.label_dim == 2
    imgs = _imgs(3, seed=3)
    out, labels = pipe(imgs, jax.random.PRNGKey(11))
    labels = np.asarray(labels)
    x = np.asarray(imgs)
    # labels are ((w==1)|(w==2), (w==2)|(w==3)) — bijective back to w
    lut = {(0, 0): 0, (1, 0): 1, (1, 1): 2, (0, 1): 3}
    for i in range(N):
        w = lut[(int(labels[i, 0]), int(labels[i, 1]))]
        want = x[i]
        if w in (1, 2):
            want = want[:, ::-1, :]   # flip W (torch flip(3), NCHW)
        if w in (2, 3):
            want = want[::-1, :, :]   # flip H
        if w in (1, 3):
            want = want.transpose(1, 0, 2)  # transpose H,W
        np.testing.assert_allclose(np.asarray(out)[i], want, atol=1e-6)
    assert len({lut[(int(l[0]), int(l[1]))] for l in labels}) > 1


def test_translate_int_parity():
    pipe = _color_only_pipe(translate_int=1, translate_int_max=0.25)
    assert pipe.label_dim == 2
    imgs = _imgs(3, seed=4)
    out, labels = pipe(imgs, jax.random.PRNGKey(13))
    labels = np.asarray(labels)
    x = np.asarray(imgs)
    tx = np.round(labels[:, 0] * (W * 0.25)).astype(int)
    ty = np.round(labels[:, 1] * (H * 0.25)).astype(int)
    for i in range(N):
        # reference index math (augment.py:187-190)
        xi = np.arange(W) - tx[i]
        yi = np.arange(H) + ty[i]
        xi = W - 1 - np.abs(W - 1 - xi % (W * 2 - 2))
        yi = H - 1 - np.abs(H - 1 - yi % (H * 2 - 2))
        np.testing.assert_allclose(
            np.asarray(out)[i], x[i][yi[:, None], xi[None, :]], atol=1e-6)
    assert np.any(tx != 0) or np.any(ty != 0)


def test_label_dim_full_reference_config():
    """Every op on: 1+1+2+2 blit + 1+2+2+2 geometric + 1+1+1+2+1 color."""
    pipe = AugmentPipe(p=0.12, xflip=1, yflip=1, rotate_int=1,
                       translate_int=1, scale=1, rotate_frac=1, aniso=1,
                       translate_frac=1, brightness=1, contrast=1,
                       lumaflip=1, hue=1, saturation=1)
    assert pipe.label_dim == 19
    imgs = _imgs(3, seed=5)
    out, labels = jax.jit(pipe)(imgs, jax.random.PRNGKey(17))
    assert labels.shape == (N, 19)
    assert out.shape == imgs.shape
