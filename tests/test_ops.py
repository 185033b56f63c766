"""upfirdn2d / fused_leaky_relu parity with the reference's native torch
fallback (unet/op/upfirdn2d.py:159-207, unet/op/fused_act.py:86-97)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adm_tpu.ops import fused_leaky_relu, setup_filter, upfirdn2d

torch = pytest.importorskip("torch")


def _ref_upfirdn2d(x_nchw, kernel, up, down, pad):
    """Numpy transcription of the documented upfirdn2d_native algorithm
    (unet/op/upfirdn2d.py:159-207): zero-stuff by `up`, pad, correlate with
    the flipped kernel, decimate by `down`. (The reference module itself
    JIT-compiles CUDA at import and cannot load here.)"""
    n, c, h, w = x_nchw.shape
    up_h = np.zeros((n, c, h * up, w * up), np.float32)
    up_h[:, :, ::up, ::up] = x_nchw
    p0, p1 = pad
    padded = np.pad(up_h, ((0, 0), (0, 0), (p0, p1), (p0, p1)))
    kf = kernel[::-1, ::-1]
    kh, kw = kf.shape
    oh = padded.shape[2] - kh + 1
    ow = padded.shape[3] - kw + 1
    out = np.zeros((n, c, oh, ow), np.float32)
    for i in range(kh):
        for j in range(kw):
            out += kf[i, j] * padded[:, :, i : i + oh, j : j + ow]
    return out[:, :, ::down, ::down]


@pytest.mark.parametrize("up,down,pad", [(1, 1, (1, 1)), (2, 1, (2, 1)), (1, 2, (1, 1))])
def test_upfirdn2d_matches_reference(up, down, pad, rng):
    rngnp = np.random.RandomState(0)
    x = rngnp.randn(2, 3, 12, 12).astype(np.float32)
    k = np.outer([1, 3, 3, 1], [1, 3, 3, 1]).astype(np.float32) / 64

    expected = _ref_upfirdn2d(x, k, up, down, pad)
    ours = upfirdn2d(
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(k), up=up, down=down,
        pad=pad,
    )
    np.testing.assert_allclose(
        np.asarray(ours), expected.transpose(0, 2, 3, 1), atol=1e-5
    )


def test_fused_leaky_relu():
    x = jnp.asarray([[-2.0, 0.5], [1.0, -0.1]]).reshape(1, 2, 2, 1)
    b = jnp.asarray([0.1])
    out = fused_leaky_relu(x, b)
    xb = np.asarray(x)[..., 0] + 0.1
    expected = np.where(xb >= 0, xb, xb * 0.2) * np.sqrt(2)
    np.testing.assert_allclose(np.asarray(out)[..., 0], expected, atol=1e-6)


def test_fused_leaky_relu_grad():
    x = jnp.linspace(-1, 1, 8).reshape(1, 2, 4, 1)
    b = jnp.asarray([0.0])
    g = jax.grad(lambda xx: jnp.sum(fused_leaky_relu(xx, b) ** 2))(x)
    assert bool(jnp.isfinite(g).all())


def test_setup_filter_normalized():
    k = setup_filter([1, 3, 3, 1])
    np.testing.assert_allclose(float(jnp.sum(k)), 1.0, rtol=1e-6)
    assert k.shape == (4, 4)
