"""LPIPS: properties + architecture parity vs the reference taming module."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adm_tpu.metrics.lpips import (
    LPIPS,
    build_lpips_params,
    convert_vgg16_features,
    make_perceptual_fn,
)

LIN_PATH = "/root/reference/taming/modules/autoencoder/lpips/vgg.pth"


def test_lpips_zero_for_identical(rng):
    params = build_lpips_params()
    x = jax.random.uniform(rng, (2, 32, 32, 3), minval=-1, maxval=1)
    d = LPIPS().apply(params, x, x)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)
    d2 = LPIPS().apply(params, x, -x)
    assert (np.asarray(d2) > 0).all()


def test_perceptual_fn_stops_gradient_to_lpips(rng):
    params = build_lpips_params(lin_path=LIN_PATH)
    fn = make_perceptual_fn(params)
    x = jax.random.uniform(rng, (2, 16, 16, 3), minval=-1, maxval=1)
    y = jnp.zeros_like(x)
    g = jax.grad(lambda xx: jnp.sum(fn(xx, y)))(x)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.sum(jnp.abs(g))) > 0  # grads flow to the INPUT


def _torch_vgg16_features(torch):
    """torchvision vgg16.features layout built from plain torch layers
    (torchvision is not installed here; the layout/state_dict keys are the
    standard 'features.N.{weight,bias}' convention the converter expects)."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512]
    layers, in_c = [], 3
    for v in cfg:
        if v == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers.append(torch.nn.Conv2d(in_c, v, 3, padding=1))
            layers.append(torch.nn.ReLU())
            in_c = v
    return torch.nn.Sequential(*layers)


def test_lpips_parity_vs_torch(rng):
    """Compute the taming LPIPS math (lpips.py:10-54) with torch on the same
    random VGG weights + the reference's bundled lin heads, and compare."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    feats = _torch_vgg16_features(torch)
    sd = {f"features.{i}.{leaf}": p for i, m in enumerate(feats)
          for leaf, p in getattr(m, "_parameters", {}).items() if p is not None}
    lin_sd = torch.load(LIN_PATH, map_location="cpu")

    # torch-side LPIPS per taming/modules/losses/lpips.py
    taps = {3, 8, 15, 22, 29}  # relu{1_2,2_2,3_3,4_3,5_3} indices
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def torch_lpips(x, y):
        def feats_of(z):
            h = (z - shift) / scale
            out = []
            for i, m in enumerate(feats):
                h = m(h)
                if i in taps:
                    out.append(h)
            return out

        def unit(z):
            return z / (z.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)

        total = 0
        for i, (a, b) in enumerate(zip(feats_of(x), feats_of(y))):
            d = (unit(a) - unit(b)) ** 2
            w = lin_sd[f"lin{i}.model.1.weight"]
            total = total + torch.nn.functional.conv2d(d, w).mean(dim=(1, 2, 3))
        return total

    rngnp = np.random.RandomState(0)
    x = (rngnp.rand(2, 3, 32, 32).astype(np.float32)) * 2 - 1
    y = (rngnp.rand(2, 3, 32, 32).astype(np.float32)) * 2 - 1
    with torch.no_grad():
        d_ref = torch_lpips(torch.from_numpy(x), torch.from_numpy(y)).numpy()

    params = build_lpips_params(lin_path=LIN_PATH, vgg_sd=sd)
    d_ours = LPIPS().apply(
        params,
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(y.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.asarray(d_ours), d_ref, rtol=2e-3, atol=1e-5)
