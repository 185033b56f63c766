"""LPIPS perceptual distance (VGG16 backbone) in flax NHWC.

Match of taming/modules/losses/lpips.py:10-54 (the reference's perceptual
loss for both DDPM training and the VAE GAN loss): input scaling layer,
VGG16 features tapped after relu{1_2,2_2,3_3,4_3,5_3}, channel-unit-
normalization, frozen 1x1 'lin' heads, spatial mean, sum over taps.

Weights: the lin heads ship with the reference
(taming/modules/autoencoder/lpips/vgg.pth) and convert via
`convert_lpips_lin`; the VGG16 backbone needs torchvision's
vgg16 weights converted once via `convert_vgg16_features` (offline in this
environment — the module runs with random backbone weights for pipeline
tests and loads converted weights in production).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# VGG16 conv plan: (out_channels, tap_after?) with maxpool between groups
_VGG_PLAN = [
    (64, False), (64, True),          # relu1_2 -> tap 0
    ("pool",),
    (128, False), (128, True),        # relu2_2 -> tap 1
    ("pool",),
    (256, False), (256, False), (256, True),   # relu3_3 -> tap 2
    ("pool",),
    (512, False), (512, False), (512, True),   # relu4_3 -> tap 3
    ("pool",),
    (512, False), (512, False), (512, True),   # relu5_3 -> tap 4
]


class VGG16Features(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, ...]:
        taps = []
        conv_i = 0
        for entry in _VGG_PLAN:
            if entry[0] == "pool":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            feats, tap = entry
            x = nn.Conv(
                feats, (3, 3), padding=1, dtype=self.dtype, name=f"conv{conv_i}"
            )(x)
            x = jax.nn.relu(x)
            conv_i += 1
            if tap:
                taps.append(x)
        return tuple(taps)


def _unit_normalize(x: Array, eps: float = 1e-10) -> Array:
    norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """Returns per-sample LPIPS distance (B,)."""

    spatial: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        # inputs in [-1, 1], NHWC
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        net = VGG16Features(dtype=self.dtype, name="vgg")
        fx = net((x - shift) / scale)
        fy = net((y - shift) / scale)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
            w = self.param(
                f"lin{i}", nn.initializers.ones, (d.shape[-1],)
            )
            # frozen positive head (reference 1x1 conv, no bias)
            contrib = jnp.sum(d * w[None, None, None, :], axis=-1)
            total = total + jnp.mean(contrib, axis=(1, 2))
        return total


def convert_lpips_lin(sd) -> Dict[str, np.ndarray]:
    """taming vgg.pth lin heads -> our lin{i} params
    (keys lin{i}.model.1.weight, shape (1, C, 1, 1))."""
    out = {}
    for i in range(5):
        w = sd[f"lin{i}.model.1.weight"]
        w = w.detach().cpu().numpy() if hasattr(w, "detach") else np.asarray(w)
        out[f"lin{i}"] = w.reshape(-1)
    return out


def convert_vgg16_features(sd) -> Dict:
    """torchvision vgg16 'features.*' state_dict -> VGG16Features params."""
    convs = {}
    idx = 0
    for k in sorted(
        (k for k in sd if k.startswith("features.") and k.endswith(".weight")),
        key=lambda s: int(s.split(".")[1]),
    ):
        layer = k[: -len(".weight")]
        w = sd[k]
        w = w.detach().cpu().numpy() if hasattr(w, "detach") else np.asarray(w)
        b = sd[layer + ".bias"]
        b = b.detach().cpu().numpy() if hasattr(b, "detach") else np.asarray(b)
        convs[f"conv{idx}"] = {
            "kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
            "bias": b,
        }
        idx += 1
    return convs


def build_lpips_params(
    lin_path: Optional[str] = None, vgg_sd=None
) -> Optional[dict]:
    """Assemble LPIPS params from available weight sources; None params
    fall back to random init (pipeline still functional).

    lin_path: .pth (taming vgg.pth) or .npz (adm_tpu/assets/lpips_lin.npz,
    converted from the reference's bundled heads). The VGG16 backbone
    weights come from a converted torchvision vgg16 state_dict (vgg_sd or
    the ADM_TPU_VGG16_WEIGHTS .npz).
    """
    module = LPIPS()
    params = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3))
    )
    p = jax.device_get(params)["params"]
    if lin_path is None:
        import os

        default = os.path.join(os.path.dirname(__file__), "..", "assets",
                               "lpips_lin.npz")
        lin_path = default if os.path.exists(default) else None
    if lin_path:
        if lin_path.endswith(".npz"):
            data = np.load(lin_path)
            p.update({k: jnp.asarray(data[k]) for k in data.files})
        else:
            import torch

            p.update(
                {k: jnp.asarray(v) for k, v in convert_lpips_lin(
                    torch.load(lin_path, map_location="cpu")
                ).items()}
            )
    if vgg_sd is None:
        import os

        path = os.environ.get("ADM_TPU_VGG16_WEIGHTS")
        if path and os.path.exists(path):
            data = np.load(path, allow_pickle=True)
            p["vgg"] = jax.tree_util.tree_map(
                jnp.asarray, data["params"].item()
            )
    else:
        p["vgg"] = jax.tree_util.tree_map(
            jnp.asarray, convert_vgg16_features(vgg_sd)
        )
    return {"params": p}


def make_perceptual_fn(params, spatial: bool = False):
    """Returns perceptual_fn(x, y) -> (B,) for DDPM/VAE loss hookup."""
    module = LPIPS(spatial=spatial)

    def fn(x, y):
        return module.apply(jax.lax.stop_gradient(params), x, y)

    return fn
