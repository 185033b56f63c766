"""FID-compatible InceptionV3 feature extractor (NHWC flax, inference-only).

Architecture match of the reference's vendored torch-fidelity extractor
(metrics/feature_extractor_inceptionv3.py:23-200): TF-2015-12-05 Inception
port with the FID quirks — TF1-style bilinear resize (no half-pixel
offset), count-exclude-pad average pools, max-pool in Mixed_7c's pool
branch (InceptionE_2), 1008-way logits, and the feature taps at
64/192/768/2048/logits_unbiased.

BatchNorm runs in inference mode from converted running statistics; use
adm_tpu.utils.torch_convert-style tooling (convert_inception below) to load
the torch-fidelity weights once they are available on disk.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def tf1_bilinear_resize(x: Array, size: Tuple[int, int]) -> Array:
    """TF1.x bilinear, align_corners=False: src = out_idx * in/out
    (metrics/interpolate_compat_tensorflow.py:8-21)."""
    b, h, w, c = x.shape
    oh, ow = size

    def coords(out_n, in_n):
        src = jnp.arange(out_n, dtype=jnp.float32) * (in_n / out_n)
        i0 = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_n - 1)
        i1 = jnp.minimum(i0 + 1, in_n - 1)
        frac = src - i0
        return i0, i1, frac

    y0, y1, fy = coords(oh, h)
    x0, x1, fx = coords(ow, w)
    top = x[:, y0][:, :, x0] * (1 - fx)[None, None, :, None] + x[:, y0][
        :, :, x1
    ] * fx[None, None, :, None]
    bot = x[:, y1][:, :, x0] * (1 - fx)[None, None, :, None] + x[:, y1][
        :, :, x1
    ] * fx[None, None, :, None]
    return top * (1 - fy)[None, :, None, None] + bot * fy[None, :, None, None]


def avg_pool_tf(x: Array) -> Array:
    """3x3 stride-1 avg pool, padding 1, count_exclude_pad (TF semantics)."""
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    n = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return s / n


def max_pool(x: Array, k: int, stride: int, pad: int = 0) -> Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )


class BasicConv2d(nn.Module):
    features: int
    kernel: Tuple[int, int] = (3, 3)
    stride: int = 1
    padding: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=(self.stride, self.stride),
            padding=[(self.padding[0], self.padding[0]),
                     (self.padding[1], self.padding[1])],
            use_bias=False,
            name="conv",
        )(x)
        c = self.features
        scale = self.param("bn_scale", nn.initializers.ones, (c,))
        bias = self.param("bn_bias", nn.initializers.zeros, (c,))
        mean = self.param("bn_mean", nn.initializers.zeros, (c,))
        var = self.param("bn_var", nn.initializers.ones, (c,))
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return jax.nn.relu(x)


def _cat(xs):
    return jnp.concatenate(xs, axis=-1)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(
            avg_pool_tf(x)
        )
        return _cat([b1, b5, b3, bp])


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        return _cat([b3, bd, max_pool(x, 3, 2)])


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(avg_pool_tf(x))
        return _cat([b1, b7, bd, bp])


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        return _cat([b3, b7, max_pool(x, 3, 2)])


class InceptionE(nn.Module):
    pool_mode: str  # 'avg' (E_1 / Mixed_7b) or 'max' (E_2 / Mixed_7c)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = _cat([b3a, b3b])
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = _cat([bda, bdb])
        pool = avg_pool_tf(x) if self.pool_mode == "avg" else max_pool(x, 3, 1, 1)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(pool)
        return _cat([b1, b3, bd, bp])


class FIDInceptionV3(nn.Module):
    """Returns dict of requested features; input uint8 NHWC any size."""

    features_list: Sequence[str] = ("2048",)

    @nn.compact
    def __call__(self, x_uint8: Array) -> Dict[str, Array]:
        feats = {}
        want = set(self.features_list)

        def done():
            # early exit once every requested tap is collected: proxy-FID
            # runs on the shallow '192' tap only, and the remaining ~80
            # layers are ~10x the FLOPs for nothing
            return want.issubset(feats)

        x = x_uint8.astype(jnp.float32)
        x = tf1_bilinear_resize(x, (299, 299))
        x = (x - 128.0) / 128.0
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = max_pool(x, 3, 2)
        if "64" in want:
            feats["64"] = jnp.mean(x, axis=(1, 2))
        if done():
            return feats
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = max_pool(x, 3, 2)
        if "192" in want:
            feats["192"] = jnp.mean(x, axis=(1, 2))
        if done():
            return feats
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        if "768" in want:
            feats["768"] = jnp.mean(x, axis=(1, 2))
        if done():
            return feats
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        x = jnp.mean(x, axis=(1, 2))
        if "2048" in want:
            feats["2048"] = x
        if "logits_unbiased" in want or "logits" in want:
            w = self.param(
                "fc_kernel", nn.initializers.zeros, (2048, 1008)
            )
            b = self.param("fc_bias", nn.initializers.zeros, (1008,))
            logits_u = x @ w
            if "logits_unbiased" in want:
                feats["logits_unbiased"] = logits_u
            if "logits" in want:
                feats["logits"] = logits_u + b
        return feats


def convert_inception(sd) -> Dict:
    """torch-fidelity FeatureExtractorInceptionV3 state_dict -> flax params."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in sd.items()}
    out: Dict = {}
    convs = {}
    for k, v in sd.items():
        if k.endswith(".conv.weight"):
            mod = k[: -len(".conv.weight")]
            convs.setdefault(mod, {})["conv"] = {
                "kernel": np.ascontiguousarray(v.transpose(2, 3, 1, 0))
            }
        elif ".bn." in k:
            mod, leaf = k.rsplit(".bn.", 1)
            m = convs.setdefault(mod, {})
            name = {"weight": "bn_scale", "bias": "bn_bias",
                    "running_mean": "bn_mean", "running_var": "bn_var"}.get(leaf)
            if name:
                m[name] = v
    for mod, params in convs.items():
        parts = mod.split(".")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        entry = dict(params)
        conv = entry.pop("conv", None)
        if conv is not None:
            entry["conv"] = conv  # nested submodule: .../conv/kernel
        node[parts[-1]] = entry
    if "fc.weight" in sd:
        out["fc_kernel"] = np.ascontiguousarray(sd["fc.weight"].T)
        out["fc_bias"] = sd["fc.bias"]
    return {"params": out}
