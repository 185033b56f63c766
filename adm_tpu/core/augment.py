"""EDM-style non-leaky augmentation pipeline (reference ddm/augment.py:115-328).

Covers the FULL reference op set: pixel blitting (xflip/yflip/rotate_int/
translate_int, ddm/augment.py:162-192), geometric warps (scale/rotate_frac/
aniso/translate_frac, :197-270), and the luma-space 4x4 color transforms
(brightness/contrast/lumaflip/hue/saturation, :276-325). The flagship DDM
config instantiates the geometric subset (ddm/ddm_const_2.py:112-113):
  AugmentPipe(p=0.12, xflip=1e8, yflip=1, scale=1, rotate_frac=1, aniso=1,
              translate_frac=1)  ->  9 augment-label dims

Parameter sampling and label math match the reference exactly (each op fires
with probability min(mult*p, 1), strengths are exp2-scaled normals etc.).

The affine warp executes anti-aliased exactly like the reference
(ddm/augment.py:232-270): reflect-pad -> 2x sym6 wavelet supersample ->
one bilinear grid_sample (align_corners=False semantics) -> wavelet
stride-2 downsample + crop. One static-shape deviation: the reference pads
by a data-dependent per-batch margin clamped to at most (W-1, H-1); we pad
by that clamp bound unconditionally — identical output whenever the
reference's computed margin suffices (reflect content beyond the needed
area is never sampled), and reflected-vs-zero tails only for transforms so
extreme they exceed the clamp. `antialias=False` falls back to the cheaper
single-pass bilinear warp.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _rotate2d(theta: Array) -> Array:
    c, s = jnp.cos(theta), jnp.sin(theta)
    z = jnp.zeros_like(theta)
    o = jnp.ones_like(theta)
    return jnp.stack(
        [jnp.stack([c, -s, z], -1), jnp.stack([s, c, z], -1),
         jnp.stack([z, z, o], -1)], -2
    )


def _scale2d(sx: Array, sy: Array) -> Array:
    z = jnp.zeros_like(sx)
    o = jnp.ones_like(sx)
    return jnp.stack(
        [jnp.stack([sx, z, z], -1), jnp.stack([z, sy, z], -1),
         jnp.stack([z, z, o], -1)], -2
    )


def _translate2d(tx: Array, ty: Array) -> Array:
    z = jnp.zeros_like(tx)
    o = jnp.ones_like(tx)
    return jnp.stack(
        [jnp.stack([o, z, tx], -1), jnp.stack([z, o, ty], -1),
         jnp.stack([z, z, o], -1)], -2
    )


def _bilinear_warp(images: Array, g_inv: Array, margin: int) -> Array:
    """Per-sample affine warp, NHWC, reflect-padded source."""
    n, h, w, c = images.shape
    padded = jnp.pad(
        images, ((0, 0), (margin, margin), (margin, margin), (0, 0)),
        mode="reflect",
    )
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    tgt = jnp.stack(
        [xs - cx, ys - cy, jnp.ones_like(xs, jnp.float32)], axis=-1
    ).astype(jnp.float32)  # (h, w, 3)

    def warp_one(img_p, g):
        src = jnp.einsum("ij,hwj->hwi", g, tgt)  # (h, w, 3)
        sx = src[..., 0] + cx + margin
        sy = src[..., 1] + cy + margin
        hp, wp = img_p.shape[:2]
        x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, wp - 2)
        y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, hp - 2)
        fx = jnp.clip(sx - x0, 0.0, 1.0)[..., None]
        fy = jnp.clip(sy - y0, 0.0, 1.0)[..., None]
        p00 = img_p[y0, x0]
        p01 = img_p[y0, x0 + 1]
        p10 = img_p[y0 + 1, x0]
        p11 = img_p[y0 + 1, x0 + 1]
        return (
            p00 * (1 - fx) * (1 - fy)
            + p01 * fx * (1 - fy)
            + p10 * (1 - fx) * fy
            + p11 * fx * fy
        )

    return jax.vmap(warp_one)(padded, g_inv)


# luma axis for the color transforms (reference ddm/augment.py:278)
_LUMA = (1.0 / 3.0 ** 0.5, 1.0 / 3.0 ** 0.5, 1.0 / 3.0 ** 0.5, 0.0)


def _translate3d(t: Array) -> Array:
    """Homogeneous 4x4 RGB translation by (t, t, t) per sample, t: (n,)."""
    eye = jnp.broadcast_to(jnp.eye(4), t.shape + (4, 4))
    shift = jnp.zeros_like(eye).at[..., :3, 3].set(t[..., None])
    return eye + shift


def _scale3d(s: Array) -> Array:
    """Homogeneous 4x4 isotropic RGB scale per sample, s: (n,)."""
    d = jnp.stack([s, s, s, jnp.ones_like(s)], axis=-1)
    return jax.vmap(jnp.diag)(d)


def _rotate3d_luma(theta: Array) -> Array:
    """Rodrigues rotation about the luma axis (reference rotate3d with
    v = [1,1,1,0]/sqrt(3), ddm/augment.py:90-100), theta: (n,)."""
    v = jnp.asarray(_LUMA[:3])
    s, c = jnp.sin(theta), jnp.cos(theta)
    cc = 1.0 - c
    vv = jnp.outer(v, v)  # (3, 3)
    # cross-product (skew) matrix of v
    kx = jnp.asarray([[0.0, -v[2], v[1]],
                      [v[2], 0.0, -v[0]],
                      [-v[1], v[0], 0.0]])
    r = (vv[None] * cc[:, None, None]
         + jnp.eye(3)[None] * c[:, None, None]
         + kx[None] * s[:, None, None])
    out = jnp.broadcast_to(jnp.eye(4), theta.shape + (4, 4))
    return out.at[..., :3, :3].set(r)


# sym6 scaling filter (reference ddm/augment.py:21-38 wavelets table)
SYM6 = (
    0.015404109327027373, 0.0034907120842174702, -0.11799011114819057,
    -0.048311742585633, 0.4910559419267466, 0.787641141030194,
    0.3379294217276218, -0.07263752278646252, -0.021060292512300564,
    0.04472490177066578, 0.0017677118642428036, -0.007800708325034148,
)


def _depthwise_1d(x: Array, taps: Array, axis: int, stride: int, pad: int):
    """Depthwise 1D cross-correlation along H (axis=1) or W (axis=2), NHWC."""
    c = x.shape[-1]
    k = taps.shape[0]
    if axis == 2:
        kern = jnp.tile(taps[None, :, None, None], (1, 1, 1, c))
        strides, padding = (1, stride), [(0, 0), (pad, pad)]
    else:
        kern = jnp.tile(taps[:, None, None, None], (1, 1, 1, c))
        strides, padding = (stride, 1), [(pad, pad), (0, 0)]
    return jax.lax.conv_general_dilated(
        x, kern.astype(x.dtype), strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


def _zero_stuff(x: Array, axis: int) -> Array:
    """Interleave zeros along H/W, dropping the trailing zero (size 2n-1)."""
    z = jnp.zeros_like(x)
    stacked = jnp.stack([x, z], axis=axis + 1)
    shp = list(x.shape)
    shp[axis] *= 2
    out = stacked.reshape(shp)
    sl = [slice(None)] * out.ndim
    sl[axis] = slice(0, -1)
    return out[tuple(sl)]


def _antialiased_warp(images: Array, g_inv: Array) -> Array:
    """The reference's wavelet-supersampled warp (ddm/augment.py:232-270),
    NHWC, static margins = the reference's (W-1, H-1) clamp bound."""
    n, h, w, c = images.shape
    hz = jnp.asarray(SYM6, jnp.float32)
    k = len(SYM6)
    hz_pad = k // 4  # 3
    mx, my = w - 1, h - 1

    x = jnp.pad(images, ((0, 0), (my, my), (mx, mx), (0, 0)), mode="reflect")
    # symmetric margins: the reference's translate2d((mx0-mx1)/2, ...) is 0

    # upsample 2x: zero-stuff then conv with reversed taps, pad (k+1)//2
    up_pad = (k + 1) // 2
    x = _depthwise_1d(_zero_stuff(x, 2), hz[::-1], axis=2, stride=1, pad=up_pad)
    x = _depthwise_1d(_zero_stuff(x, 1), hz[::-1], axis=1, stride=1, pad=up_pad)
    hin, win = x.shape[1], x.shape[2]

    # G_inv conditioning (ddm/augment.py:258-262): upsample scale, the
    # align_corners=False half-pixel shift, and normalized-coords mapping
    s2 = jnp.asarray(
        [[2.0, 0, 0], [0, 2.0, 0], [0, 0, 1.0]], jnp.float32
    )
    s2_inv = jnp.asarray(
        [[0.5, 0, 0], [0, 0.5, 0], [0, 0, 1.0]], jnp.float32
    )
    t_half = jnp.asarray(
        [[1.0, 0, -0.5], [0, 1.0, -0.5], [0, 0, 1.0]], jnp.float32
    )
    t_half_inv = jnp.asarray(
        [[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1.0]], jnp.float32
    )
    g = s2[None] @ g_inv @ s2_inv[None]
    g = t_half[None] @ g @ t_half_inv[None]
    hs, ws = (h + hz_pad * 2) * 2, (w + hz_pad * 2) * 2
    norm_in = jnp.asarray(
        [[2.0 / win, 0, 0], [0, 2.0 / hin, 0], [0, 0, 1.0]], jnp.float32
    )
    norm_out = jnp.asarray(
        [[ws / 2.0, 0, 0], [0, hs / 2.0, 0], [0, 0, 1.0]], jnp.float32
    )
    g = norm_in[None] @ g @ norm_out[None]

    # grid_sample(bilinear, zeros, align_corners=False) over output (hs, ws)
    jj, ii = jnp.meshgrid(jnp.arange(ws), jnp.arange(hs), indexing="xy")
    xn = (2 * jj + 1).astype(jnp.float32) / ws - 1.0
    yn = (2 * ii + 1).astype(jnp.float32) / hs - 1.0
    tgt = jnp.stack([xn, yn, jnp.ones_like(xn)], axis=-1)  # (hs, ws, 3)

    def sample_one(img, gm):
        src = jnp.einsum("ij,hwj->hwi", gm, tgt)
        sx = ((src[..., 0] + 1.0) * win - 1.0) / 2.0
        sy = ((src[..., 1] + 1.0) * hin - 1.0) / 2.0
        x0 = jnp.floor(sx).astype(jnp.int32)
        y0 = jnp.floor(sy).astype(jnp.int32)
        fx = (sx - x0)[..., None]
        fy = (sy - y0)[..., None]

        def tap(yy, xx):
            valid = (
                (xx >= 0) & (xx < win) & (yy >= 0) & (yy < hin)
            )[..., None]
            v = img[jnp.clip(yy, 0, hin - 1), jnp.clip(xx, 0, win - 1)]
            return jnp.where(valid, v, 0.0)

        return (
            tap(y0, x0) * (1 - fx) * (1 - fy)
            + tap(y0, x0 + 1) * fx * (1 - fy)
            + tap(y0 + 1, x0) * (1 - fx) * fy
            + tap(y0 + 1, x0 + 1) * fx * fy
        )

    x = jax.vmap(sample_one)(x, g)

    # downsample: forward taps, stride 2, crop hz_pad (ddm/augment.py:267-270)
    dn_pad = (k - 1) // 2
    x = _depthwise_1d(x, hz, axis=2, stride=2, pad=dn_pad)[:, :, hz_pad:-hz_pad, :]
    x = _depthwise_1d(x, hz, axis=1, stride=2, pad=dn_pad)[:, hz_pad:-hz_pad, :, :]
    return x


@dataclasses.dataclass(frozen=True)
class AugmentPipe:
    p: float = 0.12
    xflip: float = 1e8
    yflip: float = 1.0
    rotate_int: float = 0.0
    translate_int: float = 0.0
    translate_int_max: float = 0.125
    scale: float = 1.0
    rotate_frac: float = 1.0
    aniso: float = 1.0
    translate_frac: float = 1.0
    scale_std: float = 0.2
    rotate_frac_max: float = 1.0
    aniso_std: float = 0.2
    aniso_rotate_prob: float = 0.5
    translate_frac_std: float = 0.125
    brightness: float = 0.0
    contrast: float = 0.0
    lumaflip: float = 0.0
    hue: float = 0.0
    saturation: float = 0.0
    brightness_std: float = 0.2
    contrast_std: float = 0.5
    hue_max: float = 1.0
    saturation_std: float = 1.0
    antialias: bool = True

    @property
    def _any_geometric(self) -> bool:
        return any(m > 0 for m in
                   (self.scale, self.rotate_frac, self.aniso,
                    self.translate_frac))

    @property
    def label_dim(self) -> int:
        dims = 0
        dims += 1 if self.xflip > 0 else 0
        dims += 1 if self.yflip > 0 else 0
        dims += 2 if self.rotate_int > 0 else 0
        dims += 2 if self.translate_int > 0 else 0
        dims += 1 if self.scale > 0 else 0
        dims += 2 if self.rotate_frac > 0 else 0
        dims += 2 if self.aniso > 0 else 0
        dims += 2 if self.translate_frac > 0 else 0
        dims += 1 if self.brightness > 0 else 0
        dims += 1 if self.contrast > 0 else 0
        dims += 1 if self.lumaflip > 0 else 0
        dims += 2 if self.hue > 0 else 0
        dims += 1 if self.saturation > 0 else 0
        return dims

    def __call__(self, images: Array, key: Array) -> Tuple[Array, Array]:
        n, h, w, c = images.shape
        keys = jax.random.split(key, 28)
        labels = []

        # pixel blitting (augment.py:162-192)
        if self.xflip > 0:
            wf = jax.random.randint(keys[0], (n,), 0, 2)
            gate = jax.random.uniform(keys[1], (n,)) < self.xflip * self.p
            wf = jnp.where(gate, wf, 0)
            images = jnp.where(
                (wf == 1)[:, None, None, None], jnp.flip(images, axis=2), images
            )
            labels.append(wf.astype(jnp.float32)[:, None])
        if self.yflip > 0:
            wf = jax.random.randint(keys[2], (n,), 0, 2)
            gate = jax.random.uniform(keys[3], (n,)) < self.yflip * self.p
            wf = jnp.where(gate, wf, 0)
            images = jnp.where(
                (wf == 1)[:, None, None, None], jnp.flip(images, axis=1), images
            )
            labels.append(wf.astype(jnp.float32)[:, None])
        if self.rotate_int > 0:
            # 90-degree rotations as flips + transpose (augment.py:175-181);
            # the transpose branch requires square images, as in the reference
            wf = jax.random.randint(keys[4], (n,), 0, 4)
            gate = jax.random.uniform(keys[5], (n,)) < self.rotate_int * self.p
            wf = jnp.where(gate, wf, 0)
            fx = ((wf == 1) | (wf == 2))[:, None, None, None]
            fy = ((wf == 2) | (wf == 3))[:, None, None, None]
            tr = ((wf == 1) | (wf == 3))[:, None, None, None]
            images = jnp.where(fx, jnp.flip(images, axis=2), images)
            images = jnp.where(fy, jnp.flip(images, axis=1), images)
            images = jnp.where(tr, jnp.swapaxes(images, 1, 2), images)
            labels.append(jnp.stack(
                [fx[:, 0, 0, 0].astype(jnp.float32),
                 fy[:, 0, 0, 0].astype(jnp.float32)], axis=-1))
        if self.translate_int > 0:
            # integer translation with reflection tiling (augment.py:183-192)
            wv = jax.random.uniform(keys[6], (2, n)) * 2 - 1
            gate = jax.random.uniform(keys[7], (1, n)) < self.translate_int * self.p
            wv = jnp.where(gate, wv, 0.0)
            tx = jnp.round(wv[0] * (w * self.translate_int_max)).astype(jnp.int32)
            ty = jnp.round(wv[1] * (h * self.translate_int_max)).astype(jnp.int32)
            xs = jnp.arange(w)[None, :] - tx[:, None]          # (n, w)
            ys = jnp.arange(h)[None, :] + ty[:, None]          # (n, h)
            xs = w - 1 - jnp.abs(w - 1 - xs % (w * 2 - 2))
            ys = h - 1 - jnp.abs(h - 1 - ys % (h * 2 - 2))
            images = jax.vmap(
                lambda img, yy, xx: img[yy[:, None], xx[None, :]]
            )(images, ys, xs)
            labels.append(jnp.stack(
                [tx / (w * self.translate_int_max),
                 ty / (h * self.translate_int_max)], axis=-1))

        # geometric transform selection (augment.py:197-226)
        g_inv = jnp.broadcast_to(jnp.eye(3), (n, 3, 3))
        if self.scale > 0:
            wv = jax.random.normal(keys[8], (n,))
            wv = jnp.where(
                jax.random.uniform(keys[9], (n,)) < self.scale * self.p, wv, 0.0
            )
            s = jnp.exp2(wv * self.scale_std)
            g_inv = g_inv @ _scale2d(1 / s, 1 / s)
            labels.append(wv[:, None])
        if self.rotate_frac > 0:
            wv = (jax.random.uniform(keys[10], (n,)) * 2 - 1) * (
                jnp.pi * self.rotate_frac_max
            )
            wv = jnp.where(
                jax.random.uniform(keys[11], (n,)) < self.rotate_frac * self.p, wv, 0.0
            )
            g_inv = g_inv @ _rotate2d(wv)  # rotate2d_inv(-w) == rotate2d(w)
            labels.append(jnp.stack([jnp.cos(wv) - 1, jnp.sin(wv)], axis=-1))
        if self.aniso > 0:
            wv = jax.random.normal(keys[12], (n,))
            r = (jax.random.uniform(keys[13], (n,)) * 2 - 1) * jnp.pi
            wv = jnp.where(
                jax.random.uniform(keys[14], (n,)) < self.aniso * self.p, wv, 0.0
            )
            r = jnp.where(
                jax.random.uniform(keys[15], (n,)) < self.aniso_rotate_prob, r, 0.0
            )
            s = jnp.exp2(wv * self.aniso_std)
            g_inv = g_inv @ _rotate2d(-r) @ _scale2d(1 / s, s) @ _rotate2d(r)
            labels.append(jnp.stack([wv * jnp.cos(r), wv * jnp.sin(r)], axis=-1))
        if self.translate_frac > 0:
            wv = jax.random.normal(keys[16], (2, n))
            wv = jnp.where(
                jax.random.uniform(keys[17], (1, n)) < self.translate_frac * self.p,
                wv,
                0.0,
            )
            tx = wv[0] * (w * self.translate_frac_std)
            ty = wv[1] * (h * self.translate_frac_std)
            g_inv = g_inv @ _translate2d(-tx, -ty)
            labels.append(jnp.stack([wv[0], wv[1]], axis=-1))

        # the reference executes the warp only when a geometric op is
        # configured (G_inv is I_3 otherwise, augment.py:230) — the wavelet
        # resample round-trip is near- but not bit-identity, so skip it too
        if self._any_geometric:
            if self.antialias:
                images = _antialiased_warp(images, g_inv)
            else:
                margin = max(h, w) // 2
                images = _bilinear_warp(images, g_inv, margin)

        # color transform selection (augment.py:276-311)
        m = jnp.broadcast_to(jnp.eye(4), (n, 4, 4))
        any_color = False
        if self.brightness > 0:
            wv = jax.random.normal(keys[18], (n,))
            wv = jnp.where(
                jax.random.uniform(keys[19], (n,)) < self.brightness * self.p,
                wv, 0.0)
            m = _translate3d(wv * self.brightness_std) @ m
            labels.append(wv[:, None])
            any_color = True
        if self.contrast > 0:
            wv = jax.random.normal(keys[20], (n,))
            wv = jnp.where(
                jax.random.uniform(keys[21], (n,)) < self.contrast * self.p,
                wv, 0.0)
            m = _scale3d(jnp.exp2(wv * self.contrast_std)) @ m
            labels.append(wv[:, None])
            any_color = True
        luma_outer = jnp.outer(jnp.asarray(_LUMA), jnp.asarray(_LUMA))
        if self.lumaflip > 0:
            wf = jax.random.randint(keys[22], (n,), 0, 2).astype(jnp.float32)
            wf = jnp.where(
                jax.random.uniform(keys[23], (n,)) < self.lumaflip * self.p,
                wf, 0.0)
            house = (jnp.eye(4)[None]
                     - 2.0 * luma_outer[None] * wf[:, None, None])
            m = house @ m
            labels.append(wf[:, None])
            any_color = True
        if self.hue > 0:
            wv = (jax.random.uniform(keys[24], (n,)) * 2 - 1) * (
                jnp.pi * self.hue_max)
            wv = jnp.where(
                jax.random.uniform(keys[25], (n,)) < self.hue * self.p,
                wv, 0.0)
            m = _rotate3d_luma(wv) @ m
            labels.append(jnp.stack([jnp.cos(wv) - 1, jnp.sin(wv)], axis=-1))
            any_color = True
        if self.saturation > 0:
            wv = jax.random.normal(keys[26], (n,))
            wv = jnp.where(
                jax.random.uniform(keys[27], (n,)) < self.saturation * self.p,
                wv, 0.0)
            sat = jnp.exp2(wv * self.saturation_std)[:, None, None]
            m = (luma_outer[None]
                 + (jnp.eye(4)[None] - luma_outer[None]) * sat) @ m
            labels.append(wv[:, None])
            any_color = True

        # execute color transform (augment.py:315-323), NHWC
        if any_color:
            if c == 3:
                images = (
                    jnp.einsum("nij,nhwj->nhwi", m[:, :3, :3], images)
                    + m[:, :3, 3][:, None, None, :]
                )
            elif c == 1:
                # grayscale: average the RGB rows into one (augment.py:320-322)
                mg = jnp.mean(m[:, :3, :], axis=1)  # (n, 4)
                gain = jnp.sum(mg[:, :3], axis=-1)[:, None, None, None]
                bias = mg[:, 3][:, None, None, None]
                images = images * gain + bias
            else:
                raise ValueError(
                    "color transforms need RGB (3) or L (1) channels, got "
                    f"{c}")

        label = jnp.concatenate(labels, axis=-1) if labels else jnp.zeros((n, 0))
        return images, label
