"""EDM-style non-leaky augmentation pipeline (reference ddm/augment.py:115-328).

Implements the subset the reference instantiates for DDM training
(ddm/ddm_const_2.py:112-113):
  AugmentPipe(p=0.12, xflip=1e8, yflip=1, scale=1, rotate_frac=1, aniso=1,
              translate_frac=1)  ->  9 augment-label dims

Parameter sampling and label math match the reference exactly (each op fires
with probability min(mult*p, 1), strengths are exp2-scaled normals etc.).

Deliberate deviation: the reference executes the affine warp anti-aliased
(reflect-pad -> 2x sym6 wavelet supersample -> grid_sample -> wavelet
downsample, ddm/augment.py:232-270). We apply one bilinear warp on a
reflect-padded image — same geometry and labels, slightly more aliasing on
strong zooms. Shapes stay static (the reference computes a data-dependent
margin; we use the fixed upper bound it clamps to).
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


@dataclasses.dataclass(frozen=True)
class AugmentPipe:
    p: float = 0.12
    xflip: float = 1e8
    yflip: float = 1.0
    scale: float = 1.0
    rotate_frac: float = 1.0
    aniso: float = 1.0
    translate_frac: float = 1.0
    scale_std: float = 0.2
    rotate_frac_max: float = 1.0
    aniso_std: float = 0.2
    aniso_rotate_prob: float = 0.5
    translate_frac_std: float = 0.125

    @property
    def label_dim(self) -> int:
        dims = 0
        dims += 1 if self.xflip > 0 else 0
        dims += 1 if self.yflip > 0 else 0
        dims += 1 if self.scale > 0 else 0
        dims += 2 if self.rotate_frac > 0 else 0
        dims += 2 if self.aniso > 0 else 0
        dims += 2 if self.translate_frac > 0 else 0
        return dims

    def __call__(self, images: Array, key: Array) -> Tuple[Array, Array]:
        n, h, w, c = images.shape
        keys = jax.random.split(key, 14)
        labels = []

        # pixel blitting (augment.py:162-172)
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

        # geometric transform selection (augment.py:197-226)
        g_inv = jnp.broadcast_to(jnp.eye(3), (n, 3, 3))
        if self.scale > 0:
            wv = jax.random.normal(keys[4], (n,))
            wv = jnp.where(
                jax.random.uniform(keys[5], (n,)) < self.scale * self.p, wv, 0.0
            )
            s = jnp.exp2(wv * self.scale_std)
            g_inv = g_inv @ _scale2d(1 / s, 1 / s)
            labels.append(wv[:, None])
        if self.rotate_frac > 0:
            wv = (jax.random.uniform(keys[6], (n,)) * 2 - 1) * (
                jnp.pi * self.rotate_frac_max
            )
            wv = jnp.where(
                jax.random.uniform(keys[7], (n,)) < self.rotate_frac * self.p, wv, 0.0
            )
            g_inv = g_inv @ _rotate2d(wv)  # rotate2d_inv(-w) == rotate2d(w)
            labels.append(jnp.stack([jnp.cos(wv) - 1, jnp.sin(wv)], axis=-1))
        if self.aniso > 0:
            wv = jax.random.normal(keys[8], (n,))
            r = (jax.random.uniform(keys[9], (n,)) * 2 - 1) * jnp.pi
            wv = jnp.where(
                jax.random.uniform(keys[10], (n,)) < self.aniso * self.p, wv, 0.0
            )
            r = jnp.where(
                jax.random.uniform(keys[11], (n,)) < self.aniso_rotate_prob, r, 0.0
            )
            s = jnp.exp2(wv * self.aniso_std)
            g_inv = g_inv @ _rotate2d(-r) @ _scale2d(1 / s, s) @ _rotate2d(r)
            labels.append(jnp.stack([wv * jnp.cos(r), wv * jnp.sin(r)], axis=-1))
        if self.translate_frac > 0:
            wv = jax.random.normal(keys[12], (2, n))
            wv = jnp.where(
                jax.random.uniform(keys[13], (1, n)) < self.translate_frac * self.p,
                wv,
                0.0,
            )
            tx = wv[0] * (w * self.translate_frac_std)
            ty = wv[1] * (h * self.translate_frac_std)
            g_inv = g_inv @ _translate2d(-tx, -ty)
            labels.append(jnp.stack([wv[0], wv[1]], axis=-1))

        margin = max(h, w) // 2
        images = _bilinear_warp(images, g_inv, margin)
        label = jnp.concatenate(labels, axis=-1) if labels else jnp.zeros((n, 0))
        return images, label
