"""MEADSTD_TANH_NORM depth loss (reference ddm/loss.py:150-226).

loss_i = MAE((gt-u_i)/s_i - pred) + MAE(tanh(0.1*(gt-u_i)/s_i) - tanh(0.1*pred))
over each sample's valid-depth mask, where (u_i, s_i) are the 10%-trimmed
mean/std of the valid ground-truth depths. Samples with < 10 valid pixels
use (0, 1); samples with <= 100 valid pixels are excluded (their loss is
zeroed here — the reference drops the rows, a dynamic shape).

Static-shape JAX port: the trimmed statistics sort the full flattened map
with invalid entries pushed to +inf and weight ranks in
[floor(0.1 n), n - floor(0.1 n)) — exactly the reference's
`sorted[int(0.1*size):-int(0.1*size)]` slice; std matches torch's unbiased
estimator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def meadstd_tanh_norm_loss(
    pred: Array,
    gt: Array,
    valid_threshold: float = 1e-3,
    max_threshold: float = 1.0,
    with_sigmoid: bool = False,
) -> Array:
    """(B, H, W, C) -> per-sample (B,) loss."""
    if with_sigmoid:
        pred = jax.nn.sigmoid(pred)
        gt = jax.nn.sigmoid(gt)
    b = gt.shape[0]
    gt_f = gt.reshape(b, -1).astype(jnp.float32)
    pred_f = pred.reshape(b, -1).astype(jnp.float32)
    m = gt_f.shape[1]

    # the trimmed statistics use the reference's `gt_i > 0` validity
    # (transform(), ddm/loss.py:166), not the loss thresholds
    stat_mask = gt_f > 0
    n_stat = jnp.sum(stat_mask, axis=1)  # (B,)
    sort_vals = jnp.sort(jnp.where(stat_mask, gt_f, jnp.inf), axis=1)
    ranks = jnp.arange(m)[None, :]
    trim = jnp.floor(0.1 * n_stat).astype(jnp.int32)[:, None]
    w = (ranks >= trim) & (ranks < n_stat[:, None] - trim)
    wn = jnp.maximum(jnp.sum(w, axis=1), 1)
    vals = jnp.where(w, sort_vals, 0.0)
    mean = jnp.sum(vals, axis=1) / wn
    var = jnp.sum(jnp.where(w, (sort_vals - mean[:, None]) ** 2, 0.0), axis=1)
    std = jnp.sqrt(var / jnp.maximum(wn - 1, 1))
    fallback = n_stat < 10
    mean = jnp.where(fallback, 0.0, mean)
    std = jnp.where(fallback, 1.0, std)

    gt_trans = (gt_f - mean[:, None]) / (std[:, None] + 1e-8)

    loss_mask = (gt_f > valid_threshold) & (gt_f < max_threshold)
    n_loss = jnp.sum(loss_mask, axis=1)
    denom = jnp.maximum(n_loss, 1)
    diff = jnp.where(loss_mask, jnp.abs(gt_trans - pred_f), 0.0)
    loss = jnp.sum(diff, axis=1) / denom
    tdiff = jnp.where(
        loss_mask,
        jnp.abs(jnp.tanh(0.1 * gt_trans) - jnp.tanh(0.1 * pred_f)),
        0.0,
    )
    loss_tanh = jnp.sum(tdiff, axis=1) / denom
    # exclude near-empty samples (reference mask_batch = mask_sum > 100)
    return jnp.where(n_loss > 100, loss + loss_tanh, 0.0)
