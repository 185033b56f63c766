"""VAE GAN/perceptual losses (reference ddm/loss.py:9-113 + taming modules).

Functional JAX port of LPIPSWithDiscriminator:
  rec = |x - x_hat| + MSE (+ LPIPS), NLL with learned global logvar,
  KL weight, hinge-GAN with adaptive generator weight
  d_weight = ||grad_last nll|| / (||grad_last g|| + 1e-4)  (ddm/loss.py:34-45)

The adaptive weight needs gradients w.r.t. ONLY the decoder's last conv
kernel. We do this exactly (not the d(recon) approximation): the trainer
splits decode into (h_pre, conv_out) and we jax.grad scalar functions of the
last kernel with h_pre fixed — one extra conv per gradient, matching the
reference's two extra backward passes through the last layer.

Discriminator: PatchGAN NLayerDiscriminator
(taming/modules/discriminator/model.py:17-67); batch-statistics norm (the
torch module in training mode), scale/offset learned.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class _BatchNorm(nn.Module):
    """Batch-stats normalization with learned scale/offset (training-mode
    BatchNorm2d; the discriminator is never run in eval mode by the
    trainers, train_vae.py:243-271)."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        scale = self.param(
            "scale", lambda k, s: 1.0 + 0.02 * jax.random.normal(k, s), (c,)
        )
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(x, axis=(0, 1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias


def _disc_conv_init(key, shape, dtype=jnp.float32):
    """weights_init: N(0, 0.02) (taming/modules/discriminator/model.py:8-14)."""
    return 0.02 * jax.random.normal(key, shape, dtype)


class NLayerDiscriminator(nn.Module):
    """PatchGAN discriminator (taming/modules/discriminator/model.py:17-67)."""

    ndf: int = 64
    n_layers: int = 3

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.Conv(
            self.ndf, (4, 4), strides=(2, 2), padding=1,
            kernel_init=_disc_conv_init, name="conv0",
        )(x)
        h = jax.nn.leaky_relu(h, 0.2)
        nf = 1
        for n in range(1, self.n_layers + 1):
            nf = min(2**n, 8)
            stride = 2 if n < self.n_layers else 1
            h = nn.Conv(
                self.ndf * nf, (4, 4), strides=(stride, stride), padding=1,
                use_bias=False, kernel_init=_disc_conv_init, name=f"conv{n}",
            )(h)
            h = _BatchNorm(name=f"bn{n}")(h)
            h = jax.nn.leaky_relu(h, 0.2)
        return nn.Conv(
            1, (4, 4), strides=(1, 1), padding=1,
            kernel_init=_disc_conv_init, name="conv_out",
        )(h)


def hinge_d_loss(logits_real: Array, logits_fake: Array) -> Array:
    """taming/modules/losses/vqperceptual.py:20-26."""
    loss_real = jnp.mean(jax.nn.relu(1.0 - logits_real))
    loss_fake = jnp.mean(jax.nn.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def vanilla_d_loss(logits_real: Array, logits_fake: Array) -> Array:
    """taming/modules/losses/vqperceptual.py:28-31."""
    return 0.5 * (
        jnp.mean(jax.nn.softplus(-logits_real))
        + jnp.mean(jax.nn.softplus(logits_fake))
    )


def adopt_weight(weight: float, global_step: Array, threshold: int) -> Array:
    return jnp.where(global_step < threshold, 0.0, weight)


@dataclasses.dataclass(frozen=True)
class VAELossConfig:
    disc_start: int = 50001
    logvar_init: float = 0.0
    kl_weight: float = 1e-6
    pixelloss_weight: float = 1.0
    disc_num_layers: int = 3
    disc_in_channels: int = 3
    disc_factor: float = 1.0
    disc_weight: float = 0.5
    perceptual_weight: float = 1.0
    disc_loss: str = "hinge"


def generator_loss(
    cfg: VAELossConfig,
    x: Array,
    h_pre: Array,
    last_w: Dict[str, Array],
    apply_last: Callable[[Dict[str, Array], Array], Array],
    posterior,
    logvar: Array,
    disc_apply: Callable[[Array], Array],
    global_step: Array,
    perceptual_fn: Optional[Callable[[Array, Array], Array]] = None,
) -> Tuple[Array, Dict[str, Array]]:
    """Optimizer-idx-0 loss (ddm/loss.py:66-95), exact adaptive weight."""

    def nll_of(w):
        recon = apply_last(w, h_pre)
        rec = jnp.abs(x - recon) + (x - recon) ** 2
        if cfg.perceptual_weight > 0 and perceptual_fn is not None:
            p = perceptual_fn(x, recon)  # (B,) or map
            rec = rec + cfg.perceptual_weight * p.reshape(
                (-1,) + (1,) * (rec.ndim - 1)
            )
        nll = rec / jnp.exp(logvar) + logvar
        return jnp.sum(nll) / x.shape[0], rec

    def g_of(w):
        recon = apply_last(w, h_pre)
        return -jnp.mean(disc_apply(recon))

    (nll_loss, rec_loss), nll_grads = jax.value_and_grad(nll_of, has_aux=True)(
        last_w
    )
    g_loss, g_grads = jax.value_and_grad(g_of)(last_w)

    def _norm(tree):
        # reference norms the last layer's WEIGHT grads only
        # (encoder_decoder.py:382-383, loss.py:34-45) — exclude the bias
        if isinstance(tree, dict) and "kernel" in tree:
            tree = tree["kernel"]
        return jnp.sqrt(
            sum(jnp.sum(g**2) for g in jax.tree_util.tree_leaves(tree))
        )

    d_weight = jnp.where(
        cfg.disc_factor > 0,
        jnp.clip(_norm(nll_grads) / (_norm(g_grads) + 1e-4), 0.0, 1e4),
        0.0,
    )
    d_weight = jax.lax.stop_gradient(d_weight) * cfg.disc_weight
    disc_factor = adopt_weight(cfg.disc_factor, global_step, cfg.disc_start)

    kl_loss = jnp.sum(posterior.kl()) / x.shape[0]
    loss = nll_loss + cfg.kl_weight * kl_loss + d_weight * disc_factor * g_loss
    log = {
        "train/total_loss": loss,
        "train/logvar": logvar,
        "train/kl_loss": kl_loss,
        "train/nll_loss": nll_loss,
        "train/rec_loss": jnp.mean(rec_loss),
        "train/d_weight": d_weight,
        "train/disc_factor": disc_factor,
        "train/g_loss": g_loss,
    }
    return loss, log


def discriminator_loss(
    cfg: VAELossConfig,
    x: Array,
    recon: Array,
    disc_apply: Callable[[Array], Array],
    global_step: Array,
) -> Tuple[Array, Dict[str, Array]]:
    """Optimizer-idx-1 loss (ddm/loss.py:97-113)."""
    logits_real = disc_apply(jax.lax.stop_gradient(x))
    logits_fake = disc_apply(jax.lax.stop_gradient(recon))
    fn = hinge_d_loss if cfg.disc_loss == "hinge" else vanilla_d_loss
    disc_factor = adopt_weight(cfg.disc_factor, global_step, cfg.disc_start)
    d_loss = disc_factor * fn(logits_real, logits_fake)
    log = {
        "train/disc_loss": d_loss,
        "train/logits_real": jnp.mean(logits_real),
        "train/logits_fake": jnp.mean(logits_fake),
    }
    return d_loss, log
