"""EDM-style preconditioning coefficient tables for the DDM process family.

The reference hardcodes one coefficient set per UNet file; here they are pure
functions of sigma (= t), selected by name:

  'const'   two-decoder, sqrt(t)-noise   (unet/uncond_unet.py:621-626)
  'const2'  two-decoder, t-noise         (unet/uncond_unet_2.py:623-626)
  'cond'    conditional UNet             (unet/cond_unet_sd.py:830-838)

Single-decoder variants reuse the same tables and derive the noise branch
analytically (unet/uncond_unet_sd.py:602-605, uncond_unet_sd_2.py:599-607):

  'const'  : D_y = (x - (sigma-1) * D_x) / sqrt(sigma)
  'const2' : D_y = (x - (sigma-1) * D_x) / sigma

All functions take sigma already broadcast against x (shape (B,1,1,1) in
NHWC) and return a dict of coefficients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def coeffs_const(sigma: Array) -> dict:
    """sqrt(t)-noise table (reference unet/uncond_unet.py:621-626)."""
    den = sigma**2 - sigma + 1
    return dict(
        c_skip1=(sigma - 1) / den,
        c_skip2=jnp.sqrt(sigma) / den,
        c_out1=jnp.sqrt(sigma / den),
        c_out2=(1 - sigma) / jnp.sqrt(den),
        c_in=1 / jnp.sqrt((1 - sigma) ** 2 + sigma),
        c_noise=jnp.log(sigma),
    )


def coeffs_const2(sigma: Array) -> dict:
    """t-noise table (reference unet/uncond_unet_2.py:623-626)."""
    den = sigma**2 + (sigma - 1) ** 2
    return dict(
        c_skip1=(sigma - 1) / den,
        c_skip2=sigma / den,
        c_out1=sigma / jnp.sqrt(den),
        c_out2=(1 - sigma) / jnp.sqrt(den),
        c_in=1 / jnp.sqrt(den),
        c_noise=jnp.log(sigma),
    )


def coeffs_cond(sigma: Array) -> dict:
    """Conditional-UNet table (reference unet/cond_unet_sd.py:830-838)."""
    return dict(
        c_skip1=sigma - 1,
        c_skip2=jnp.sqrt(sigma),
        c_out1=sigma / jnp.sqrt(sigma + 1),
        c_out2=jnp.sqrt(1 - sigma) / jnp.sqrt(1 + sigma),
        c_in=jnp.ones_like(sigma),
        c_noise=jnp.log(sigma),
    )


COEFF_TABLES = {
    "const": coeffs_const,
    "const2": coeffs_const2,
    "cond": coeffs_cond,
}


def derive_noise_branch(variant: str, x: Array, d_x: Array, sigma: Array) -> Array:
    """Analytic eps-branch for single-decoder UNets."""
    if variant == "const":
        return (x - (sigma - 1) * d_x) / jnp.sqrt(sigma)
    if variant == "const2":
        return (x - (sigma - 1) * d_x) / sigma
    if variant == "cond":
        return (x - (sigma - 1) * d_x) / jnp.sqrt(sigma)
    raise KeyError(f"unknown precond variant '{variant}'")


def precondition(
    variant: str,
    x: Array,
    sigma: Array,
    f_x: Array,
    f_y: Array | None = None,
) -> tuple[Array, Array]:
    """Combine raw network outputs into (D_x, D_y) = (drift, noise) preds.

    Two-decoder: D_x = c_skip1*x + c_out1*F_x ; D_y = c_skip2*x + c_out2*F_y
    (unet/uncond_unet.py:630-635). Single-decoder (f_y=None) derives D_y
    analytically from D_x.
    """
    c = COEFF_TABLES[variant](sigma)
    d_x = c["c_skip1"] * x + c["c_out1"] * f_x
    if f_y is None:
        d_y = derive_noise_branch(variant, x, d_x, sigma)
    else:
        d_y = c["c_skip2"] * x + c["c_out2"] * f_y
    return d_x, d_y
