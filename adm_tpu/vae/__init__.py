from adm_tpu.vae.autoencoder import (
    AutoencoderKL,
    DiagonalGaussianDistribution,
    FirstStage,
)

__all__ = ["AutoencoderKL", "DiagonalGaussianDistribution", "FirstStage"]
