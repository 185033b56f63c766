"""adm_tpu — a TPU-native (JAX/XLA/Pallas/pjit) decoupled-diffusion framework.

Re-designed from scratch with the capability set of the reference DDM/ADM
codebase (zacz08/ADM): four decoupled diffusion processes, EDM-style UNet
zoo with one- and two-decoder variants, KL-VAE latent pipeline, conditional
generation (SR / saliency / inpainting / seg / depth / text2img), on-device
FID/IS/KID metrics, and a single GSPMD data-parallel trainer replacing the
reference's accelerate/DDP harness.

Layout (see SURVEY.md section 7):
  core/      pure-functional process math + samplers (lax.scan)
  nn/        flax UNet zoo, preconditioning tables, pallas kernels
  vae/       AutoencoderKL + GAN/LPIPS losses
  train/     TrainState, unified trainer, sharding
  data/      dataset pipelines (host-side, per-process sharded)
  metrics/   on-device InceptionV3 FID/IS/KID
  utils/     config registry (reference-YAML compatible), logging
  cli/       train_* / sample_* entry points mirroring the reference CLI
"""

__version__ = "0.1.0"
