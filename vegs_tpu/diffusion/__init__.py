"""Latent-diffusion stack in Flax (Stable-Diffusion-2.1 architecture).

The reference drives its extrapolated-view guidance through diffusers'
PyTorch StableDiffusionPipeline + per-scene LoRA (/root/reference/loss/
sd_guidance.py, lora/scripts/). This package is a from-scratch Flax
implementation of the needed pieces so the guidance runs natively on TPU:

  scheduler.py   — DDPM/DDIM noise schedule (add_noise, CFG stepping)
  unet.py        — UNet2DCondition (cross-attention, SD-2.1 config)
  vae.py         — AutoencoderKL encoder/decoder
  lora.py        — LoRA adapters on the UNet attention projections
  weights.py     — torch checkpoint -> Flax parameter conversion
  pipeline.py    — text encoding (FlaxCLIP) + CFG noise prediction

All modules accept small test configs; real SD-2.1 weights load from a local
checkpoint directory (zero-egress environments ship no weights).
"""

from .scheduler import DiffusionSchedule  # noqa: F401
from .unet import UNet2DCondition, UNetConfig  # noqa: F401
from .vae import AutoencoderKL, VAEConfig  # noqa: F401
