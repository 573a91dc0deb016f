"""Text encoding + classifier-free-guided noise prediction.

Assembles the pieces the guidance loss needs: CLIP text embeddings (via
transformers' FlaxCLIPTextModel when a local SD checkpoint provides them, or
any [2, L, D] array for tests) and the CFG UNet evaluation
(reference loss/sd_guidance.py:54-65).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .scheduler import DiffusionSchedule
from .unet import UNet2DCondition, UNetConfig
from .vae import AutoencoderKL, VAEConfig


class DiffusionModels(NamedTuple):
    unet: UNet2DCondition
    unet_params: dict
    vae: AutoencoderKL
    vae_params: dict
    schedule: DiffusionSchedule
    text_embeddings: jax.Array   # [2, L, D]: (prompt, negative-prompt)

    @staticmethod
    def tiny(key, image_size: int = 32, lora_rank: int = 0) -> "DiffusionModels":
        """Randomly initialized miniature stack for tests."""
        from .unet import init_unet
        from .vae import init_vae

        k1, k2, k3 = jax.random.split(key, 3)
        ucfg = UNetConfig.tiny(lora_rank=lora_rank)
        vcfg = VAEConfig.tiny()
        unet = UNet2DCondition(ucfg)
        vae = AutoencoderKL(vcfg)
        lat = image_size // (2 ** (len(vcfg.block_out_channels) - 1))
        return DiffusionModels(
            unet=unet,
            unet_params=init_unet(k1, ucfg, image_size=lat),
            vae=vae,
            vae_params=init_vae(k2, vcfg, image_size=image_size),
            schedule=DiffusionSchedule.scaled_linear(1000),
            text_embeddings=jax.random.normal(
                k3, (2, 8, ucfg.cross_attention_dim)) * 0.02,
        )


def encode_text_embeddings(checkpoint_dir: str, prompt: str,
                           negative_prompt: str = "") -> jax.Array:
    """[2, L, D] CLIP text embeddings from a local SD checkpoint directory
    (tokenizer/ + text_encoder/ in HF layout). The encoder is used once and
    freed, like the reference (loss/sd_guidance.py:36-38)."""
    from transformers import CLIPTokenizer, FlaxCLIPTextModel

    tokenizer = CLIPTokenizer.from_pretrained(checkpoint_dir, subfolder="tokenizer")
    encoder = FlaxCLIPTextModel.from_pretrained(checkpoint_dir, subfolder="text_encoder")
    embeds = []
    for p in (prompt, negative_prompt):
        tokens = tokenizer(p, padding="max_length",
                           max_length=tokenizer.model_max_length,
                           return_tensors="np")
        embeds.append(encoder(tokens.input_ids)[0][0])
    return jnp.stack(embeds)


def encode_image(models: DiffusionModels, rgb_chw: jax.Array,
                 key: Optional[jax.Array] = None) -> jax.Array:
    """[3, H, W] in [0,1] -> scaled latents [1, h, w, 4]
    (reference encode_imgs, sd_guidance.py:96-101)."""
    x = rgb_chw[None].transpose(0, 2, 3, 1) * 2.0 - 1.0
    return models.vae.apply(models.vae_params, x, key, method="encode")


def cfg_noise_pred(models: DiffusionModels, latents_noisy: jax.Array,
                   t: jax.Array, guidance_scale: float,
                   reference_cfg_orientation: bool = True) -> jax.Array:
    """Classifier-free-guided noise prediction.

    NOTE: the reference concatenates text embeds as (prompt, negative) but
    then combines chunks as `uncond + scale * (pos - uncond)` with the PROMPT
    prediction in the `uncond` slot (loss/sd_guidance.py:60-65) — i.e. its
    guidance extrapolates TOWARD the negative/empty prompt. We reproduce that
    behavior bit-for-bit when reference_cfg_orientation=True (default, for
    parity) and offer the standard orientation otherwise.
    """
    b = latents_noisy.shape[0]
    lat2 = jnp.concatenate([latents_noisy] * 2)
    tt = jnp.concatenate([t] * 2)
    ctx = jnp.repeat(models.text_embeddings, b, axis=0)
    eps = models.unet.apply(models.unet_params, lat2, tt, ctx)
    eps_prompt, eps_neg = jnp.split(eps, 2)
    if reference_cfg_orientation:
        return eps_prompt + guidance_scale * (eps_neg - eps_prompt)
    return eps_neg + guidance_scale * (eps_prompt - eps_neg)
