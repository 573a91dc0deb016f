"""Diffusion guidance for extrapolated views (score-matching / SDS).

Parity with /root/reference/loss/sd_guidance.py:49-88
(`LoRADiffusionRegularizer.forward`): VAE-encode the rendering into latents
(gradients flow through the encoder), draw a timestep from [min_step,
max_step(iter)] with the max linearly annealed to 0 across the guidance
window (line 51), add noise, take a stop-gradient CFG noise prediction from
the LoRA-adapted UNet, then either

  score-matching:  L = -sum(sm_lambda * (-eps_hat / sigma_t) * z)
  SDS:             L = 0.5 * ||z - stopgrad(z - w_t * scale * (eps_hat - eps))||^2 / B

Runs natively on TPU through vegs_tpu.diffusion (Flax UNet/VAE); model
weights come from a local SD-2.1 checkpoint + per-segment LoRA when
available, or any DiffusionModels instance (tests use the tiny stack).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ..diffusion.pipeline import DiffusionModels, cfg_noise_pred, encode_image


@dataclass
class SDGuidance:
    models: DiffusionModels
    guidance_mode: str = "score-matching"
    guidance_scale: float = 7.5
    min_step: int = 0
    max_step: int = 50
    sm_lambda: float = 1e-13
    sds_grad_scale: float = 1.0
    start_iter: int = 97_500
    max_iters: int = 100_000
    reference_cfg_orientation: bool = True

    def max_step_at(self, iteration) -> jax.Array:
        """Linearly annealed max timestep (reference line 51)."""
        frac = (iteration - self.start_iter) / max(
            self.max_iters - self.start_iter, 1)
        return jnp.asarray(self.max_step * (1.0 - frac)).astype(jnp.int32)

    def __call__(self, key: jax.Array, pred_rgb_chw: jax.Array,
                 iteration) -> jax.Array:
        """Guidance loss for a [3, H, W] rendering in [0, 1]."""
        k_enc, k_t, k_noise = jax.random.split(key, 3)
        latents = encode_image(self.models, pred_rgb_chw, k_enc)  # [1,h,w,4]
        sched = self.models.schedule

        max_step = jnp.maximum(self.max_step_at(iteration), self.min_step)
        t = jax.random.randint(k_t, (latents.shape[0],), self.min_step,
                               max_step + 1)

        noise = jax.random.normal(k_noise, latents.shape)
        latents_noisy = sched.add_noise(latents, noise, t)
        eps_hat = jax.lax.stop_gradient(cfg_noise_pred(
            self.models, jax.lax.stop_gradient(latents_noisy), t,
            self.guidance_scale, self.reference_cfg_orientation))

        if self.guidance_mode == "score-matching":
            sigma = sched.sigma(t).reshape((-1,) + (1,) * (latents.ndim - 1))
            grad_log_prior = -eps_hat / sigma
            return -jnp.sum(self.sm_lambda * grad_log_prior * latents)
        elif self.guidance_mode == "sds":
            w = sched.sds_weight(t).reshape((-1,) + (1,) * (latents.ndim - 1))
            grad = self.sds_grad_scale * w * (eps_hat - noise)
            grad = jnp.nan_to_num(grad)
            targets = jax.lax.stop_gradient(latents - grad)
            return 0.5 * jnp.sum((latents - targets) ** 2) / latents.shape[0]
        raise NotImplementedError(
            f"Unknown diffusion regularization method {self.guidance_mode}")


def build_guidance(cfg_sd, checkpoint_dir: Optional[str] = None,
                   lora_dir: Optional[str] = None,
                   models: Optional[DiffusionModels] = None,
                   max_iters: int = 100_000) -> SDGuidance:
    """Construct guidance from config. Pass `models` directly (tests), or a
    local SD checkpoint directory (+ optional LoRA weights)."""
    if models is None:
        if checkpoint_dir is None:
            raise ValueError(
                "SD guidance needs either a DiffusionModels instance or a "
                "local checkpoint directory (zero-egress: no hub downloads)")
        from ..diffusion import weights

        models = weights.load_sd_checkpoint(
            checkpoint_dir, prompt=cfg_sd.prompts,
            negative_prompt=cfg_sd.negative_prompts, lora_dir=lora_dir)
    return SDGuidance(
        models=models,
        guidance_mode=cfg_sd.guidance_mode,
        guidance_scale=cfg_sd.sd_guidance_scale,
        min_step=cfg_sd.sd_min_step,
        max_step=cfg_sd.sd_max_step,
        sm_lambda=cfg_sd.sm_lambda,
        sds_grad_scale=cfg_sd.sds_grad_scale,
        start_iter=cfg_sd.start_guiding_from_iter,
        max_iters=max_iters,
    )
