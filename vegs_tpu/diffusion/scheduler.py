"""Diffusion noise schedule (DDPM forward process + DDIM stepping).

Implements the scaled-linear beta schedule Stable Diffusion trains with
(diffusers' DDIMScheduler defaults used by the reference pipeline,
loss/sd_guidance.py:13-47): the guidance losses only need alphas_cumprod,
add_noise, and the SDS weighting w(t) = 1 - alpha_bar_t.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class DiffusionSchedule(NamedTuple):
    betas: jax.Array           # [T]
    alphas_cumprod: jax.Array  # [T]
    num_train_timesteps: int

    @staticmethod
    def scaled_linear(num_train_timesteps: int = 1000,
                      beta_start: float = 0.00085,
                      beta_end: float = 0.012) -> "DiffusionSchedule":
        betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                            num_train_timesteps) ** 2
        alphas = 1.0 - betas
        return DiffusionSchedule(
            betas=jnp.asarray(betas, jnp.float32),
            alphas_cumprod=jnp.asarray(np.cumprod(alphas), jnp.float32),
            num_train_timesteps=num_train_timesteps,
        )

    def add_noise(self, x0: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
        """q(x_t | x_0) sample: sqrt(a_bar) x0 + sqrt(1 - a_bar) eps."""
        a = self.alphas_cumprod[t]
        shape = (-1,) + (1,) * (x0.ndim - 1) if jnp.ndim(t) else ()
        a = a.reshape(shape) if jnp.ndim(t) else a
        return jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * noise

    def sigma(self, t: jax.Array) -> jax.Array:
        """Noise std sqrt(1 - a_bar_t)."""
        return jnp.sqrt(1.0 - self.alphas_cumprod[t])

    def sds_weight(self, t: jax.Array) -> jax.Array:
        """w(t) = 1 - a_bar_t (standard SDS weighting)."""
        return 1.0 - self.alphas_cumprod[t]

    def ddim_step(self, x_t: jax.Array, eps: jax.Array, t: int, t_prev: int,
                  eta: float = 0.0) -> jax.Array:
        """Deterministic DDIM update x_t -> x_{t_prev}."""
        a_t = self.alphas_cumprod[t]
        a_prev = jnp.where(t_prev >= 0, self.alphas_cumprod[t_prev], 1.0)
        x0_pred = (x_t - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        dir_xt = jnp.sqrt(1 - a_prev) * eps
        return jnp.sqrt(a_prev) * x0_pred + dir_xt
