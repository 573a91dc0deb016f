"""AutoencoderKL (Stable Diffusion VAE) in Flax.

The guidance loss backprops the rendering through the VAE ENCODER into latent
space (reference loss/sd_guidance.py:96-101); the decoder is provided for
completeness (image synthesis / debugging). Architecture follows the SD
`AutoencoderKL`: ResNet stacks with one mid self-attention, downsample 8x,
latent channels 4, scaling factor 0.18215.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

SD_VAE_SCALE = 0.18215


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32
    scaling_factor: float = SD_VAE_SCALE

    @staticmethod
    def sd() -> "VAEConfig":
        return VAEConfig()

    @staticmethod
    def tiny() -> "VAEConfig":
        return VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                         norm_groups=4)


class VResnet(nn.Module):
    out_channels: int
    norm_groups: int

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=self.norm_groups, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv1")(h)
        h = nn.GroupNorm(num_groups=self.norm_groups, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="shortcut")(x)
        return x + h


class VAttention(nn.Module):
    norm_groups: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        x = nn.GroupNorm(num_groups=self.norm_groups, name="norm")(x)
        flat = x.reshape(b, h * w, c)
        q = nn.Dense(c, name="q")(flat)
        k = nn.Dense(c, name="k")(flat)
        v = nn.Dense(c, name="v")(flat)
        attn = jax.nn.softmax(q @ k.transpose(0, 2, 1) / jnp.sqrt(c), axis=-1)
        out = nn.Dense(c, name="proj_out")(attn @ v)
        return res + out.reshape(b, h, w, c)


class Encoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = VResnet(ch, cfg.norm_groups, name=f"down_{i}_res{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                h = nn.Conv(ch, (3, 3), strides=2, padding=((0, 1), (0, 1)),
                            name=f"down_{i}_downsample")(h)
        ch = cfg.block_out_channels[-1]
        h = VResnet(ch, cfg.norm_groups, name="mid_res0")(h)
        h = VAttention(cfg.norm_groups, name="mid_attn")(h)
        h = VResnet(ch, cfg.norm_groups, name="mid_res1")(h)
        h = nn.GroupNorm(num_groups=cfg.norm_groups, name="norm_out")(h)
        h = nn.silu(h)
        # moments: mean + logvar
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                       name="conv_out")(h)


class Decoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        ch = cfg.block_out_channels[-1]
        h = nn.Conv(ch, (3, 3), padding=1, name="conv_in")(z)
        h = VResnet(ch, cfg.norm_groups, name="mid_res0")(h)
        h = VAttention(cfg.norm_groups, name="mid_attn")(h)
        h = VResnet(ch, cfg.norm_groups, name="mid_res1")(h)
        for i in reversed(range(len(cfg.block_out_channels))):
            ch = cfg.block_out_channels[i]
            for j in range(cfg.layers_per_block + 1):
                h = VResnet(ch, cfg.norm_groups, name=f"up_{i}_res{j}")(h)
            if i > 0:
                b, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, cc), "nearest")
                h = nn.Conv(cc, (3, 3), padding=1, name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(num_groups=cfg.norm_groups, name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.in_channels, (3, 3), padding=1, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    config: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.config)
        self.decoder = Decoder(self.config)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       name="post_quant_conv")

    def encode_moments(self, x):
        """[B, H, W, 3] in [-1, 1] -> (mean, logvar) latents [B, h, w, 4]."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x, key=None):
        """Scaled latent sample (mode when key is None)."""
        mean, logvar = self.encode_moments(x)
        z = mean if key is None else (
            mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape))
        return z * self.config.scaling_factor

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z / self.config.scaling_factor))

    def __call__(self, x, key=None):
        return self.decode(self.encode(x, key))


def init_vae(key, cfg: VAEConfig, image_size: int = 32):
    model = AutoencoderKL(cfg)
    x = jnp.zeros((1, image_size, image_size, cfg.in_channels))
    return model.init(key, x)
