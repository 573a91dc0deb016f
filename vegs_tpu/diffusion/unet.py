"""Conditional UNet (Stable-Diffusion-2.x architecture) in Flax.

From-scratch implementation of the denoising UNet the reference drives
through diffusers (loss/sd_guidance.py:54-65): ResNet blocks with time
embeddings, Transformer2D blocks with self- + cross-attention against CLIP
text states (linear projections, GEGLU feed-forward — the SD-2.x layout),
down/up sampling, and optional LoRA adapters on every attention projection
(lora.py), mirroring the reference's LoRACrossAttnProcessor placement
(lora/scripts/train_text_to_image_lora_kitti360.py:454-471).

`UNetConfig.sd21()` matches stabilityai/stable-diffusion-2-1-base;
`UNetConfig.tiny()` is a shape-compatible miniature for tests.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    attention_head_dim: Tuple[int, ...] = (5, 10, 20, 20)
    cross_attention_dim: int = 1024
    norm_groups: int = 32
    with_attention: Tuple[bool, ...] = (True, True, True, False)
    lora_rank: int = 0          # 0 = no LoRA parameters
    lora_scale: float = 1.0

    @staticmethod
    def sd21() -> "UNetConfig":
        return UNetConfig()

    @staticmethod
    def tiny(cross_attention_dim: int = 32, lora_rank: int = 0) -> "UNetConfig":
        return UNetConfig(
            block_out_channels=(32, 64),
            layers_per_block=1,
            attention_head_dim=(2, 4),
            cross_attention_dim=cross_attention_dim,
            norm_groups=8,
            with_attention=(True, True),
            lora_rank=lora_rank,
        )


def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal timestep embedding (flip_sin_to_cos=True convention)."""
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period) * jnp.arange(half) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class LoRADense(nn.Module):
    """Dense layer with optional low-rank adapter: y = Wx + scale * B(A(x))."""

    features: int
    rank: int = 0
    scale: float = 1.0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.features, use_bias=self.use_bias, name="base")(x)
        if self.rank > 0:
            a = nn.Dense(self.rank, use_bias=False, name="lora_down",
                         kernel_init=nn.initializers.normal(1.0 / self.rank))(x)
            b = nn.Dense(self.features, use_bias=False, name="lora_up",
                         kernel_init=nn.initializers.zeros)(a)
            y = y + self.scale * b
        return y


class Attention(nn.Module):
    """Multi-head attention with optional cross-attention context + LoRA."""

    heads: int
    head_dim: int
    lora_rank: int = 0
    lora_scale: float = 1.0

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = self.heads * self.head_dim
        mk = lambda name: LoRADense(inner, rank=self.lora_rank,
                                    scale=self.lora_scale, use_bias=False,
                                    name=name)
        q = mk("to_q")(x)
        k = mk("to_k")(context)
        v = mk("to_v")(context)

        b, n, _ = q.shape
        m = k.shape[1]
        q = q.reshape(b, n, self.heads, self.head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, m, self.heads, self.head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, m, self.heads, self.head_dim).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) / np.sqrt(self.head_dim)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return LoRADense(inner, rank=self.lora_rank, scale=self.lora_scale,
                         use_bias=True, name="to_out")(out)


class GEGLU(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.features * 2, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(gate)


class TransformerBlock(nn.Module):
    heads: int
    head_dim: int
    cross_dim: int
    lora_rank: int = 0
    lora_scale: float = 1.0

    @nn.compact
    def __call__(self, x, context):
        inner = self.heads * self.head_dim
        x = x + Attention(self.heads, self.head_dim, self.lora_rank,
                          self.lora_scale, name="attn1")(
            nn.LayerNorm(name="norm1")(x))
        x = x + Attention(self.heads, self.head_dim, self.lora_rank,
                          self.lora_scale, name="attn2")(
            nn.LayerNorm(name="norm2")(x), context)
        h = nn.LayerNorm(name="norm3")(x)
        h = GEGLU(inner * 4, name="ff_geglu")(h)
        h = nn.Dense(inner, name="ff_out")(h)
        return x + h


class Transformer2D(nn.Module):
    """Spatial transformer with linear in/out projections (SD-2.x)."""

    heads: int
    head_dim: int
    cross_dim: int
    norm_groups: int
    lora_rank: int = 0
    lora_scale: float = 1.0

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        inner = self.heads * self.head_dim
        residual = x
        x = nn.GroupNorm(num_groups=self.norm_groups, name="norm")(x)
        x = x.reshape(b, h * w, c)
        x = nn.Dense(inner, name="proj_in")(x)
        x = TransformerBlock(self.heads, self.head_dim, self.cross_dim,
                             self.lora_rank, self.lora_scale, name="block")(
            x, context)
        x = nn.Dense(c, name="proj_out")(x)
        return x.reshape(b, h, w, c) + residual


class ResnetBlock(nn.Module):
    out_channels: int
    norm_groups: int

    @nn.compact
    def __call__(self, x, temb):
        h = nn.GroupNorm(num_groups=self.norm_groups, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv1")(h)
        t = nn.Dense(self.out_channels, name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(num_groups=self.norm_groups, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="shortcut")(x)
        return x + h


class UNet2DCondition(nn.Module):
    config: UNetConfig

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states):
        """sample [B, H, W, C_in] (NHWC), timesteps [B], context [B, L, D]."""
        cfg = self.config
        ch0 = cfg.block_out_channels[0]
        temb_dim = ch0 * 4

        temb = timestep_embedding(timesteps, ch0)
        temb = nn.Dense(temb_dim, name="time_dense1")(temb)
        temb = nn.Dense(temb_dim, name="time_dense2")(nn.silu(temb))

        h = nn.Conv(ch0, (3, 3), padding=1, name="conv_in")(sample)
        skips = [h]

        def attn_block(h, i, name):
            heads = cfg.attention_head_dim[i]
            head_dim = cfg.block_out_channels[i] // heads
            return Transformer2D(
                heads, head_dim, cfg.cross_attention_dim, cfg.norm_groups,
                cfg.lora_rank, cfg.lora_scale, name=name,
            )(h, encoder_hidden_states)

        # --- down ---------------------------------------------------------
        n_blocks = len(cfg.block_out_channels)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(ch, cfg.norm_groups, name=f"down_{i}_res{j}")(h, temb)
                if cfg.with_attention[i]:
                    h = attn_block(h, i, f"down_{i}_attn{j}")
                skips.append(h)
            if i < n_blocks - 1:
                h = nn.Conv(ch, (3, 3), strides=2, padding=1,
                            name=f"down_{i}_downsample")(h)
                skips.append(h)

        # --- mid ----------------------------------------------------------
        mid_ch = cfg.block_out_channels[-1]
        h = ResnetBlock(mid_ch, cfg.norm_groups, name="mid_res0")(h, temb)
        mid_i = n_blocks - 1 if cfg.with_attention[-1] else \
            max(i for i, a in enumerate(cfg.with_attention) if a)
        heads = cfg.attention_head_dim[mid_i]
        h = Transformer2D(
            heads, mid_ch // heads, cfg.cross_attention_dim, cfg.norm_groups,
            cfg.lora_rank, cfg.lora_scale, name="mid_attn",
        )(h, encoder_hidden_states)
        h = ResnetBlock(mid_ch, cfg.norm_groups, name="mid_res1")(h, temb)

        # --- up -----------------------------------------------------------
        for i in reversed(range(n_blocks)):
            ch = cfg.block_out_channels[i]
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock(ch, cfg.norm_groups, name=f"up_{i}_res{j}")(h, temb)
                if cfg.with_attention[i]:
                    h = attn_block(h, i, f"up_{i}_attn{j}")
            if i > 0:
                b, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, cc), "nearest")
                h = nn.Conv(ch, (3, 3), padding=1, name=f"up_{i}_upsample")(h)

        h = nn.GroupNorm(num_groups=cfg.norm_groups, name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, name="conv_out")(h)


def init_unet(key, cfg: UNetConfig, image_size: int = 32, context_len: int = 8):
    model = UNet2DCondition(cfg)
    sample = jnp.zeros((1, image_size, image_size, cfg.in_channels))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, context_len, cfg.cross_attention_dim))
    return model.init(key, sample, t, ctx)
