"""DPT-Hybrid monocular normal estimator in Flax.

Capability parity with the reference's vendored omnidata/MiDaS stack
(/root/reference/omnidata/modules/midas/dpt_depth.py, vit.py, blocks.py —
~1.4k LoC of PyTorch) used by omnidata/estimate_normal.py: a ViT-B/16 with an
R50 convolutional stem (vitb_rn50_384), DPT reassemble + RefineNet fusion
decoder, and a 3-channel normal head.

The module tree mirrors the REAL checkpoint structure one-to-one so the
omnidata `omnidata_dpt_normal_v2.ckpt` torch weights (timm
`vit_base_r50_s16_384` naming under `pretrained.model.*`, DPT glue under
`pretrained.act_postprocess*` / `scratch.*`) land in semantically matching
places via `convert_omnidata_state`:

  * ResNet stage = timm ResNetV2 PRE-activation bottlenecks (norm before
    conv, GroupNorm(32)+ReLU, un-normalized residual stream), stem conv
    7x7/2 + pool — /root/reference hooks the raw stage0/stage1 outputs
    (vit.py:364-369).
  * ViT block = fused qkv projection + proj, LayerNorm pre-attn/pre-mlp
    (timm naming blocks.{i}.attn.qkv / attn.proj / mlp.fc1 / mlp.fc2).
  * layer3/layer4 reassemble = act_postprocess3[3] (1x1 conv) and
    act_postprocess4[3:5] (1x1 conv + 3x3/2 conv) — vit.py:436-476.
  * Decoder = scratch.layer{1..4}_rn 3x3 no-bias convs + RefineNet fusion
    blocks (resConfUnit1/2, out_conv — blocks.py:62-73,  FeatureFusion
    below) + the DPTDepthModel head (output_conv.{0,2,4},
    dpt_depth.py:91-99, non_negative ReLU).

Forward output: decoded UNIT normals in the raw model convention
(x-right, y-down, z-backward): the torch head emits [0,1]-encoded normals;
the (out - 0.5) * 2 decode + renormalize of
/root/reference/omnidata/estimate_normal.py:152-160 is applied in-module.
`DPTConfig.tiny()` exercises the full graph in tests.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

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
    resnet_blocks: Tuple[int, ...] = (3, 4, 9)   # timm R50-hybrid stage depths
    resnet_width: int = 64
    features: int = 256             # decoder channels
    vit_hooks: Tuple[int, ...] = (8, 11)         # layer3 / layer4 hooks
    out_channels: int = 3           # normals

    @staticmethod
    def tiny() -> "DPTConfig":
        return DPTConfig(image_size=64, patch_grid=4, embed_dim=64, depth=2,
                         num_heads=2, resnet_blocks=(1, 1, 1), resnet_width=8,
                         features=16, vit_hooks=(0, 1))


def _gn(ch: int) -> int:
    """GroupNorm group count: timm ResNetV2 uses 32 everywhere (all real
    widths are >= 64); tiny test configs shrink to the channel count."""
    return min(32, ch)


class PreActBottleneck(nn.Module):
    """timm resnetv2 PreActBottleneck: norm->relu precedes each conv; the
    shortcut (when present) consumes the PRE-ACTIVATED input; the residual
    stream itself stays un-normalized (what the DPT hooks read)."""

    width: int                      # mid channels
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        out_ch = self.width * 4
        xp = nn.GroupNorm(num_groups=_gn(x.shape[-1]), name="norm1")(x)
        xp = nn.relu(xp)
        if x.shape[-1] != out_ch or self.stride != 1:
            shortcut = nn.Conv(out_ch, (1, 1), strides=self.stride,
                               use_bias=False, name="downsample")(xp)
        else:
            shortcut = x
        h = nn.Conv(self.width, (1, 1), use_bias=False, name="conv1")(xp)
        h = nn.relu(nn.GroupNorm(num_groups=_gn(self.width), name="norm2")(h))
        h = nn.Conv(self.width, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, name="conv2")(h)
        h = nn.relu(nn.GroupNorm(num_groups=_gn(self.width), name="norm3")(h))
        h = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(h)
        return shortcut + h


class ResNetStem(nn.Module):
    """R50 hybrid backbone: 7x7/2 stem + pool, three pre-act stages; returns
    the raw stage outputs [/4 (4w), /8 (8w), /16 (16w)] — the reference
    hooks stages[0]/stages[1] and patch-embeds stages[2]."""

    cfg: DPTConfig

    @nn.compact
    def __call__(self, x):
        w = self.cfg.resnet_width
        h = nn.Conv(w, (7, 7), strides=2, padding=3, use_bias=False,
                    name="conv_stem")(x)
        h = nn.relu(nn.GroupNorm(num_groups=_gn(w), name="norm_stem")(h))
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = []
        for si, nb in enumerate(self.cfg.resnet_blocks):
            width = w * (2 ** si)
            for bi in range(nb):
                stride = 2 if (bi == 0 and si > 0) else 1
                h = PreActBottleneck(width, stride,
                                     name=f"stage{si}_block{bi}")(h)
            feats.append(h)
        return feats


class ViTBlock(nn.Module):
    """timm VisionTransformer block: LN -> fused-qkv attention -> residual,
    LN -> 4x MLP -> residual."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):
        b, t, d = x.shape
        hd = d // self.heads
        h = nn.LayerNorm(name="norm1")(x)
        qkv = nn.Dense(3 * d, name="qkv")(h)                 # [B, T, 3D]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, self.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, self.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, self.heads, hd).transpose(0, 2, 1, 3)
        a = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(hd)
        a = jax.nn.softmax(a, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
        x = x + nn.Dense(d, name="attn_proj")(o)
        h = nn.LayerNorm(name="norm2")(x)
        h = nn.Dense(self.dim * 4, name="mlp1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, name="mlp2")(h)
        return x + h


class ResidualConvUnit(nn.Module):
    """MiDaS ResidualConvUnit_custom (bn=False): relu-conv-relu-conv + skip."""

    features: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(h)
        return x + h


class FeatureFusion(nn.Module):
    """MiDaS FeatureFusionBlock_custom: optional skip through rcu1
    (resConfUnit1), rcu2 (resConfUnit2), 2x upsample, 1x1 out conv."""

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
        """[B, H, W, 3] normalized image -> [B, H, W, 3] unit normals
        (x-right, y-down, z-backward — the raw model convention before the
        tool's x/y flip)."""
        cfg = self.cfg
        f4, f8, f16 = ResNetStem(cfg, name="stem")(x)

        # patchify /16 features into tokens (timm hybrid patch_embed.proj)
        tokens = nn.Conv(cfg.embed_dim, (1, 1), name="patch_embed")(f16)
        b, gh, gw, _ = tokens.shape
        tokens = tokens.reshape(b, gh * gw, cfg.embed_dim)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, cfg.embed_dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, gh * gw + 1, cfg.embed_dim))
        tokens = jnp.concatenate(
            [jnp.repeat(cls, b, axis=0), tokens], axis=1) + pos

        # The DPT hooks read RAW block outputs (pre final-norm): the timm
        # model's trailing `norm` only feeds the discarded classifier
        # output, so it has no module here (convert_omnidata_state reports
        # `pretrained.model.norm.*` as intentionally unused).
        hooks = {}
        for i in range(cfg.depth):
            tokens = ViTBlock(cfg.embed_dim, cfg.num_heads,
                              name=f"block{i}")(tokens)
            if i in cfg.vit_hooks:
                hooks[i] = tokens

        def tokens_to_map(t):
            return t[:, 1:].reshape(b, gh, gw, cfg.embed_dim)

        # Reassemble: act_postprocess3 = [slice cls, reshape, 1x1 conv];
        # act_postprocess4 adds a 3x3/2 conv down to /32 (vit.py:436-476;
        # for vitb_rn50_384 features[2] == features[3] == vit_features).
        v16 = nn.Conv(cfg.embed_dim, (1, 1), name="post3")(
            tokens_to_map(hooks[cfg.vit_hooks[0]]))
        v32 = nn.Conv(cfg.embed_dim, (1, 1), name="post4_proj")(
            tokens_to_map(hooks[cfg.vit_hooks[1]]))
        v32 = nn.Conv(cfg.embed_dim, (3, 3), strides=2, padding=1,
                      name="post4_down")(v32)

        f = cfg.features
        l1 = nn.Conv(f, (3, 3), padding=1, use_bias=False, name="scratch1")(f4)
        l2 = nn.Conv(f, (3, 3), padding=1, use_bias=False, name="scratch2")(f8)
        l3 = nn.Conv(f, (3, 3), padding=1, use_bias=False, name="scratch3")(v16)
        l4 = nn.Conv(f, (3, 3), padding=1, use_bias=False, name="scratch4")(v32)

        h = FeatureFusion(f, name="fusion4")(l4)          # /32 -> /16
        h = FeatureFusion(f, name="fusion3")(h, l3)       # /16 -> /8
        h = FeatureFusion(f, name="fusion2")(h, l2)       # /8 -> /4
        h = FeatureFusion(f, name="fusion1")(h, l1)       # /4 -> /2

        # DPTDepthModel head (dpt_depth.py:91-99): conv, 2x upsample, conv,
        # relu, 1x1 conv, non_negative ReLU -> [0, 1]-encoded normals.
        h = nn.Conv(f // 2, (3, 3), padding=1, name="head_conv1")(h)
        bh, hh, ww, cc = h.shape
        h = jax.image.resize(h, (bh, hh * 2, ww * 2, cc), "bilinear")
        h = nn.Conv(32, (3, 3), padding=1, name="head_conv2")(h)
        h = nn.relu(h)
        out = nn.Conv(cfg.out_channels, (1, 1), name="head_out")(h)
        out = jnp.clip(nn.relu(out), 0.0, 1.0)
        # decode [0,1] -> [-1,1] and renormalize (estimate_normal.py:152-160)
        n = (out - 0.5) * 2.0
        norm = jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-12)
        return n / norm


def init_dpt(key, cfg: DPTConfig):
    model = DPTNormal(cfg)
    x = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    return model.init(key, x)


# ---------------------------------------------------------------------------
# Checkpoint conversion (omnidata_dpt_normal_v2.ckpt / MiDaS DPT-hybrid)
# ---------------------------------------------------------------------------

# Checkpoint tensors that exist but are UNUSED by the DPT forward pass —
# reported separately from genuinely unknown keys:
#   * pretrained.model.norm.*: the timm final LayerNorm only feeds the
#     discarded classifier path (vit.py forward_flex's `glob`).
#   * scratch.refinenet4.resConfUnit1.*: refinenet4 is called with a single
#     input, so its skip-branch parameters are dead weight
#     (blocks.py FeatureFusionBlock_custom.forward, len(xs) == 1).
#   * pretrained.model.head.* / patch_embed.backbone.norm.*: classifier
#     head and backbone final norm, never reached by hooked features.
DEAD_KEY_PREFIXES = (
    "pretrained.model.norm.",
    "pretrained.model.head.",
    "pretrained.model.patch_embed.backbone.norm.",
    "scratch.refinenet4.resConfUnit1.",
)


def _std_conv(w: np.ndarray) -> np.ndarray:
    """timm ResNetV2 StdConv2d standardizes its weight at every forward
    (w - mean) / sqrt(var + eps) over the per-output-filter fan-in; applying
    it once at conversion time is equivalent for inference."""
    w = np.asarray(w, np.float32)
    mean = w.mean(axis=(1, 2, 3), keepdims=True)
    var = w.var(axis=(1, 2, 3), keepdims=True)
    return (w - mean) / np.sqrt(var + 1e-8)


def convert_omnidata_state(state: dict, cfg: DPTConfig = DPTConfig()):
    """Map the omnidata DPT-hybrid state dict (numpy tensors, prefix-stripped
    to `pretrained.*` / `scratch.*`) onto DPTNormal params.

    Returns (params, unmapped): `unmapped` lists checkpoint keys that were
    neither consumed nor in the documented dead set — non-empty means the
    checkpoint layout diverges from the modeled one (raise-worthy upstream).
    """
    read = set()

    def g(k):
        read.add(k)
        return np.asarray(state[k])

    def conv(k, std=False):   # OIHW -> HWIO
        w = g(k)
        if std:
            w = _std_conv(w)
        return jnp.asarray(w.transpose(2, 3, 1, 0))

    def lin(k):               # [O, I] -> [I, O]
        return jnp.asarray(np.asarray(g(k)).T)

    def arr(k):
        return jnp.asarray(g(k))

    p = {}

    def setp(path, value):
        node = p
        parts = path.split("/")
        for q in parts[:-1]:
            node = node.setdefault(q, {})
        node[parts[-1]] = value

    bb = "pretrained.model.patch_embed.backbone"
    setp("stem/conv_stem/kernel", conv(f"{bb}.stem.conv.weight", std=True))
    setp("stem/norm_stem/scale", arr(f"{bb}.stem.norm.weight"))
    setp("stem/norm_stem/bias", arr(f"{bb}.stem.norm.bias"))
    for si, nb in enumerate(cfg.resnet_blocks):
        for bi in range(nb):
            src = f"{bb}.stages.{si}.blocks.{bi}"
            dst = f"stem/stage{si}_block{bi}"
            for ni in (1, 2, 3):
                setp(f"{dst}/norm{ni}/scale", arr(f"{src}.norm{ni}.weight"))
                setp(f"{dst}/norm{ni}/bias", arr(f"{src}.norm{ni}.bias"))
                setp(f"{dst}/conv{ni}/kernel",
                     conv(f"{src}.conv{ni}.weight", std=True))
            if f"{src}.downsample.conv.weight" in state:
                setp(f"{dst}/downsample/kernel",
                     conv(f"{src}.downsample.conv.weight", std=True))

    setp("patch_embed/kernel", conv("pretrained.model.patch_embed.proj.weight"))
    setp("patch_embed/bias", arr("pretrained.model.patch_embed.proj.bias"))
    setp("cls_token", arr("pretrained.model.cls_token"))
    setp("pos_embed", arr("pretrained.model.pos_embed"))

    for i in range(cfg.depth):
        src = f"pretrained.model.blocks.{i}"
        dst = f"block{i}"
        setp(f"{dst}/norm1/scale", arr(f"{src}.norm1.weight"))
        setp(f"{dst}/norm1/bias", arr(f"{src}.norm1.bias"))
        setp(f"{dst}/qkv/kernel", lin(f"{src}.attn.qkv.weight"))
        setp(f"{dst}/qkv/bias", arr(f"{src}.attn.qkv.bias"))
        setp(f"{dst}/attn_proj/kernel", lin(f"{src}.attn.proj.weight"))
        setp(f"{dst}/attn_proj/bias", arr(f"{src}.attn.proj.bias"))
        setp(f"{dst}/norm2/scale", arr(f"{src}.norm2.weight"))
        setp(f"{dst}/norm2/bias", arr(f"{src}.norm2.bias"))
        setp(f"{dst}/mlp1/kernel", lin(f"{src}.mlp.fc1.weight"))
        setp(f"{dst}/mlp1/bias", arr(f"{src}.mlp.fc1.bias"))
        setp(f"{dst}/mlp2/kernel", lin(f"{src}.mlp.fc2.weight"))
        setp(f"{dst}/mlp2/bias", arr(f"{src}.mlp.fc2.bias"))

    # act_postprocess1/2 are parameterless Identity for the hybrid backbone
    # (vit.py:425-430); 3/4 carry the reassemble convs at Sequential
    # indices 3 (and 4 for the /32 downsample).
    setp("post3/kernel", conv("pretrained.act_postprocess3.3.weight"))
    setp("post3/bias", arr("pretrained.act_postprocess3.3.bias"))
    setp("post4_proj/kernel", conv("pretrained.act_postprocess4.3.weight"))
    setp("post4_proj/bias", arr("pretrained.act_postprocess4.3.bias"))
    setp("post4_down/kernel", conv("pretrained.act_postprocess4.4.weight"))
    setp("post4_down/bias", arr("pretrained.act_postprocess4.4.bias"))

    for li in range(1, 5):
        setp(f"scratch{li}/kernel", conv(f"scratch.layer{li}_rn.weight"))
    for ri in range(1, 5):
        src = f"scratch.refinenet{ri}"
        dst = f"fusion{ri}"
        units = (("rcu2", "resConfUnit2"),) if ri == 4 else (
            ("rcu1", "resConfUnit1"), ("rcu2", "resConfUnit2"))
        for du, su in units:
            for ci in (1, 2):
                setp(f"{dst}/{du}/conv{ci}/kernel",
                     conv(f"{src}.{su}.conv{ci}.weight"))
                setp(f"{dst}/{du}/conv{ci}/bias",
                     arr(f"{src}.{su}.conv{ci}.bias"))
        setp(f"{dst}/project/kernel", conv(f"{src}.out_conv.weight"))
        setp(f"{dst}/project/bias", arr(f"{src}.out_conv.bias"))

    for dst, idx in (("head_conv1", 0), ("head_conv2", 2), ("head_out", 4)):
        setp(f"{dst}/kernel", conv(f"scratch.output_conv.{idx}.weight"))
        setp(f"{dst}/bias", arr(f"scratch.output_conv.{idx}.bias"))

    unmapped = sorted(
        k for k in state
        if k not in read and not k.startswith(DEAD_KEY_PREFIXES))
    return {"params": p}, unmapped


def load_omnidata_checkpoint(path: str, cfg: DPTConfig = DPTConfig()):
    """Load `omnidata_dpt_normal_v2.ckpt` (torch) and convert. The published
    checkpoint wraps the DPT under a `state_dict` with a `model.` prefix
    (estimate_normal.py:60-66 strips k[6:])."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in state:
        state = {k.replace("model.", "", 1): v.numpy()
                 for k, v in state["state_dict"].items()}
    else:
        state = {k: np.asarray(v) for k, v in state.items()}
    return convert_omnidata_state(state, cfg)
