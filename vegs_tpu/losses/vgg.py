"""VGG16 feature extractor in Flax, shared by the perceptual loss and LPIPS.

Replaces the reference's torchvision-based VGG16 usage
(/root/reference/loss/vgg_perceptual_loss.py:4-44, lpipsPyTorch/modules/
networks.py). Weights load from a .npz export or a torchvision state_dict
(see load_torch_state_dict); with no weights available the module initializes
randomly — metrics code reports LPIPS only when real weights are provided.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# torchvision vgg16.features layer plan: (out_channels, n_convs) per block
VGG16_PLAN = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
# LPIPS variant normalization (lpipsPyTorch/modules/utils.py semantics)
LPIPS_SHIFT = (-0.030, -0.088, -0.188)
LPIPS_SCALE = (0.458, 0.448, 0.450)


class VGG16Features(nn.Module):
    """Returns per-block activations (after the last ReLU of each block)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        # x: [B, H, W, 3], already normalized
        feats = []
        for bi, (ch, n_convs) in enumerate(VGG16_PLAN):
            for ci in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding=1, name=f"conv{bi}_{ci}")(x)
                x = nn.relu(x)
            feats.append(x)
            if bi < len(VGG16_PLAN) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


def init_params(key: jax.Array, image_hw=(64, 64)):
    mod = VGG16Features()
    dummy = jnp.zeros((1, *image_hw, 3))
    return mod.init(key, dummy)


def load_torch_state_dict(state: dict):
    """Convert a torchvision vgg16 `features` state_dict (numpy arrays) into
    Flax params for VGG16Features. Accepts keys 'features.{i}.weight/bias'."""
    # torchvision conv indices within `features`
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    params = {}
    k = 0
    for bi, (_, n_convs) in enumerate(VGG16_PLAN):
        for ci in range(n_convs):
            i = conv_idx[k]
            w = np.asarray(state[f"features.{i}.weight"])  # [O, I, kh, kw]
            b = np.asarray(state[f"features.{i}.bias"])
            params[f"conv{bi}_{ci}"] = {
                "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),  # HWIO
                "bias": jnp.asarray(b),
            }
            k += 1
    return {"params": params}


def load_npz(path: str):
    data = np.load(path)
    return load_torch_state_dict({k: data[k] for k in data.files})


def normalize_imagenet(x_rgb01: jax.Array) -> jax.Array:
    """[..., 3] in [0,1] -> ImageNet-normalized."""
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return (x_rgb01 - mean) / std


def normalize_lpips(x_rgb01: jax.Array) -> jax.Array:
    """LPIPS scaling layer: input in [-1, 1] shifted/scaled."""
    x = x_rgb01 * 2.0 - 1.0
    return (x - jnp.asarray(LPIPS_SHIFT)) / jnp.asarray(LPIPS_SCALE)


def extract_features(params, x_rgb01_chw: jax.Array,
                     normalization: str = "imagenet") -> list[jax.Array]:
    """[3, H, W] (or [B, 3, H, W]) in [0,1] -> list of [B, h, w, c] features."""
    x = x_rgb01_chw
    if x.ndim == 3:
        x = x[None]
    x = jnp.transpose(x, (0, 2, 3, 1))
    x = normalize_imagenet(x) if normalization == "imagenet" else normalize_lpips(x)
    return VGG16Features().apply(params, x)
