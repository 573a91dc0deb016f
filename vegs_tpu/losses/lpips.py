"""LPIPS perceptual distance (VGG backbone) in Flax.

Parity with /root/reference/lpipsPyTorch/ (modules/lpips.py:8-37,
networks.py): normalized per-layer features, 1x1 linear heads, spatial mean,
layer sum. Weights: the backbone loads torchvision VGG16 weights and the
linear heads load the LPIPS 'vgg.pth' export via load_lpips_weights; with no
weights on disk, `lpips_available()` is False and metrics omit LPIPS.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import vgg

# channel dims of the 5 VGG blocks used by LPIPS-vgg
LPIPS_CHANNELS = (64, 128, 256, 512, 512)


def _normalize_activation(f: jax.Array, eps: float = 1e-10) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True))
    return f / (norm + eps)


def lpips(params, lin_weights, x_chw: jax.Array, y_chw: jax.Array) -> jax.Array:
    """LPIPS distance between [3,H,W] images in [0,1]."""
    fx = vgg.extract_features(params, x_chw, normalization="lpips")
    fy = vgg.extract_features(params, y_chw, normalization="lpips")
    total = jnp.float32(0.0)
    for i, (a, b) in enumerate(zip(fx, fy)):
        d = (_normalize_activation(a) - _normalize_activation(b)) ** 2
        w = lin_weights[i]  # [C]
        total = total + jnp.mean(jnp.sum(d * w[None, None, None, :], axis=-1))
    return total


def random_lin_weights(key: jax.Array):
    """Uniform positive heads — for tests only."""
    keys = jax.random.split(key, len(LPIPS_CHANNELS))
    return [jax.random.uniform(k, (c,)) * 0.01
            for k, c in zip(keys, LPIPS_CHANNELS)]


def load_lpips_weights(path: str):
    """Load LPIPS linear-head weights from an .npz with arrays lin0..lin4
    (each [C]) or a converted torch export."""
    data = np.load(path)
    return [jnp.asarray(np.ravel(data[f"lin{i}"])) for i in range(5)]


DEFAULT_WEIGHT_DIR = os.environ.get(
    "VEGS_WEIGHTS_DIR", os.path.expanduser("~/.cache/vegs_tpu/weights"))


def lpips_available(weight_dir: Optional[str] = None) -> bool:
    d = weight_dir or DEFAULT_WEIGHT_DIR
    return (os.path.exists(os.path.join(d, "vgg16_features.npz"))
            and os.path.exists(os.path.join(d, "lpips_vgg_lins.npz")))


def load_default(weight_dir: Optional[str] = None):
    d = weight_dir or DEFAULT_WEIGHT_DIR
    params = vgg.load_npz(os.path.join(d, "vgg16_features.npz"))
    lins = load_lpips_weights(os.path.join(d, "lpips_vgg_lins.npz"))
    return params, lins
