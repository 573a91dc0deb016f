"""Photometric losses: L1/L2 (masked), windowed SSIM, PSNR.

Parity with /root/reference/utils/loss_utils.py:18-79 (11x11 Gaussian window,
sigma 1.5) and utils/image_utils.py:18. Implemented with depthwise
lax.conv_general_dilated so the whole SSIM graph fuses under jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(pred: jax.Array, gt: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    d = jnp.abs(pred - gt)
    if mask is not None:
        return jnp.sum(d * mask) / (jnp.sum(mask) * (d.size / mask.size) + 1e-8)
    return jnp.mean(d)


def l2_loss(pred: jax.Array, gt: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    d = (pred - gt) ** 2
    if mask is not None:
        return jnp.sum(d * mask) / (jnp.sum(mask) * (d.size / mask.size) + 1e-8)
    return jnp.mean(d)


def psnr(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Per-image PSNR over flattened pixels (reference image_utils.py:18)."""
    mse = jnp.mean((pred - gt) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs**2) / (2 * sigma**2))
    g = g / g.sum()
    w2d = np.outer(g, g).astype(np.float32)
    return w2d


def _depthwise_filter(img: jax.Array, window: jax.Array) -> jax.Array:
    """[C, H, W] -> same, per-channel 2D filtering, SAME padding."""
    c = img.shape[0]
    lhs = img[None]  # [1, C, H, W]
    rhs = jnp.broadcast_to(window[None, None], (c, 1, *window.shape))
    out = jax.lax.conv_general_dilated(
        lhs, rhs,
        window_strides=(1, 1),
        padding="SAME",
        feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        # FULL f32: XLA:TPU lowers default-precision convs through bf16
        # MXU passes; the E[x^2] - mu^2 cancellation below then carries
        # ~2e-3 noise — larger than c2 = 9e-4 — so SSIM denominators go
        # negative and the loss GRADIENT explodes (measured: means-grad
        # rms 2e-1 / max 25 at 128x256 vs 1.4e-5 under l1 — the round-4
        # "14 dB full-model gap" root cause).
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[0]


def ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11,
         sigma: float = 1.5) -> jax.Array:
    """Mean SSIM over [C, H, W] images in [0, 1] (reference loss_utils.py:30-79)."""
    window = jnp.asarray(_gaussian_window(window_size, sigma))
    mu1 = _depthwise_filter(img1, window)
    mu2 = _depthwise_filter(img2, window)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    # Clamp the variance estimates at 0: E[x^2] - mu^2 is a catastrophic
    # cancellation and even exact f32 can dip slightly negative on flat
    # regions; a negative variance flips the denominator's sign near
    # -c2 and the quotient rule then amplifies gradients unboundedly.
    # (True variances are >= 0, so clamping only removes float error.)
    sigma1_sq = jnp.maximum(
        _depthwise_filter(img1 * img1, window) - mu1_sq, 0.0)
    sigma2_sq = jnp.maximum(
        _depthwise_filter(img2 * img2, window) - mu2_sq, 0.0)
    sigma12 = _depthwise_filter(img1 * img2, window) - mu12
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)
