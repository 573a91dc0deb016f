"""StyleGAN2-style fused image ops in plain JAX.

The reference vendors CUDA kernels for these (model/op/fused_bias_act*.cu,
upfirdn2d*.cu, 533 LoC) whose only consumer is the vestigial StyleGAN2
module (SURVEY.md §2.3 item 3 / §2.4). Provided here as fused XLA ops so the
GAN path can be revived without native code: under jit, XLA fuses the bias +
leaky-ReLU + gain chain into one kernel, and upfirdn2d lowers to a single
dilated/strided convolution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def fused_leaky_relu(x: jax.Array, bias: jax.Array | None = None,
                     negative_slope: float = 0.2,
                     scale: float = float(np.sqrt(2.0))) -> jax.Array:
    """bias-add + leaky ReLU + gain (fused_bias_act parity). x: [..., C]."""
    if bias is not None:
        x = x + bias
    return jnp.where(x >= 0, x, x * negative_slope) * scale


def upfirdn2d(x: jax.Array, kernel: jax.Array, up: int = 1, down: int = 1,
              pad: tuple[int, int] = (0, 0)) -> jax.Array:
    """Upsample -> FIR filter -> downsample. x: [B, H, W, C], kernel [kh, kw].

    Matches the reference kernel's semantics (model/op/upfirdn2d.py): zero
    upsampling by `up`, 2D FIR, stride-`down` decimation, symmetric pad spec
    (pad0, pad1) applied on both axes.
    """
    b, h, w, c = x.shape
    kh, kw = kernel.shape
    pad0, pad1 = pad

    lhs = x.transpose(0, 3, 1, 2).reshape(b * c, 1, h, w)
    rhs = kernel[None, None, ::-1, ::-1].astype(x.dtype)
    # lhs_dilation inserts zeros BETWEEN samples (size in*up - up + 1);
    # upfirdn's zero-upsampling appends trailing zeros too (size in*up):
    # account for them in the trailing pad.
    p1 = pad1 + up - 1
    out = jax.lax.conv_general_dilated(
        lhs, rhs,
        window_strides=(down, down),
        padding=((pad0, p1), (pad0, p1)),
        lhs_dilation=(up, up),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    _, _, oh, ow = out.shape
    return out.reshape(b, c, oh, ow).transpose(0, 2, 3, 1)


def make_fir_kernel(k) -> jax.Array:
    """1D spec -> normalized separable 2D FIR kernel (StyleGAN2 convention)."""
    k = jnp.asarray(k, jnp.float32)
    if k.ndim == 1:
        k = jnp.outer(k, k)
    return k / jnp.sum(k)
