"""Covariance-surface alignment loss.

Parity with /root/reference/loss/normal_guidance.py:3-23: the rasterizer's
per-pixel covariance quaternion/scale maps are compared against monocular
surface normals — the loss is the mean absolute cosine between each rotation
axis (and scaled axis) and the predicted normal, flattening Gaussians onto
surfaces:

  loss = 0.8 * mean|<R_cols, n>| + 0.2 * mean|<(stop_grad(R) * s)_cols, n>|

with the rotation detached in the scale term as in the reference (line 11).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import geometry


def loss_normal_guidance(
    render_cov_quat: jax.Array,   # [4, H, W]
    render_cov_scale: jax.Array,  # [3, H, W]
    normal_pred: jax.Array,       # [3, H, W] unit normals (world space)
    mask: jax.Array | None = None,  # [H, W] optional validity
) -> jax.Array:
    h, w = render_cov_quat.shape[1:]
    q = render_cov_quat.reshape(4, -1).T          # [P, 4]
    s = render_cov_scale.reshape(3, -1).T         # [P, 3]
    n = normal_pred.reshape(3, -1).T              # [P, 3]

    R = geometry.quat_to_rotmat(q)                # [P, 3, 3]
    # |n . R| per column: how aligned each covariance axis is with the normal.
    nR = jnp.einsum("pi,pij->pj", n, R)           # [P, 3]
    term_rot = jnp.mean(jnp.abs(nR), axis=1)      # [P]

    Rs = jax.lax.stop_gradient(R) * s[:, None, :]  # rotation detached
    nRs = jnp.einsum("pi,pij->pj", n, Rs)
    term_scale = jnp.mean(jnp.abs(nRs), axis=1)

    per_pixel = 0.8 * term_rot + 0.2 * term_scale
    if mask is not None:
        m = mask.reshape(-1).astype(per_pixel.dtype)
        return jnp.sum(per_pixel * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(per_pixel)
