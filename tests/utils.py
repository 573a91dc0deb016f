"""Shared test helpers: synthetic cameras and scenes."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from vegs_tpu import geometry
from vegs_tpu.ops.projection import CameraParams


def make_camera(height=64, width=128, fovx=1.0, fovy=0.8,
                R=None, t=None, znear=0.01, zfar=100.0) -> CameraParams:
    """Camera at origin looking down +z (world == view) unless R/t given.

    Matrices are stored transposed (row-vector convention), matching the
    reference's scene/cameras.py:76-87.
    """
    R = np.eye(3) if R is None else np.asarray(R)
    t = np.zeros(3) if t is None else np.asarray(t)
    world_view = geometry.world_to_view(R, t)  # [4,4] acting on column vectors
    proj = geometry.projection_matrix(znear, zfar, fovx, fovy)
    full = proj @ world_view
    cam_center = np.linalg.inv(world_view)[:3, 3]
    return CameraParams(
        viewmatrix=jnp.asarray(world_view.T, jnp.float32),
        projmatrix=jnp.asarray(full.T, jnp.float32),
        campos=jnp.asarray(cam_center, jnp.float32),
        tan_fovx=jnp.float32(np.tan(fovx * 0.5)),
        tan_fovy=jnp.float32(np.tan(fovy * 0.5)),
        height=height,
        width=width,
    )


def random_gaussians(rng, n, depth_range=(1.0, 8.0), xy_extent=2.5,
                     scale_range=(0.02, 0.25), opacity_range=(0.2, 0.95)):
    """Random Gaussian cloud in front of the default camera."""
    means = np.stack(
        [
            rng.uniform(-xy_extent, xy_extent, n),
            rng.uniform(-xy_extent * 0.6, xy_extent * 0.6, n),
            rng.uniform(*depth_range, n),
        ],
        axis=1,
    ).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    scales = rng.uniform(*scale_range, (n, 3)).astype(np.float32)
    opac = rng.uniform(*opacity_range, n).astype(np.float32)
    shs = np.zeros((n, 16, 3), np.float32)
    shs[:, 0] = rng.uniform(-1.0, 1.5, (n, 3))  # DC
    shs[:, 1:] = rng.normal(0, 0.12, (n, 15, 3))
    return (
        jnp.asarray(means),
        jnp.asarray(quats),
        jnp.asarray(scales),
        jnp.asarray(opac),
        jnp.asarray(shs),
    )
