"""Covariance-surface alignment initialization from monocular normals.

Capability parity with /root/reference/utils/norminit_utils.py:127-224
(`initialize_gaussians_with_window_normals`): for every training camera,
per-pixel surface normals become per-pixel rotation quaternions (first column
= normal); visible Gaussians sample the quaternion under their projected
center; each Gaussian aggregates candidates across cameras and takes the most
consistent one; finally rotation is set from it and the scale is flattened to
(1e-5, 1e-1, 1e-1) along the normal (the flatten prior, lines 212-219).

TPU-first redesign: the reference keeps a 100-slot candidate ring buffer per
Gaussian with a similarity sort (lines 91-125); here aggregation is a running
4x4 quaternion outer-product accumulator M += q q^T — sign-invariant by
construction — and the "most consistent" quaternion is M's principal
eigenvector (the standard chordal-L2 quaternion mean). Accumulation is one
fused jitted pass per camera; the tiny batched 4x4 eigendecomposition runs
once on host at finalize time.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import geometry
from ..gaussians import GaussianField
from ..ops.projection import CameraParams, mark_visible


class NormalAccumulator(NamedTuple):
    M: jax.Array      # [N, 4, 4] quaternion outer-product sums
    count: jax.Array  # [N]

    @staticmethod
    def zeros(n: int) -> "NormalAccumulator":
        return NormalAccumulator(
            M=jnp.zeros((n, 4, 4), jnp.float32),
            count=jnp.zeros((n,), jnp.float32),
        )


def normal_map_to_quats(normal_world: jax.Array) -> jax.Array:
    """[3, H, W] world normals -> [H, W, 4] rotation quaternions whose first
    column is the normal (reference norminit_utils.py:160-176)."""
    h, w = normal_world.shape[1:]
    n = normal_world.reshape(3, -1).T
    R = geometry.normal_to_rot(n)
    q = geometry.rotmat_to_quat(R)
    return q.reshape(h, w, 4)


@jax.jit
def accumulate_camera_normals(
    acc: NormalAccumulator,
    field: GaussianField,
    cam: CameraParams,
    normal_world: jax.Array,   # [3, H, W]
) -> NormalAccumulator:
    """One camera's pass: frustum-test, project centers, sample the per-pixel
    quaternion map (bilinear), accumulate outer products."""
    means = field.means
    n = means.shape[0]
    vis = mark_visible(means, cam.viewmatrix, cam.projmatrix) & field.valid

    homog = jnp.concatenate([means, jnp.ones((n, 1), means.dtype)], axis=1)
    p_hom = homog @ cam.projmatrix
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    ndc = p_hom[:, :2] * p_w[:, None]
    px = ((ndc[:, 0] + 1.0) * cam.width - 1.0) * 0.5
    py = ((ndc[:, 1] + 1.0) * cam.height - 1.0) * 0.5

    inb = (px >= 0) & (px <= cam.width - 1) & (py >= 0) & (py <= cam.height - 1)
    mask = (vis & inb).astype(jnp.float32)

    qmap = normal_map_to_quats(normal_world)  # [H, W, 4]

    # Bilinear sample (grid_sample parity, norminit_utils.py:181-193).
    x0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, cam.width - 1)
    y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, cam.height - 1)
    x1 = jnp.minimum(x0 + 1, cam.width - 1)
    y1 = jnp.minimum(y0 + 1, cam.height - 1)
    fx = jnp.clip(px - x0, 0.0, 1.0)[:, None]
    fy = jnp.clip(py - y0, 0.0, 1.0)[:, None]
    q = (
        qmap[y0, x0] * (1 - fx) * (1 - fy)
        + qmap[y0, x1] * fx * (1 - fy)
        + qmap[y1, x0] * (1 - fx) * fy
        + qmap[y1, x1] * fx * fy
    )
    q = geometry.quat_normalize(q)

    outer = q[:, :, None] * q[:, None, :]  # sign-invariant
    return NormalAccumulator(
        M=acc.M + outer * mask[:, None, None],
        count=acc.count + mask,
    )


def finalize_normal_init(
    field: GaussianField,
    acc: NormalAccumulator,
    flat_scales=(1e-5, 1e-1, 1e-1),
) -> GaussianField:
    """Set rotations to the chordal mean quaternion and flatten scales for
    every Gaussian that saw at least one normal sample."""
    M = np.asarray(acc.M)
    count = np.asarray(acc.count)
    has = count > 0
    # Principal eigenvector of each 4x4 (symmetric PSD) accumulator.
    w, v = np.linalg.eigh(M[has])
    best = v[..., -1]  # eigenvector of the largest eigenvalue
    best = np.where(best[:, :1] < 0, -best, best)

    quats = np.array(field.quats)
    quats[has] = best
    log_scales = np.array(field.log_scales)
    log_scales[has] = np.log(np.asarray(flat_scales, np.float32))[None, :]
    return field.replace(
        quats=jnp.asarray(quats), log_scales=jnp.asarray(log_scales))


def initialize_gaussians_with_window_normals(
    field: GaussianField,
    cameras,
    flat_scales=(1e-5, 1e-1, 1e-1),
) -> GaussianField:
    """Full pipeline over a camera list (reference norminit_utils.py:127-224).

    Each camera must provide `device_params()` and `world_normal()` (None is
    skipped)."""
    acc = NormalAccumulator.zeros(field.capacity)
    for cam in cameras:
        nw = cam.world_normal()
        if nw is None:
            continue
        acc = accumulate_camera_normals(
            acc, field, cam.device_params(), jnp.asarray(nw))
    return finalize_normal_init(field, acc, flat_scales)
