"""Gaussian preprocessing: cull → project → EWA conic → SH color.

This is the TPU-native equivalent of the CUDA rasterizer's `preprocess` kernel
(SURVEY.md §2.3 item 1, [inferred] internal pipeline). It is pure vectorized
JAX — one fused VPU pass over all N Gaussians under jit — and fully
differentiable, so the backward comes from autodiff (no custom kernel needed;
the hot custom kernels are binning/blending).

Semantics spec (our single source of truth, chosen to match the standard 3DGS
EWA formulation the reference kernel implements):
  * view-space position p = W_view @ [x,1]; cull when p.z <= znear (0.2).
  * 2D mean in PIXEL coordinates: ndc2pix(v, S) = ((v + 1) * S - 1) / 2.
  * 2D covariance: J = perspective Jacobian at the frustum-clamped view point
    (clamp x/z, y/z to 1.3*tan_fov); cov2d = T Σ Tᵀ with T = J @ R_view, plus
    a 0.3 px low-pass on the diagonal.
  * conic = cov2d⁻¹ (2x2, packed [a, b, c]); radius = ceil(3σ_max).
  * color = SH(view_dir) clamped to >= 0.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from .. import sh as sh_lib

ZNEAR = 0.2
LOWPASS = 0.3


@struct.dataclass
class CameraParams:
    """Device-side camera parameters. Image dims are static (pytree aux data)
    so jitted renderers specialize per resolution; matrices are traced leaves.

    NOTE on conventions: following the reference (scene/cameras.py:76-87),
    `viewmatrix`/`projmatrix` are stored TRANSPOSED, so points transform as
    row-vectors: p_view = [x, 1] @ viewmatrix.
    """

    viewmatrix: jax.Array   # [4, 4] world->view (transposed storage)
    projmatrix: jax.Array   # [4, 4] full (view @ proj) transposed, for NDC
    campos: jax.Array       # [3]
    tan_fovx: jax.Array     # scalar
    tan_fovy: jax.Array     # scalar
    height: int = struct.field(pytree_node=False, default=0)
    width: int = struct.field(pytree_node=False, default=0)


class Projected(NamedTuple):
    """Per-Gaussian screen-space quantities feeding binning + blending."""

    means2d: jax.Array   # [N, 2] pixel coords
    depths: jax.Array    # [N] view-space z
    conics: jax.Array    # [N, 3] inverse 2D covariance (a, b, c)
    radii: jax.Array     # [N] int32 screen radius in px (0 = culled)
    rgb: jax.Array       # [N, 3]
    opacities: jax.Array  # [N]
    visible: jax.Array   # [N] bool (in-frustum & valid)
    radii_xy: jax.Array  # [N, 2] int32 per-axis AABB half-extents (binning)


def project(
    means3d: jax.Array,
    cov6: jax.Array,
    opacities: jax.Array,
    shs: jax.Array,
    cam: CameraParams,
    sh_degree: int = 3,
    valid: jax.Array | None = None,
    means2d_offset: jax.Array | None = None,
    clamp_radius: int = 0,
) -> Projected:
    """Project N Gaussians to screen space.

    means3d:   [N, 3]
    cov6:      [N, 6] packed world covariance (xx, xy, xz, yy, yz, zz)
    opacities: [N] or [N, 1]
    shs:       [N, K, 3] SH coefficients (K >= (sh_degree+1)^2)
    means2d_offset: optional [N, 2] zeros — the differentiable tap whose
        cotangent is the screen-space positional gradient used for densify
        stats (replaces the reference's retain_grad screenspace_points trick,
        gaussian_renderer/__init__.py:27-32).
    clamp_radius: if > 0, clamp the tile footprint radius (bounds the worst
        case duplication in binning; 0 = unbounded).
    """
    n = means3d.shape[0]
    opacities = opacities.reshape(n)
    # Row-vector transforms p @ M expanded to scalar FMAs: an [N,4]x[4,4]
    # dot_general wastes 124/128 MXU lanes and (worse) its backward is
    # another padded matmul; elementwise keeps everything on the VPU and
    # lets XLA fuse the whole projection into one pass.
    X, Y, Z = means3d[:, 0], means3d[:, 1], means3d[:, 2]

    def xform(M):
        return [X * M[0, j] + Y * M[1, j] + Z * M[2, j] + M[3, j]
                for j in range(4)]

    pv = xform(cam.viewmatrix)   # view-space (row-vector convention)
    depths = pv[2]

    ph = xform(cam.projmatrix)
    p_w = 1.0 / (ph[3] + 1e-7)

    W, H = cam.width, cam.height
    mx = ((ph[0] * p_w + 1.0) * W - 1.0) * 0.5
    my = ((ph[1] * p_w + 1.0) * H - 1.0) * 0.5
    means2d = jnp.stack([mx, my], axis=1)
    if means2d_offset is not None:
        means2d = means2d + means2d_offset

    # --- EWA: world cov -> 2D screen cov ---------------------------------
    # Fully scalar-expanded (no [N,2,3]/[N,3,3] intermediates, no batched
    # dot_generals — those cost ~58 ms of backward at N=500k on TPU).
    limx = 1.3 * cam.tan_fovx
    limy = 1.3 * cam.tan_fovy
    tz = jnp.where(jnp.abs(depths) < 1e-6, 1e-6, depths)
    txtz = jnp.clip(pv[0] / tz, -limx, limx)
    tytz = jnp.clip(pv[1] / tz, -limy, limy)
    tx, ty = txtz * tz, tytz * tz

    focal_x = W / (2.0 * cam.tan_fovx)
    focal_y = H / (2.0 * cam.tan_fovy)

    # J rows (only first two needed): d(pix)/d(view)
    j00 = focal_x / tz
    j02 = -(focal_x * tx) / (tz * tz)
    j11 = focal_y / tz
    j12 = -(focal_y * ty) / (tz * tz)

    # Rotation part of world->view: with the transposed storage convention,
    # p_view[:3] = p @ V[:3,:3], so the column-vector matrix is W_r = Vr^T,
    # i.e. W_r[k, c] = Vr[c, k].  T = J @ W_r has rows
    #   t0[c] = j00 * Vr[c, 0] + j02 * Vr[c, 2]
    #   t1[c] = j11 * Vr[c, 1] + j12 * Vr[c, 2]
    Vr = cam.viewmatrix[:3, :3]  # [3(world), 3(view)]
    t0 = [j00 * Vr[c, 0] + j02 * Vr[c, 2] for c in range(3)]
    t1 = [j11 * Vr[c, 1] + j12 * Vr[c, 2] for c in range(3)]

    # cov2d = T Sigma T^T from the packed cov6 (xx, xy, xz, yy, yz, zz):
    # first u_r = Sigma @ t_r, then cov2d_rs = t_r . u_s.
    sxx, sxy, sxz = cov6[:, 0], cov6[:, 1], cov6[:, 2]
    syy, syz, szz = cov6[:, 3], cov6[:, 4], cov6[:, 5]

    def sigma_dot(t):
        return (sxx * t[0] + sxy * t[1] + sxz * t[2],
                sxy * t[0] + syy * t[1] + syz * t[2],
                sxz * t[0] + syz * t[1] + szz * t[2])

    u0 = sigma_dot(t0)
    u1 = sigma_dot(t1)
    cxx = t0[0] * u0[0] + t0[1] * u0[1] + t0[2] * u0[2] + LOWPASS
    cxy = t0[0] * u1[0] + t0[1] * u1[1] + t0[2] * u1[2]
    cyy = t1[0] * u1[0] + t1[1] * u1[1] + t1[2] * u1[2] + LOWPASS

    det = cxx * cyy - cxy * cxy
    det_safe = jnp.where(det <= 0, 1.0, det)
    inv_det = 1.0 / det_safe
    conics = jnp.stack([cyy * inv_det, -cxy * inv_det, cxx * inv_det], axis=1)

    # Screen radius: 3 sigma of the max eigenvalue, tightened by the
    # opacity-aware bound sigma*sqrt(2*ln(255*op)) — alpha drops below the
    # blend's 1/255 cutoff beyond it, so shrinking the footprint is LOSSLESS
    # w.r.t. the compositing spec while cutting tile-instance duplication
    # (the CUDA reference uses plain 3*sigma).
    mid = 0.5 * (cxx + cyy)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    sigma_max = jnp.sqrt(lam1)
    op_bound = jnp.sqrt(2.0 * jnp.log(jnp.maximum(255.0 * opacities, 1.0 + 1e-6)))
    bound = jnp.minimum(3.0, op_bound)
    radius_f = jnp.ceil(bound * sigma_max)
    # Per-axis AABB of the bound-sigma ellipse for BINNING: max |x| over the
    # ellipse is bound*sqrt(cxx) (resp. cyy), always <= the bounding square
    # of radius bound*sigma_max — strictly fewer tile instances for
    # anisotropic splats, at a truncation error bounded by the same
    # alpha < 1/255 cutoff the radius already applies. `radii` (the square)
    # stays the reference-visible contract (visibility_filter, densify
    # max_radii2D parity with the CUDA kernel's ceil(3 sigma)).
    rx_f = jnp.ceil(bound * jnp.sqrt(cxx))
    ry_f = jnp.ceil(bound * jnp.sqrt(cyy))
    if clamp_radius > 0:
        radius_f = jnp.minimum(radius_f, float(clamp_radius))
        rx_f = jnp.minimum(rx_f, float(clamp_radius))
        ry_f = jnp.minimum(ry_f, float(clamp_radius))

    # --- visibility -------------------------------------------------------
    in_front = depths > ZNEAR
    det_ok = det > 0
    # Generous on-screen test (the blend handles exact tile clipping).
    on_screen = (
        (mx + radius_f >= 0)
        & (mx - radius_f < W)
        & (my + radius_f >= 0)
        & (my - radius_f < H)
    )
    visible = in_front & det_ok & on_screen
    if valid is not None:
        visible = visible & valid
    radii = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)
    radii_xy = jnp.stack(
        [jnp.where(visible, rx_f, 0.0), jnp.where(visible, ry_f, 0.0)],
        axis=1).astype(jnp.int32)

    # --- SH -> RGB --------------------------------------------------------
    dirs = means3d - cam.campos[None, :]
    dir_sq = jnp.sum(dirs * dirs, axis=1, keepdims=True)
    dirs = dirs / jnp.sqrt(jnp.maximum(dir_sq, 1e-24))  # grad-safe at 0
    k = sh_lib.num_sh_coeffs(sh_degree)
    rgb = sh_lib.eval_sh(sh_degree, jnp.swapaxes(shs[:, :k, :], 1, 2), dirs) + 0.5
    rgb = jnp.maximum(rgb, 0.0)

    return Projected(
        means2d=means2d,
        depths=depths,
        conics=conics,
        radii=radii,
        rgb=rgb,
        opacities=opacities,
        visible=visible,
        radii_xy=radii_xy,
    )


def mark_visible(means3d: jax.Array, viewmatrix: jax.Array, projmatrix: jax.Array) -> jax.Array:
    """Frustum visibility test (parity with rasterizer.markVisible,
    reference utils/norminit_utils.py:55,179). Returns bool [N]."""
    n = means3d.shape[0]
    homog = jnp.concatenate([means3d, jnp.ones((n, 1), means3d.dtype)], axis=1)
    p_view = homog @ viewmatrix
    return p_view[:, 2] > ZNEAR
