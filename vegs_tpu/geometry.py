"""Quaternion / rigid-transform / projection math, pure JAX.

Capability parity with the reference's graphics math suite
(/root/reference/utils/graphics_utils.py:78-368 and utils/general_utils.py:97-129),
re-implemented from the underlying mathematics for batched, jit-friendly use.

Conventions (same as the reference):
  * Quaternions are (w, x, y, z), normalized, with w >= 0 after standardization.
  * World-to-view matrices follow the COLMAP/3DGS convention: rows of R are camera
    axes; `world_view_transform` is stored TRANSPOSED (column-major layout
    compatibility, see reference scene/cameras.py:76).
  * Projection matrices support principal-point offsets (reference
    graphics_utils.py:305-337).
All functions are shape-polymorphic over leading batch dims where meaningful.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Quaternion algebra
# ---------------------------------------------------------------------------


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Normalize quaternion(s) [..., 4] to unit norm.

    Gradient-safe at q == 0 (the max() picks the eps branch before the sqrt,
    so autodiff never sees d(sqrt)/d(0) — zero-padded slots in fixed-capacity
    fields would otherwise poison the whole quaternion gradient with NaNs).
    """
    sq = jnp.sum(q * q, axis=-1, keepdims=True)
    return q / jnp.sqrt(jnp.maximum(sq, eps * eps))


def quat_standardize(q: jax.Array) -> jax.Array:
    """Make the real part non-negative (q and -q encode the same rotation)."""
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product of quaternions [..., 4] x [..., 4] -> [..., 4]."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conjugate(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Unit quaternion(s) [..., 4] (w,x,y,z) -> rotation matrix [..., 3, 3].

    Matches the reference's `build_rotation` (general_utils.py:97-118) which
    normalizes first.
    """
    q = quat_normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    rows = [
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def rotmat_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix [..., 3, 3] -> unit quaternion [..., 4] (w,x,y,z).

    Branchless Shepperd-style selection of the numerically best of the four
    candidate quaternions (same math as the reference's pytorch3d-derived
    `matrix_to_quaternion`, graphics_utils.py:140-201).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Squared magnitudes (times 4) of each component from the trace identities.
    q_abs2 = jnp.stack(
        [
            1.0 + m00 + m11 + m22,
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
        ],
        axis=-1,
    )
    # eps floor keeps sqrt's gradient finite at q_abs2 == 0 (hit exactly by
    # identity rotations: three candidates are 0, and although argmax never
    # SELECTS them, their 0-cotangent times sqrt'(0)=inf still yields NaN).
    q_abs = jnp.sqrt(jnp.maximum(q_abs2, 1e-12))

    # Candidate quaternions, each valid when its pivot component dominates.
    cand_w = jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], -1)
    cand_x = jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], -1)
    cand_y = jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], -1)
    cand_z = jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], -1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # [..., 4, 4]
    denom = 2.0 * jnp.maximum(q_abs[..., None], 0.1)
    cands = cands / denom

    best = jnp.argmax(q_abs2, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)
    q = q[..., 0, :]
    return quat_standardize(quat_normalize(q))


def quat_slerp(q0: jax.Array, q1: jax.Array, t) -> jax.Array:
    """Spherical linear interpolation between unit quaternions."""
    q0 = quat_normalize(q0)
    q1 = quat_normalize(q1)
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    # Fall back to lerp when the angle is tiny.
    small = sin_theta < 1e-6
    w0 = jnp.where(small, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(small, 1.0, sin_theta))
    w1 = jnp.where(small, t, jnp.sin(t * theta) / jnp.where(small, 1.0, sin_theta))
    return quat_normalize(w0 * q0 + w1 * q1)


# ---------------------------------------------------------------------------
# Scaling-rotation covariance factors
# ---------------------------------------------------------------------------


def build_scaling_rotation(scales: jax.Array, quats: jax.Array) -> jax.Array:
    """L = R(q) @ diag(s): [..., 3] x [..., 4] -> [..., 3, 3].

    (Reference: general_utils.py:120-129.)
    """
    R = quat_to_rotmat(quats)
    return R * scales[..., None, :]


def covariance_from_scaling_rotation(
    scales: jax.Array, quats: jax.Array, scale_modifier: float = 1.0
) -> jax.Array:
    """Full 3D covariance Sigma = L L^T, [..., 3, 3]."""
    L = build_scaling_rotation(scales * scale_modifier, quats)
    return L @ jnp.swapaxes(L, -1, -2)


def cov6_from_scaling_rotation(
    scales: jax.Array, quats: jax.Array, scale_modifier: float = 1.0
) -> jax.Array:
    """Packed covariance (xx, xy, xz, yy, yz, zz) = strip(L L^T) computed in
    pure scalar/elementwise form: Sigma_ij = sum_k s_k^2 R_ik R_jk.

    Equivalent to strip_symmetric(covariance_from_scaling_rotation(...)) but
    with NO [..., 3, 3] intermediates: batched tiny (3x3) dot_generals lower
    terribly on TPU (measured ~58 ms of backward time at N=500k vs ~2 ms for
    this form — the MXU pads each 3x3 operand to full tiles)."""
    q = quat_normalize(quats)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    s = scales * scale_modifier
    s0, s1, s2 = s[..., 0] ** 2, s[..., 1] ** 2, s[..., 2] ** 2
    xx = s0 * r00 * r00 + s1 * r01 * r01 + s2 * r02 * r02
    xy = s0 * r00 * r10 + s1 * r01 * r11 + s2 * r02 * r12
    xz = s0 * r00 * r20 + s1 * r01 * r21 + s2 * r02 * r22
    yy = s0 * r10 * r10 + s1 * r11 * r11 + s2 * r12 * r12
    yz = s0 * r10 * r20 + s1 * r11 * r21 + s2 * r12 * r22
    zz = s0 * r20 * r20 + s1 * r21 * r21 + s2 * r22 * r22
    return jnp.stack([xx, xy, xz, yy, yz, zz], axis=-1)


def strip_symmetric(cov: jax.Array) -> jax.Array:
    """[..., 3, 3] symmetric -> 6 unique values (xx, xy, xz, yy, yz, zz).

    Same packing order the reference feeds its rasterizer
    (gaussian_model.py:31-46 via strip_lowerdiag).
    """
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        axis=-1,
    )


def unstrip_symmetric(six: jax.Array) -> jax.Array:
    """Inverse of strip_symmetric."""
    xx, xy, xz, yy, yz, zz = jnp.moveaxis(six, -1, 0)
    row0 = jnp.stack([xx, xy, xz], -1)
    row1 = jnp.stack([xy, yy, yz], -1)
    row2 = jnp.stack([xz, yz, zz], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def decompose_T_to_RS(T: jax.Array):
    """4x4 (or [...,4,4]) rigid+scale transform -> (R[...,3,3], S[...,3], t[...,3]).

    Column-norm decomposition, as the reference does for box transforms
    (graphics_utils.py:49-53).
    """
    A = T[..., :3, :3]
    S = jnp.linalg.norm(A, axis=-2)  # per-column scale
    R = A / jnp.maximum(S[..., None, :], 1e-12)
    t = T[..., :3, 3]
    return R, S, t


def compose_T(R: jax.Array, S: jax.Array, t: jax.Array) -> jax.Array:
    """(R, S, t) -> 4x4 transform with A = R @ diag(S)."""
    A = R * S[..., None, :]
    top = jnp.concatenate([A, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


# ---------------------------------------------------------------------------
# Camera matrices
# ---------------------------------------------------------------------------


def world_to_view(R: np.ndarray, t: np.ndarray, translate=None, scale: float = 1.0) -> np.ndarray:
    """World->camera 4x4. `R` is the cam-to-world rotation stored transposed
    (3DGS convention, reference graphics_utils.py:266-277); `t` is the COLMAP
    translation. Optional recentring (translate/scale) matches getWorld2View2."""
    Rt = np.zeros((4, 4), dtype=np.float32)
    Rt[:3, :3] = np.asarray(R).T
    Rt[:3, 3] = np.asarray(t)
    Rt[3, 3] = 1.0
    if translate is not None or scale != 1.0:
        translate = np.zeros(3) if translate is None else np.asarray(translate)
        C2W = np.linalg.inv(Rt)
        cam_center = (C2W[:3, 3] + translate) * scale
        C2W[:3, 3] = cam_center
        Rt = np.linalg.inv(C2W)
    return Rt.astype(np.float32)


def projection_matrix(
    znear: float,
    zfar: float,
    fovx: float,
    fovy: float,
    cx_offset: float = 0.0,
    cy_offset: float = 0.0,
) -> np.ndarray:
    """OpenGL-style perspective projection used by 3DGS, with optional
    normalized principal-point offsets in [-1, 1] NDC units
    (reference graphics_utils.py:279-337).

    cx_offset/cy_offset shift the frustum so that a camera with intrinsics
    K = [[fx,0,cx],[0,fy,cy]] projects correctly: pass
    cx_offset = 2*cx/W - 1, cy_offset = 2*cy/H - 1.
    """
    tanx = math_tan(fovx * 0.5)
    tany = math_tan(fovy * 0.5)
    top = tany * znear
    bottom = -top
    right = tanx * znear
    left = -right
    # Shift frustum for principal point.
    right += cx_offset * tanx * znear
    left += cx_offset * tanx * znear
    top += cy_offset * tany * znear
    bottom += cy_offset * tany * znear

    P = np.zeros((4, 4), dtype=np.float32)
    z_sign = 1.0
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = z_sign
    P[2, 2] = z_sign * zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def math_tan(x: float) -> float:
    return float(np.tan(x))


def projection_matrix_from_K(
    znear: float, zfar: float, fovx: float, fovy: float,
    fx: float, fy: float, cx: float, cy: float, w: float, h: float,
) -> np.ndarray:
    """Principal-point-aware projection, exact port of the reference's
    getProjectionMatrixwithPrincipalPointOffset semantics
    (graphics_utils.py:305-337), including its (zfar+znear)/(zfar-znear)
    depth row (which differs from the plain variant)."""
    tany = np.tan(fovy * 0.5)
    tanx = np.tan(fovx * 0.5)
    top_c = tany * znear
    right_c = tanx * znear
    dx = (cx - w / 2) / fx * znear
    dy = (cy - h / 2) / fy * znear
    top, bottom = top_c + dy, -top_c + dy
    left, right = -right_c + dx, right_c + dx
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = 1.0
    P[2, 2] = (zfar + znear) / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def fov_to_focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * np.tan(fov * 0.5))


def focal_to_fov(focal: float, pixels: float) -> float:
    return 2.0 * np.arctan(pixels / (2.0 * focal))


# ---------------------------------------------------------------------------
# Normal-map helpers (for the covariance-surface alignment prior)
# ---------------------------------------------------------------------------


def normal_to_rot(normals: jax.Array) -> jax.Array:
    """Build rotation matrices whose FIRST column is the given unit normal,
    with the remaining columns an arbitrary orthonormal completion
    (reference graphics_utils.py:346-360).

    normals: [..., 3] -> [..., 3, 3]
    """
    n = normals / jnp.maximum(jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12)
    # Pick a helper axis least aligned with n.
    ref = jnp.where(
        jnp.abs(n[..., :1]) < 0.9,
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], n.dtype), n.shape),
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], n.dtype), n.shape),
    )
    b = jnp.cross(n, ref)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-12)
    c = jnp.cross(n, b)
    return jnp.stack([n, b, c], axis=-1)  # columns


def cam_normal_to_world_normal(normals_cam: jax.Array, R_c2w: jax.Array) -> jax.Array:
    """Rotate camera-space normals into world space.

    normals_cam: [..., 3]; R_c2w: [3, 3] camera-to-world rotation.
    (Reference graphics_utils.py:362-368.)
    """
    return normals_cam @ R_c2w.T
