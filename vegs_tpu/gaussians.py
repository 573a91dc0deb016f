"""Gaussian field state: a pure-functional pytree replacing the reference's
mutable `GaussianModel` (/root/reference/scene/gaussian_model.py:27-413).

TPU-first design notes
----------------------
* XLA compiles static shapes, so the field lives in **fixed-capacity** arrays
  of length `capacity >= num_active`, with a validity mask. Densify/prune is a
  *recompaction* producing fresh arrays (see vegs_tpu.densify) instead of the
  reference's per-100-iteration optimizer-state "surgery"
  (gaussian_model.py:263-332). Capacity grows by bucketed doubling so jit
  caches stay warm.
* Parameters are stored raw (pre-activation): exp for scales, sigmoid for
  opacity, L2-normalize for quaternions — same activation set as the
  reference (gaussian_model.py:31-46).
* SH features are stored [C, K, 3] (K = (deg+1)^2 coeffs, channel-minor) with
  dc/rest split so per-group learning rates apply (feature_lr vs /20).
* The SH warm-up (reference train.py:120-123 raises active degree every 1000
  iters) is a *band mask* multiplied onto the coefficients, so the jitted
  render never retraces on degree changes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import geometry, sh as sh_lib


@struct.dataclass
class GaussianField:
    """Fixed-capacity Gaussian cloud parameters (all raw/pre-activation)."""

    means: jax.Array          # [C, 3] world-space centers
    quats: jax.Array          # [C, 4] (w,x,y,z), unnormalized
    log_scales: jax.Array     # [C, 3]
    sh_dc: jax.Array          # [C, 1, 3]
    sh_rest: jax.Array        # [C, 15, 3]
    opacity_logit: jax.Array  # [C, 1]
    valid: jax.Array          # [C] bool — slot holds a live Gaussian

    # -- derived quantities (activations) ---------------------------------
    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    def num_active(self) -> jax.Array:
        return jnp.sum(self.valid.astype(jnp.int32))

    def scales(self) -> jax.Array:
        return jnp.exp(self.log_scales)

    def opacities(self) -> jax.Array:
        # Dead slots get exactly 0 opacity so they never contribute.
        op = jax.nn.sigmoid(self.opacity_logit)
        return jnp.where(self.valid[:, None], op, 0.0)

    def rotations(self) -> jax.Array:
        return geometry.quat_normalize(self.quats)

    def features(self) -> jax.Array:
        """[C, 16, 3] concatenated SH coefficients."""
        return jnp.concatenate([self.sh_dc, self.sh_rest], axis=1)

    def covariance(self, scale_modifier: float = 1.0) -> jax.Array:
        return geometry.covariance_from_scaling_rotation(
            self.scales(), self.rotations(), scale_modifier
        )

    def covariance6(self, scale_modifier: float = 1.0) -> jax.Array:
        return geometry.strip_symmetric(self.covariance(scale_modifier))


@struct.dataclass
class DensifyStats:
    """Running densification statistics (reference gaussian_model.py:52-60,411-413)."""

    max_radii2d: jax.Array        # [C] float — max observed screen radius (px)
    xyz_gradient_accum: jax.Array  # [C] float — sum of ||grad means2D||
    denom: jax.Array              # [C] float — number of accumulations

    @staticmethod
    def zeros(capacity: int) -> "DensifyStats":
        z = jnp.zeros((capacity,), jnp.float32)
        return DensifyStats(max_radii2d=z, xyz_gradient_accum=z, denom=z)


def sh_band_mask(active_degree: jax.Array | int, dtype=jnp.float32) -> jax.Array:
    """[16] mask: 1 for coefficients within the active SH degree else 0."""
    degrees = np.repeat(np.arange(4), np.arange(4) * 2 + 1)  # 0,1,1,1,2,...,3 (x7)
    return (jnp.asarray(degrees) <= active_degree).astype(dtype)


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def round_capacity(n: int, multiple: int = 4096) -> int:
    """Bucket capacities so jit caches are reused across scenes/steps."""
    return max(multiple, -(-n // multiple) * multiple)


def knn_mean_sq_dist(points: np.ndarray, k: int = 3) -> np.ndarray:
    """Mean squared distance from each point to its k nearest neighbors.

    Host-side (init-time only) replacement for the reference's CUDA
    `simple_knn._C.distCUDA2` (SURVEY §2.3 item 2). Uses a KD-tree.
    """
    from scipy.spatial import cKDTree

    pts = np.asarray(points, np.float64)
    if len(pts) <= k:
        return np.full((len(pts),), 1e-4, np.float32)
    tree = cKDTree(pts)
    dists, _ = tree.query(pts, k=k + 1, workers=-1)  # includes self at index 0
    return np.mean(dists[:, 1:] ** 2, axis=1).astype(np.float32)


def create_from_points(
    points: np.ndarray,
    colors: Optional[np.ndarray] = None,
    capacity: Optional[int] = None,
    init_opacity: float = 0.1,
    scale_clip: tuple[float, float] = (1e-7, 0.2),
    dtype=jnp.float32,
) -> GaussianField:
    """Seed a Gaussian field from a point cloud.

    Mirrors the reference's `create_from_pcd` (gaussian_model.py:130-152):
    isotropic scale = sqrt(mean sq dist to 3 NN) clamped to `scale_clip`
    (the box-model variant clamps to [1e-7, 1e-4], gaussian_model.py:517),
    identity rotation, opacity logit at `init_opacity`.
    """
    points = np.asarray(points, np.float32)
    n = points.shape[0]
    cap = capacity if capacity is not None else round_capacity(n)
    assert cap >= n, f"capacity {cap} < point count {n}"

    if colors is None:
        colors = np.full((n, 3), 0.5, np.float32)
    dc = np.asarray(sh_lib.rgb_to_sh(np.asarray(colors, np.float32)))

    # Clamp the SQUARED distance to scale_clip, then sqrt — matching the
    # reference's clamp(dist2, lo, hi) order (gaussian_model.py:140,517).
    # Clamping sqrt(d2) instead would pin every box Gaussian to one scale
    # (sqrt(1e-7) > the 1e-4 box max).
    d2 = np.clip(knn_mean_sq_dist(points), scale_clip[0], scale_clip[1])
    log_s = np.log(np.sqrt(d2))[:, None].repeat(3, 1)

    def pad(x, fill=0.0):
        out = np.full((cap,) + x.shape[1:], fill, x.dtype)
        out[:n] = x
        return jnp.asarray(out, dtype)

    quats = np.zeros((n, 4), np.float32)
    quats[:, 0] = 1.0
    valid = np.zeros((cap,), bool)
    valid[:n] = True

    return GaussianField(
        means=pad(points),
        quats=pad(quats),
        log_scales=pad(log_s.astype(np.float32), fill=np.float32(np.log(1e-7))),
        sh_dc=pad(dc[:, None, :].astype(np.float32)),
        sh_rest=jnp.zeros((cap, 15, 3), dtype),
        opacity_logit=pad(
            np.full((n, 1), float(inverse_sigmoid(init_opacity)), np.float32)
        ),
        valid=jnp.asarray(valid),
    )


def create_random(key: jax.Array, n: int, extent: float = 1.0, capacity=None) -> GaussianField:
    """Random field for tests."""
    kp, kc = jax.random.split(key)
    pts = np.asarray(jax.random.uniform(kp, (n, 3), minval=-extent, maxval=extent))
    cols = np.asarray(jax.random.uniform(kc, (n, 3)))
    return create_from_points(pts, cols, capacity=capacity)


# ---------------------------------------------------------------------------
# PLY interop (weights-only snapshots, reference gaussian_model.py:182-261)
# ---------------------------------------------------------------------------

PLY_ATTR_ORDER_NOTE = (
    "x,y,z,nx,ny,nz,f_dc_0..2,f_rest_0..44,opacity,scale_0..2,rot_0..3"
)


def to_ply_arrays(field: GaussianField) -> dict[str, np.ndarray]:
    """Extract active Gaussians as the reference's PLY attribute layout.

    f_rest is flattened channel-major (reference transposes (N,15,3)->(N,3,15)
    before flatten, gaussian_model.py:196-213).
    """
    valid = np.asarray(field.valid)
    idx = np.nonzero(valid)[0]
    take = lambda x: np.asarray(x)[idx]
    out = {
        "xyz": take(field.means),
        "normals": np.zeros((len(idx), 3), np.float32),
        "f_dc": take(field.sh_dc).transpose(0, 2, 1).reshape(len(idx), -1),
        "f_rest": take(field.sh_rest).transpose(0, 2, 1).reshape(len(idx), -1),
        "opacities": take(field.opacity_logit),
        "scale": take(field.log_scales),
        "rotation": take(field.quats),
    }
    return out


def from_ply_arrays(
    xyz, f_dc, f_rest, opacities, scale, rotation, capacity=None
) -> GaussianField:
    n = xyz.shape[0]
    cap = capacity if capacity is not None else round_capacity(n)

    def pad(x):
        x = np.asarray(x, np.float32)
        out = np.zeros((cap,) + x.shape[1:], np.float32)
        out[:n] = x
        return jnp.asarray(out)

    valid = np.zeros((cap,), bool)
    valid[:n] = True
    return GaussianField(
        means=pad(xyz),
        quats=pad(rotation),
        log_scales=pad(scale),
        sh_dc=pad(np.asarray(f_dc, np.float32).reshape(n, 3, 1).transpose(0, 2, 1)),
        sh_rest=pad(np.asarray(f_rest, np.float32).reshape(n, 3, 15).transpose(0, 2, 1)),
        opacity_logit=pad(np.asarray(opacities, np.float32).reshape(n, 1)),
        valid=jnp.asarray(valid),
    )


# ---------------------------------------------------------------------------
# Capture / restore (optimizer-full checkpoints live in vegs_tpu.train via
# orbax; this mirrors the reference's capture() param tuple for tests)
# ---------------------------------------------------------------------------


def field_astuple(field: GaussianField):
    return dataclasses.astuple(field)
