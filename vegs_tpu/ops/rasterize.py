"""End-to-end differentiable Gaussian rasterization.

Mirrors the Python-visible API of the reference's CUDA extension
(`GaussianRasterizer.__call__`, /root/reference/gaussian_renderer/__init__.py:86-119):
6 outputs — rgb [3,H,W], depth [1,H,W], per-pixel covariance quaternion
[4,H,W], per-pixel covariance scale [3,H,W], alpha [1,H,W], radii [N] — plus
the screen-space gradient tap used for densification statistics.

TPU-first pipeline: project (XLA, autodiff) → bin+sort (XLA index math) →
gather payload (XLA; its transpose is the per-instance grad scatter-add) →
blend (Pallas custom-VJP kernel, or the dense XLA reference for tests).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .. import geometry
from . import binning, blend_ref
from .projection import CameraParams, Projected, project


class RasterizeConfig(NamedTuple):
    tile_h: int = 16
    tile_w: int = 16
    k_cap: int = 1 << 22       # instance capacity (tile-expanded)
    backend: str = "auto"      # 'dense' | 'pallas' | 'auto'
    clamp_radius: int = 0      # 0 = unbounded footprint


def _gather3x8(rows: jax.Array, idx: jax.Array) -> jax.Array:
    """Row gather in 8-wide pieces (TPU's fast aligned-gather path)."""
    return jnp.concatenate(
        [rows[:, i * 8:(i + 1) * 8][idx] for i in range(3)], axis=1)


@jax.custom_vjp
def gather_payload_rows(rows: jax.Array, gidx: jax.Array) -> jax.Array:
    """[n_rows, 24] x [K] -> [K, 24] instance payload expansion.

    Custom VJP: XLA's transpose of this gather is a scatter-add with
    colliding indices, which costs ~410 ms at 2M instances on TPU (the single
    largest cost in the whole training step). The backward here instead sorts
    the cotangents by Gaussian (lax.sort, ~5 ms), takes a two-level
    (512-block) inclusive cumsum for numerical stability, and differences it
    at per-Gaussian boundaries found by one merge-sort searchsorted — a
    segment reduction in ~50 ms total with no scatter at all.
    """
    return _gather3x8(rows, gidx)


def _gpr_fwd(rows, gidx):
    return _gather3x8(rows, gidx), (gidx, rows.shape[0])


def _gpr_bwd(res, g):
    gidx, n_rows = res
    k = gidx.shape[0]
    order = jnp.arange(k, dtype=jnp.int32)
    gidx_s, order_s = jax.lax.sort((gidx, order), num_keys=1)
    g_sorted = _gather3x8(g, order_s)  # [K, 24] grouped by Gaussian

    block = 512
    k_pad = -(-k // block) * block
    if k_pad != k:
        g_sorted = jnp.pad(g_sorted, ((0, k_pad - k), (0, 0)))
    x = g_sorted.reshape(k_pad // block, block, 24)
    inner = jnp.cumsum(x, axis=1)
    tot = inner[:, -1]
    prefix = jnp.cumsum(tot, axis=0) - tot
    cum = (inner + prefix[:, None, :]).reshape(k_pad, 24)
    cum = jnp.concatenate([jnp.zeros((1, 24), cum.dtype), cum], axis=0)

    ends = jnp.searchsorted(
        gidx_s, jnp.arange(n_rows, dtype=jnp.int32), side="right",
        method="sort").astype(jnp.int32)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), ends[:-1]])
    d_rows = _gather3x8(cum, ends) - _gather3x8(cum, starts)
    return d_rows, None


gather_payload_rows.defvjp(_gpr_fwd, _gpr_bwd)


class RasterOut(NamedTuple):
    rgb: jax.Array        # [3, H, W] (background composited)
    depth: jax.Array      # [1, H, W]
    cov_quat: jax.Array   # [4, H, W]
    cov_scale: jax.Array  # [3, H, W]
    alpha: jax.Array      # [1, H, W]
    radii: jax.Array      # [N] int32
    means2d: jax.Array    # [N, 2] pixel coords (for densify-stat gradients)
    num_dropped: jax.Array  # scalar int32 — instances dropped at k_cap


def _resolve_backend(backend: str) -> str:
    if backend != "auto":
        return backend
    return "pallas"


def rasterize(
    means3d: jax.Array,               # [N, 3]
    quats: jax.Array,                 # [N, 4] (raw; normalized internally)
    scales: jax.Array,                # [N, 3] (activated, i.e. exp() applied)
    opacities: jax.Array,             # [N] or [N, 1] (activated)
    shs: Optional[jax.Array],         # [N, K, 3] SH coeffs (or None)
    cam: CameraParams,
    *,
    colors_precomp: Optional[jax.Array] = None,  # [N, 3] overrides SH path
    cov6_precomp: Optional[jax.Array] = None,    # [N, 6] overrides scale/quat cov
    sh_degree: int = 3,
    bg: Optional[jax.Array] = None,   # [3]
    scale_modifier: float = 1.0,
    valid: Optional[jax.Array] = None,           # [N] bool
    means2d_offset: Optional[jax.Array] = None,  # [N, 2] zeros (grad tap)
    config: RasterizeConfig = RasterizeConfig(),
) -> RasterOut:
    n = means3d.shape[0]
    H, W = cam.height, cam.width
    grid = binning.TileGrid.for_image(H, W, config.tile_h, config.tile_w)
    bg = jnp.zeros(3, means3d.dtype) if bg is None else bg

    if cov6_precomp is not None:
        cov6 = cov6_precomp
    else:
        cov6 = geometry.strip_symmetric(
            geometry.covariance_from_scaling_rotation(
                scales, quats, scale_modifier
            )
        )

    if colors_precomp is not None:
        # Bypass the in-projection SH path: encode the color as a DC-only SH.
        from .. import sh as sh_lib

        shs_eff = (colors_precomp - 0.5)[:, None, :] / sh_lib.C0
        deg_eff = 0
    else:
        assert shs is not None, "need shs or colors_precomp"
        shs_eff = shs
        deg_eff = sh_degree

    proj = project(
        means3d, cov6, opacities, shs_eff, cam,
        sh_degree=deg_eff, valid=valid, means2d_offset=means2d_offset,
        clamp_radius=config.clamp_radius,
    )

    # Per-pixel covariance-orientation channels (the VEGS fork's extra
    # outputs): normalized/standardized quats and modified scales.
    quat_n = geometry.quat_standardize(geometry.quat_normalize(quats))
    scale_eff = scales * scale_modifier

    payload_rows_unpadded = jnp.concatenate(
        [
            proj.means2d,                       # cols 0-1
            proj.conics,                        # cols 2-4
            proj.opacities[:, None],            # col 5
            proj.rgb,                           # cols 6-8
            proj.depths[:, None],               # col 9
            quat_n,                             # cols 10-13
            scale_eff,                          # cols 14-16
        ],
        axis=1,
    )  # [N, 17]

    binned = binning.bin_gaussians(
        jax.lax.stop_gradient(proj.means2d),
        jax.lax.stop_gradient(proj.depths),
        proj.radii,
        grid,
        config.k_cap,
    )
    # Dummy zero-opacity row at index n absorbs the padding slots (binning's
    # chunk-aligned layout points them at gidx == n). Gather along ROWS in
    # 8-wide pieces — 8-float rows hit the TPU's fast aligned-gather path
    # (~4 ms/M rows) while 17-wide rows take ~30 ms/M — then transpose into
    # the blend kernel's [17, K] layout. The gather carries a custom VJP
    # (sorted segment reduction) replacing XLA's catastrophically slow
    # colliding scatter-add transpose.
    payload_rows = jnp.pad(payload_rows_unpadded, ((0, 1), (0, 7)))  # [n+1, 24]
    payload_sorted = gather_payload_rows(
        payload_rows, binned.gidx)[:, :17].T                         # [17, k_cap]

    backend = _resolve_backend(config.backend)
    if backend == "dense":
        out = blend_ref.blend_dense(
            payload_sorted, binned.sort_keys, binned.tile_starts, grid, H, W
        )
    elif backend == "pallas":
        from . import blend_pallas

        hp, wp = grid.nty * grid.tile_h, grid.ntx * grid.tile_w
        out_p = blend_pallas.blend(
            payload_sorted, binned.tile_starts, grid, hp, wp
        )
        out = out_p[:, :H, :W]
    else:
        raise ValueError(f"unknown backend {backend}")

    t_fin = out[blend_ref.N_ACCUM]
    rgb = out[0:3] + t_fin[None] * bg[:, None, None]

    return RasterOut(
        rgb=rgb,
        depth=out[3:4],
        cov_quat=out[4:8],
        cov_scale=out[8:11],
        alpha=1.0 - t_fin[None],
        radii=proj.radii,
        means2d=proj.means2d,
        num_dropped=binned.num_dropped,
    )
