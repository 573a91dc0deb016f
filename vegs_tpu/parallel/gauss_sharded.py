"""Gaussian-axis (N) sharding of the rasterizer front end.

First slice of the SURVEY §2.5 tensor-parallel plan (round-1 verdict item 3):
the Gaussian FIELD — by far the dominant state (params + Adam moments +
densify stats ≈ 59 f32 per Gaussian, ~1.5 GB at the reference's 2.2M scale)
— lives sharded over a "gauss" mesh axis. Each device projects only its
shard (cull, EWA conic, SH color: the N-proportional compute) and builds the
COMPACT mixed-precision payload rows (8 f32 + 16 bf16 = 64 B/Gaussian);
those rows are then all_gather'ed over ICI and binning + blend run on the
gathered (replicated) instance stream, bit-identical to the single-device
pipeline.

Memory per device: field/D + transient payload (64 B x N) instead of
3 x 236 B x N replicated — an ~8x state reduction on an 8-device axis.
The follow-up slice (tile-axis blend sharding with ppermute splat exchange)
replaces the replicated blend; see NOTES_PERF.md roadmap.

all_gather is differentiable (transpose = psum_scatter), so the same wrapper
trains: gradients arrive pre-sharded on each device's own Gaussians.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from .. import geometry
from ..gaussians import GaussianField
from ..ops import binning, blend_ref
from ..ops.projection import CameraParams, project
from ..ops.rasterize import (AUX_COLS, F32_COLS, RasterizeConfig, RasterOut,
                             assemble_dense_payload, build_payload,
                             gather_expand)

GAUSS_AXIS = "gauss"


def make_gauss_mesh(n_devices: int) -> jax.sharding.Mesh:
    import numpy as np

    return jax.sharding.Mesh(
        np.array(jax.devices()[:n_devices]), (GAUSS_AXIS,))


def shard_field_arrays(mesh, *arrays):
    """Place per-Gaussian arrays sharded on axis 0 over the mesh's first
    axis. Leading dims must divide the axis size (pad capacity accordingly)."""
    sharding = jax.sharding.NamedSharding(mesh, P(mesh.axis_names[0]))
    return tuple(jax.device_put(a, sharding) for a in arrays)


def make_gauss_sharded_rasterize(mesh, cam: CameraParams,
                                 config: RasterizeConfig,
                                 sh_degree: int = 3):
    """Build a jitted fn(means, quats, scales, opac, shs, valid, bg) ->
    (rgb, depth, alpha) whose per-Gaussian inputs are SHARDED on the gauss
    axis; output images are replicated and bit-identical to the
    single-device rasterize."""

    def body(means, quats, scales, opac, shs, valid, bg):
        # ---- sharded front end: N-proportional compute on N/D rows -------
        cov6 = geometry.cov6_from_scaling_rotation(scales, quats)
        proj = project(means, cov6, opac, shs, cam, sh_degree=sh_degree,
                       valid=valid)
        quat_n = geometry.quat_standardize(geometry.quat_normalize(quats))
        aux_dtype = (jnp.bfloat16 if config.payload_dtype == "bf16"
                     else jnp.float32)
        pay_f32, pay_aux = build_payload(proj, quat_n, scales, aux_dtype)

        # ---- gather the compact rows; binning/blend replicated -----------
        pay_f32 = jax.lax.all_gather(pay_f32, GAUSS_AXIS, tiled=True)
        pay_aux = jax.lax.all_gather(pay_aux, GAUSS_AXIS, tiled=True)
        radii_xy = jax.lax.all_gather(proj.radii_xy, GAUSS_AXIS, tiled=True)
        # Binning's geometry inputs are slices of the gathered pay_f32
        # (cols: means2d 0:2, conics 2:5, opacity 5, depth 6) — no second
        # gather of the same data.
        pf_sg = jax.lax.stop_gradient(pay_f32)

        grid = binning.TileGrid.for_image(cam.height, cam.width,
                                          config.tile_h, config.tile_w)
        b = binning.bin_gaussians(
            pf_sg[:, 0:2], pf_sg[:, 6], radii_xy, grid, config.k_cap,
            conics=pf_sg[:, 2:5], opacities=pf_sg[:, 5])
        ends = jnp.concatenate([b.gauss_ends, b.gauss_ends[-1:]])
        pf, pa = gather_expand(
            jnp.pad(pay_f32, ((0, 1), (0, 0))),
            jnp.pad(pay_aux, ((0, 1), (0, 0))), b.gidx, b.order, ends)
        H, W = cam.height, cam.width
        if config.backend == "dense":
            out = blend_ref.blend_dense(
                assemble_dense_payload(pf, pa), b.sort_keys, b.tile_starts,
                grid, H, W)
        else:
            from ..ops import blend_pallas

            hp, wp = grid.nty * grid.tile_h, grid.ntx * grid.tile_w
            out = blend_pallas.blend(
                pf.T, pa.T, b.tile_starts, grid, hp, wp,
                chunk=config.blend_chunk)[:, :H, :W]
        t_fin = out[blend_ref.N_ACCUM]
        rgb = out[0:3] + t_fin[None] * bg[:, None, None]
        return rgb, out[3:4], 1.0 - t_fin[None]

    smapped = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(GAUSS_AXIS), P(GAUSS_AXIS), P(GAUSS_AXIS),
                  P(GAUSS_AXIS), P(GAUSS_AXIS), P(GAUSS_AXIS), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(smapped)


def sharded_state_bytes(field: GaussianField, n_devices: int) -> dict:
    """Analytic per-device memory: sharded field+Adam vs replicated."""
    field_bytes = sum(
        getattr(field, k).nbytes
        for k in ("means", "quats", "log_scales", "sh_dc", "sh_rest",
                  "opacity_logit"))
    full = field_bytes * 3  # params + Adam mu + nu
    payload = field.capacity * 64  # transient gathered rows
    return {
        "replicated_bytes": full,
        "sharded_bytes": full // n_devices + payload,
        "ratio": full / (full / n_devices + payload),
    }
