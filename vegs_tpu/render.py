"""Differentiable renderer API over the rasterizer kernels.

Capability parity with /root/reference/gaussian_renderer/__init__.py:
  render()      — static field (20-119)
  render_dyn()  — dynamic boxes only, scale_modifier 2.0 default (188-260)
  render_all()  — static + boxes composited in ONE rasterizer call (263-333)
  prepare-style box composition — box2world applied to means; covariance
  rotation composed R_box @ R_gauss via quaternions and scales multiplied by
  the box scale (121-180); learnable BoxDeltas residuals fold in through
  adjust_box2world.

TPU-first notes: all sub-models are concatenated into a single fixed-shape
rasterize call (the reference's merge_kwargs, 182-186), so one jitted program
covers static+dynamic; the SH warm-up is a band mask (no retrace per degree);
the screen-space gradient tap comes back per concatenated row with slice
boundaries so densification stats can be split per sub-model
(reference train.py:287-290 slice_with_grad).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from . import boxmodel, geometry
from .gaussians import GaussianField, sh_band_mask
from .ops.projection import CameraParams
from .ops.rasterize import RasterOut, RasterizeConfig, rasterize


class FieldArrays(NamedTuple):
    """Raw per-Gaussian arrays ready for the rasterizer (world space)."""

    means: jax.Array
    quats: jax.Array
    scales: jax.Array
    opacities: jax.Array
    shs: jax.Array
    valid: jax.Array


def _as_cam_params(camera) -> CameraParams:
    if isinstance(camera, CameraParams):
        return camera
    return camera.device_params()


def field_arrays(field: GaussianField, active_sh_degree=3) -> FieldArrays:
    mask = sh_band_mask(active_sh_degree)[None, :, None]
    return FieldArrays(
        means=field.means,
        quats=field.rotations(),
        scales=field.scales(),
        opacities=field.opacities()[:, 0],
        shs=field.features() * mask,
        valid=field.valid,
    )


def transform_field_arrays(arrays: FieldArrays, box2world: jax.Array) -> FieldArrays:
    """Apply a box-to-world (rotation*scale + translation) transform to a
    canonical-space field (reference prepare_rasterization, 121-180)."""
    means_h = jnp.concatenate(
        [arrays.means, jnp.ones((arrays.means.shape[0], 1), arrays.means.dtype)],
        axis=1,
    )
    means_w = (means_h @ box2world.T)[:, :3]

    R_box, S_box, _ = geometry.decompose_T_to_RS(box2world)
    # quaternion -> matrix -> compose -> quaternion (reference 147-151)
    rot_mat = geometry.quat_to_rotmat(arrays.quats)
    composed = R_box[None] @ rot_mat
    quats = geometry.rotmat_to_quat(composed)
    scales = arrays.scales * S_box[None, :]
    return arrays._replace(means=means_w, quats=quats, scales=scales)


def _concat_arrays(parts: Sequence[FieldArrays]) -> FieldArrays:
    return FieldArrays(*[jnp.concatenate(x, axis=0) for x in zip(*parts)])


def _run(camera, arrays: FieldArrays, *, bg, scale_modifier, override_color,
         sh_degree, config, means2d_offset) -> RasterOut:
    cam = _as_cam_params(camera)
    return rasterize(
        arrays.means, arrays.quats, arrays.scales, arrays.opacities,
        arrays.shs, cam,
        colors_precomp=override_color,
        sh_degree=sh_degree,
        bg=bg,
        scale_modifier=scale_modifier,
        valid=arrays.valid,
        means2d_offset=means2d_offset,
        config=config,
    )


def render(
    camera,
    field: GaussianField,
    *,
    bg: Optional[jax.Array] = None,
    scale_modifier: float = 1.0,
    override_color: Optional[jax.Array] = None,
    active_sh_degree: int | jax.Array = 3,
    sh_degree: int = 3,
    config: RasterizeConfig = RasterizeConfig(),
    means2d_offset: Optional[jax.Array] = None,
    convert_SHs_python: bool = False,
    compute_cov3D_python: bool = False,
) -> RasterOut:
    """Render the static field (reference render(), 20-119).

    The pipe flags mirror the reference's PipelineParams: under XLA both
    paths trace into the same fused program, so they are semantic parity
    switches (SH evaluated outside the rasterizer / covariance precomputed)
    rather than performance toggles."""
    arrays = field_arrays(field, active_sh_degree)
    cov6_precomp = None
    if compute_cov3D_python:
        from . import geometry as _geo

        cov6_precomp = _geo.strip_symmetric(
            _geo.covariance_from_scaling_rotation(
                arrays.scales, arrays.quats, scale_modifier))
    if convert_SHs_python and override_color is None:
        from . import sh as _sh
        cam = _as_cam_params(camera)
        dirs = arrays.means - cam.campos[None, :]
        sq = jnp.sum(dirs * dirs, axis=1, keepdims=True)
        dirs = dirs / jnp.sqrt(jnp.maximum(sq, 1e-24))
        deg = int(active_sh_degree) if isinstance(active_sh_degree, int) else sh_degree
        override_color = jnp.maximum(
            _sh.eval_sh(deg, jnp.swapaxes(
                arrays.shs[:, :_sh.num_sh_coeffs(deg), :], 1, 2), dirs) + 0.5,
            0.0)
    cam = _as_cam_params(camera)
    return rasterize(
        arrays.means, arrays.quats, arrays.scales, arrays.opacities,
        arrays.shs, cam,
        colors_precomp=override_color, cov6_precomp=cov6_precomp,
        sh_degree=sh_degree, bg=bg, scale_modifier=scale_modifier,
        valid=arrays.valid, means2d_offset=means2d_offset, config=config)


class BoxInstance(NamedTuple):
    """One dynamic object in the current frame."""

    field: GaussianField
    box2world: jax.Array          # [4, 4] annotation transform
    deltas: Optional[boxmodel.BoxDeltas] = None  # learnable residual


def _box_arrays(box: BoxInstance, active_sh_degree) -> FieldArrays:
    b2w = box.box2world
    if box.deltas is not None:
        b2w = boxmodel.adjust_box2world(b2w, box.deltas)
    return transform_field_arrays(field_arrays(box.field, active_sh_degree), b2w)


def render_dyn(
    camera,
    boxes: Sequence[BoxInstance],
    *,
    bg: Optional[jax.Array] = None,
    scale_modifier: float = 2.0,
    active_sh_degree: int | jax.Array = 3,
    sh_degree: int = 3,
    config: RasterizeConfig = RasterizeConfig(),
    means2d_offset: Optional[jax.Array] = None,
):
    """Boxes only (reference render_dyn, 188-260; note default modifier 2.0).

    Returns (RasterOut, slice boundaries [len(boxes)+1])."""
    parts = [_box_arrays(b, active_sh_degree) for b in boxes]
    arrays = _concat_arrays(parts)
    out = _run(camera, arrays, bg=bg, scale_modifier=scale_modifier,
               override_color=None, sh_degree=sh_degree, config=config,
               means2d_offset=means2d_offset)
    bounds = _bounds([b.field.capacity for b in boxes])
    return out, bounds


def render_all(
    camera,
    static_field: GaussianField,
    boxes: Sequence[BoxInstance],
    *,
    bg: Optional[jax.Array] = None,
    scale_modifier: float = 1.0,
    active_sh_degree: int | jax.Array = 3,
    sh_degree: int = 3,
    config: RasterizeConfig = RasterizeConfig(),
    means2d_offset: Optional[jax.Array] = None,
):
    """Static + dynamic composited in one rasterizer call (reference 263-333).

    Returns (RasterOut, slice boundaries [len(boxes)+2] over the concatenated
    Gaussian axis: [static | box_0 | box_1 | ...])."""
    parts = [field_arrays(static_field, active_sh_degree)]
    parts += [_box_arrays(b, active_sh_degree) for b in boxes]
    arrays = _concat_arrays(parts)
    out = _run(camera, arrays, bg=bg, scale_modifier=scale_modifier,
               override_color=None, sh_degree=sh_degree, config=config,
               means2d_offset=means2d_offset)
    bounds = _bounds(
        [static_field.capacity] + [b.field.capacity for b in boxes])
    return out, bounds


def _bounds(sizes: Sequence[int]) -> list[int]:
    out = [0]
    for s in sizes:
        out.append(out[-1] + s)
    return out
