"""Data-parallel training step: batch of cameras across the mesh, per-Gaussian
gradient psum over ICI, replicated Adam update.

TPU-native scaling design (SURVEY.md §2.5): the reference trains one camera
per step on one GPU; here each device renders a different camera against the
replicated Gaussian field inside shard_map, gradients are all-reduced with
psum on the "data" axis (XLA schedules the collective to overlap with the
remaining backward work), and the replicated Adam update runs identically on
every device — no parameter server, no explicit transport.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from .. import densify, optim
from ..gaussians import DensifyStats, GaussianField
from ..losses import l1_loss, loss_normal_guidance, ssim
from ..ops.projection import CameraParams
from ..ops.rasterize import RasterizeConfig
from ..render import field_arrays, _run
from .mesh import DATA_AXIS


def make_dp_train_step(
    mesh,
    opt_cfg,
    raster_cfg: RasterizeConfig,
    spatial_scale: float,
    height: int,
    width: int,
    use_normal_loss: bool = False,
    sh_total_degree: int = 3,
):
    """Build the jitted data-parallel step.

    Inputs (per call):
      state tuple (field, opt, stats, step)  — replicated
      cam_batch: CameraParams with leaves stacked [D, ...]  — sharded on data
      gt_batch: [D, 3, H, W]                                — sharded on data
      normal_batch: [D, 3, H, W] (zeros if unused)          — sharded on data
      active_sh_degree: scalar int32                        — replicated
      bg: [3]                                               — replicated
    Returns (field, opt, stats, step, metrics dict) — replicated.
    """
    lam_dssim = opt_cfg.lambda_dssim
    lam_dnormal = opt_cfg.lambda_dnormal
    axis = DATA_AXIS

    def local_loss(params, field_tmpl, cam: CameraParams, gt, normal,
                   active_sh_degree, bg, m2d_offset):
        field = optim.with_params(field_tmpl, params)
        arrays = field_arrays(field, active_sh_degree)
        out = _run(cam, arrays, bg=bg, scale_modifier=1.0,
                   override_color=None, sh_degree=sh_total_degree,
                   config=raster_cfg, means2d_offset=m2d_offset)
        ll1 = l1_loss(out.rgb, gt)
        loss = (1 - lam_dssim) * ll1 + lam_dssim * (1.0 - ssim(out.rgb, gt))
        if use_normal_loss:
            loss = loss + lam_dnormal * loss_normal_guidance(
                out.cov_quat, out.cov_scale, normal)
        return loss, (out.radii, ll1)

    def sharded_body(field, opt_state, stats, step, cam_batch, gt_batch,
                     normal_batch, active_sh_degree, bg):
        # Inside shard_map each device sees its [1, ...] slice of the batch.
        cam = jax.tree.map(lambda x: x[0], cam_batch)
        gt = gt_batch[0]
        normal = normal_batch[0]

        params = optim.split_params(field)
        m2d = jnp.zeros((field.capacity, 2), jnp.float32)
        (loss, (radii, ll1)), (g_params, g_m2d) = jax.value_and_grad(
            local_loss, argnums=(0, 7), has_aux=True
        )(params, field, cam, gt, normal, active_sh_degree, bg, m2d)

        # Per-Gaussian gradient all-reduce across the camera batch.
        nd = jax.lax.psum(1, axis)
        g_params = jax.tree.map(lambda g: jax.lax.psum(g, axis) / nd, g_params)
        loss = jax.lax.psum(loss, axis) / nd
        ll1 = jax.lax.psum(ll1, axis) / nd

        # Replicated update (identical on every device).
        lrs = optim.field_lrs(opt_cfg, spatial_scale, step)
        new_field, new_opt = optim.adam_step(field, g_params, opt_state, lrs)

        # Densify stats: PER-VIEW contributions reduced across the batch
        # (psum of per-view gradient norms + visibility counts — summing
        # the raw cotangents first would let opposing views cancel and
        # undercount denom; round-1 advisor finding).
        norm_c, vis_c, rad_c = densify.stats_contribution(
            g_m2d, radii, height, width)
        new_stats = densify.apply_stats(
            stats, jax.lax.psum(norm_c, axis), jax.lax.psum(vis_c, axis),
            jax.lax.pmax(rad_c, axis))
        metrics = {"loss": loss, "l1": ll1}
        return new_field, new_opt, new_stats, step + 1, metrics

    cam_spec = CameraParams(
        viewmatrix=P(axis), projmatrix=P(axis), campos=P(axis),
        tan_fovx=P(axis), tan_fovy=P(axis), height=height, width=width,
    )
    smapped = shard_map(
        sharded_body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), cam_spec, P(axis), P(axis), P(), P()),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(smapped)


def stack_camera_batch(cams: list) -> CameraParams:
    """Stack host cameras into a batched CameraParams (leaves [D, ...])."""
    params = [c.device_params() if hasattr(c, "device_params") else c
              for c in cams]
    h, w = params[0].height, params[0].width
    assert all(p.height == h and p.width == w for p in params)
    return CameraParams(
        viewmatrix=jnp.stack([p.viewmatrix for p in params]),
        projmatrix=jnp.stack([p.projmatrix for p in params]),
        campos=jnp.stack([p.campos for p in params]),
        tan_fovx=jnp.stack([p.tan_fovx for p in params]),
        tan_fovy=jnp.stack([p.tan_fovy for p in params]),
        height=h, width=w,
    )
