"""Fully sharded training step: NO replicated per-Gaussian state.

The tensor-parallel completion of SURVEY §2.5 (TP/SP rows): the Gaussian
field, its Adam moments AND its densify statistics all live sharded on the
`shard` mesh axis (axis 0 of every [C, ...] leaf); one camera is trained per
step (the reference's regime, /root/reference/train.py:126-150) and the
render itself is the tile-sharded rasterizer (tile_sharded.tile_render_local:
N/D-proportional front end, one all_to_all splat exchange, each device blends
its own tile rows).

Per-device memory is params/D + Adam/D + stats/D + the transient exchange
buffers — at the reference's 2.2M-Gaussian scale (~600 MB of state+opt
replicated) an 8-device axis holds ~75 MB per chip, which is what lets a
multi-host pod slice hold city-block scenes that cannot fit one chip.

Design notes:
  * Loss needs the FULL image (SSIM's 11x11 window crosses tile-row shard
    boundaries), so the local tile rows are all_gather'ed (~6 MB at
    376x1408 — trivial next to the payload exchange) and L1+DSSIM(+normal
    guidance) is computed identically on every device. The gather's
    transpose hands each device exactly its own rows' cotangents.
  * Gradients arrive PRE-SHARDED: each Gaussian lives on exactly one
    device, so there is no grad collective at all (contrast DP's psum) —
    the only backward-pass communication is the reverse all_to_all of the
    splat exchange plus the image-gather transpose.
  * The Adam update and densify-stat accumulation are purely row-local,
    so they run shard-local with no communication; densify/recompaction
    later runs per shard as well (each shard keeps its own capacity/D
    budget and valid mask — clone/split targets stay on the shard that
    owns the parent).

Equivalence: tests/test_parallel.py asserts an 8-device step matches the
single-device trainer step bit-for-bit up to f32 reassociation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from .. import densify, optim
from ..gaussians import DensifyStats, GaussianField, sh_band_mask
from ..losses import l1_loss, loss_normal_guidance, ssim
from ..ops import blend_ref
from ..ops.projection import CameraParams
from ..ops.rasterize import RasterizeConfig
from .tile_sharded import TILE_AXIS, make_tile_plan, tile_render_local


def shard_train_state(mesh, field: GaussianField, opt, stats: DensifyStats):
    """Place (field, Adam, stats) sharded on axis 0 over the mesh's first
    axis; scalar leaves (Adam count) stay replicated."""
    axis = mesh.axis_names[0]

    def put(x):
        spec = P(axis) if getattr(x, "ndim", 0) >= 1 else P()
        return jax.device_put(x, jax.sharding.NamedSharding(mesh, spec))

    return (jax.tree.map(put, field), jax.tree.map(put, opt),
            jax.tree.map(put, stats))


class KCapAdapter:
    """Trainer._adapt_k_cap's grow/decay policy (train.py) for SHARDED runs,
    where the step fn is built per (mesh, k_cap) and the caller owns the
    rebuild: feed each step's `num_dropped`/`num_needed` metrics to
    `update()`; a non-None return is the new global k_cap — rebuild the TP
    step (and re-pad nothing: k_cap only affects the instance stream, not
    the Gaussian state). Grow 2x on any drop; halve after `decay_window`
    consecutive steps below 25% utilization (num_needed is already in
    global-k_cap units — tile_render_local scales the worst shard by ndev).
    Every rasterizer stage is O(k_cap/D) per device, so decay matters as
    much here as on the single-device path."""

    def __init__(self, k_cap: int, k_cap_min: int = 1 << 15,
                 decay_window: int = 200, k_cap_max: int = 1 << 24):
        self.k_cap = int(k_cap)
        self.k_cap_min = int(k_cap_min)
        # Growth ceiling: without it a pathological scene doubles k_cap
        # every dropped step until compile/HBM failure. 2^24 instances
        # (~1 GB of raw stream at 64 B/instance) is far past any measured
        # need (reference scale needs ~4.5M) yet well inside v5e HBM.
        self.k_cap_max = int(k_cap_max)
        self.decay_window = int(decay_window)
        self._low_streak = 0

    def update(self, num_dropped: float, num_needed: float) -> int | None:
        if num_dropped > 0 and self.k_cap < self.k_cap_max:
            self.k_cap = min(self.k_cap * 2, self.k_cap_max)
            self._low_streak = 0
            return self.k_cap
        if num_needed > 0 and num_needed < 0.25 * self.k_cap:
            self._low_streak += 1
        else:
            self._low_streak = 0
        if (self._low_streak >= self.decay_window
                and self.k_cap // 2 >= self.k_cap_min):
            self.k_cap //= 2
            self._low_streak = 0
            return self.k_cap
        return None


def make_tp_train_step(
    mesh,
    opt_cfg,
    raster_cfg: RasterizeConfig,
    spatial_scale: float,
    cam: CameraParams,
    use_normal_loss: bool = False,
    sh_total_degree: int = 3,
    k_exch: int | None = None,
):
    """Build the jitted fully-sharded step.

    `cam` at build time is a TEMPLATE — only its static height/width shape
    the compiled program; the step takes the actual camera as a traced
    argument, so one compilation serves every training camera at that
    resolution.

    Inputs (per call):
      field, opt, stats — ALL sharded on axis 0 (see shard_train_state)
      step: scalar int32 — replicated
      cam: CameraParams — replicated
      gt: [3, H, W], normal: [3, H, W] — replicated
      active_sh_degree: scalar int32, bg: [3] — replicated
    Returns (field, opt, stats, step, metrics) with the same shardings.
    """
    ndev = mesh.devices.size
    H, W = cam.height, cam.width
    plan = make_tile_plan(ndev, cam, raster_cfg, k_exch)
    lam_dssim = opt_cfg.lambda_dssim
    lam_dnormal = opt_cfg.lambda_dnormal

    def local_loss(params, field_tmpl, m2d_offset, cam, gt, normal,
                   active_sh_degree, bg):
        field = optim.with_params(field_tmpl, params)
        mask = sh_band_mask(active_sh_degree)[None, :, None]
        out_loc, proj, cap_info = tile_render_local(
            plan, cam, raster_cfg, sh_total_degree,
            field.means, field.rotations(), field.scales(),
            field.opacities()[:, 0], field.features() * mask, field.valid,
            means2d_offset=m2d_offset)
        # Full image on every device (transpose routes each device its own
        # rows' cotangents); SSIM windows then cross shard rows for free.
        out = jax.lax.all_gather(out_loc, TILE_AXIS, axis=1, tiled=True)
        t_fin = out[blend_ref.N_ACCUM, :H, :W]
        rgb = out[0:3, :H, :W] + t_fin[None] * bg[:, None, None]
        ll1 = l1_loss(rgb, gt)
        loss = (1 - lam_dssim) * ll1 + lam_dssim * (1.0 - ssim(rgb, gt))
        if use_normal_loss:
            loss = loss + lam_dnormal * loss_normal_guidance(
                out[4:8, :H, :W], out[8:11, :H, :W], normal)
        # Every device computes the IDENTICAL loss on the gathered image, so
        # the gather's transpose sums ndev copies of each row's cotangent.
        # Differentiate loss/ndev so gradients match the single-device step
        # exactly (Adam's scale invariance would hide the 8x on params, but
        # densify's xyz_gradient_accum is threshold-compared in absolute
        # units and must not inflate).
        return loss / ndev, (proj.radii, ll1, loss, cap_info)

    def sharded_body(field, opt_state, stats, step, cam, gt, normal,
                     active_sh_degree, bg):
        params = optim.split_params(field)
        m2d = jnp.zeros((field.capacity, 2), jnp.float32)  # local rows
        (_, (radii, ll1, loss, (dropped, needed, needed_ex))), (g_params, g_m2d) = (
            jax.value_and_grad(local_loss, argnums=(0, 2), has_aux=True)
            (params, field, m2d, cam, gt, normal, active_sh_degree, bg))

        # No gradient collective: every Gaussian lives on exactly one shard.
        lrs = optim.field_lrs(opt_cfg, spatial_scale, step)
        new_field, new_opt = optim.adam_step(field, g_params, opt_state, lrs)

        # Densify stats are row-local too.
        norm_c, vis_c, rad_c = densify.stats_contribution(
            g_m2d, radii, H, W)
        new_stats = densify.apply_stats(stats, norm_c, vis_c, rad_c)
        metrics = {"loss": loss, "l1": ll1, "num_dropped": dropped,
                   "num_needed": needed, "num_needed_exch": needed_ex}
        return new_field, new_opt, new_stats, step + 1, metrics

    field_spec = GaussianField(
        means=P(TILE_AXIS), quats=P(TILE_AXIS), log_scales=P(TILE_AXIS),
        sh_dc=P(TILE_AXIS), sh_rest=P(TILE_AXIS),
        opacity_logit=P(TILE_AXIS), valid=P(TILE_AXIS))
    opt_spec = optim.AdamState(mu=field_spec, nu=field_spec, count=P())
    stats_spec = DensifyStats(
        max_radii2d=P(TILE_AXIS), xyz_gradient_accum=P(TILE_AXIS),
        denom=P(TILE_AXIS))
    cam_spec = CameraParams(
        viewmatrix=P(), projmatrix=P(), campos=P(),
        tan_fovx=P(), tan_fovy=P(), height=H, width=W)

    smapped = shard_map(
        sharded_body,
        mesh=mesh,
        in_specs=(field_spec, opt_spec, stats_spec, P(), cam_spec, P(), P(),
                  P(), P()),
        out_specs=(field_spec, opt_spec, stats_spec, P(), P()),
        check_vma=False,
    )
    return jax.jit(smapped)


def make_dp_mesh_2d(n_data: int, n_shard: int) -> jax.sharding.Mesh:
    """2D mesh (data, shard): camera batch on the outer axis, Gaussian/tile
    shard on the inner (contiguous devices — ICI-neighbor heavy all_to_all
    stays on the inner axis; the lighter grad psum rides the outer)."""
    import numpy as np

    devs = np.array(jax.devices()[:n_data * n_shard]).reshape(
        n_data, n_shard)
    return jax.sharding.Mesh(devs, ("data", TILE_AXIS))


def make_dp_tp_train_step(
    mesh,
    opt_cfg,
    raster_cfg: RasterizeConfig,
    spatial_scale: float,
    cam: CameraParams,
    use_normal_loss: bool = False,
    sh_total_degree: int = 3,
    k_exch: int | None = None,
):
    """Hybrid 2D step over a (data, shard) mesh: each data row trains a
    DIFFERENT camera (stack_camera_batch leaves, [Dd, ...]) against the same
    field, which is sharded over the inner axis and replicated across data
    rows. The splat all_to_all and image gather run on the inner axis; the
    only cross-row traffic is the per-Gaussian-grad psum (sharded rows, so
    1/Ds of the DP-step volume) and the densify-stat reductions.

    Inputs: field/opt/stats sharded as in make_tp_train_step; cam_batch with
    leaves [Dd, ...]; gt/normal [Dd, 3, H, W]; scalars replicated.
    """
    n_data, n_shard = (mesh.shape["data"], mesh.shape[TILE_AXIS])
    H, W = cam.height, cam.width
    plan = make_tile_plan(n_shard, cam, raster_cfg, k_exch)
    lam_dssim = opt_cfg.lambda_dssim
    lam_dnormal = opt_cfg.lambda_dnormal

    def local_loss(params, field_tmpl, m2d_offset, cam_d, gt, normal,
                   active_sh_degree, bg):
        field = optim.with_params(field_tmpl, params)
        mask = sh_band_mask(active_sh_degree)[None, :, None]
        out_loc, proj, cap_info = tile_render_local(
            plan, cam_d, raster_cfg, sh_total_degree,
            field.means, field.rotations(), field.scales(),
            field.opacities()[:, 0], field.features() * mask, field.valid,
            means2d_offset=m2d_offset)
        out = jax.lax.all_gather(out_loc, TILE_AXIS, axis=1, tiled=True)
        t_fin = out[blend_ref.N_ACCUM, :H, :W]
        rgb = out[0:3, :H, :W] + t_fin[None] * bg[:, None, None]
        ll1 = l1_loss(rgb, gt)
        loss = (1 - lam_dssim) * ll1 + lam_dssim * (1.0 - ssim(rgb, gt))
        if use_normal_loss:
            loss = loss + lam_dnormal * loss_normal_guidance(
                out[4:8, :H, :W], out[8:11, :H, :W], normal)
        # /n_shard: identical loss on every shard of this data row (gather
        # transpose sums the copies — see make_tp_train_step).
        return loss / n_shard, (proj.radii, ll1, loss, cap_info)

    def sharded_body(field, opt_state, stats, step, cam_batch, gt_batch,
                     normal_batch, active_sh_degree, bg):
        # Each device sees its data row's [1, ...] slice of the batch.
        cam_d = jax.tree.map(
            lambda x: x[0] if getattr(x, "ndim", 0) >= 1 else x, cam_batch)
        gt = gt_batch[0]
        normal = normal_batch[0]

        params = optim.split_params(field)
        m2d = jnp.zeros((field.capacity, 2), jnp.float32)
        (_, (radii, ll1, loss, (dropped, needed, needed_ex))), (g_params, g_m2d) = (
            jax.value_and_grad(local_loss, argnums=(0, 2), has_aux=True)
            (params, field, m2d, cam_d, gt, normal, active_sh_degree, bg))

        # Camera-batch all-reduce of the (already shard-local) grads.
        g_params = jax.tree.map(
            lambda g: jax.lax.psum(g, "data") / n_data, g_params)
        loss = jax.lax.psum(loss, "data") / n_data
        ll1 = jax.lax.psum(ll1, "data") / n_data

        lrs = optim.field_lrs(opt_cfg, spatial_scale, step)
        new_field, new_opt = optim.adam_step(field, g_params, opt_state, lrs)

        # Densify stats: per-view contributions reduced across the camera
        # batch (psum norms + counts, pmax radii — sequential semantics).
        norm_c, vis_c, rad_c = densify.stats_contribution(
            g_m2d, radii, H, W)
        new_stats = densify.apply_stats(
            stats, jax.lax.psum(norm_c, "data"),
            jax.lax.psum(vis_c, "data"), jax.lax.pmax(rad_c, "data"))
        metrics = {"loss": loss, "l1": ll1,
                   "num_dropped": jax.lax.pmax(dropped, "data"),
                   "num_needed": jax.lax.pmax(needed, "data"),
                   "num_needed_exch": jax.lax.pmax(needed_ex, "data")}
        return new_field, new_opt, new_stats, step + 1, metrics

    row = P(TILE_AXIS)
    field_spec = GaussianField(
        means=row, quats=row, log_scales=row, sh_dc=row, sh_rest=row,
        opacity_logit=row, valid=row)
    opt_spec = optim.AdamState(mu=field_spec, nu=field_spec, count=P())
    stats_spec = DensifyStats(
        max_radii2d=row, xyz_gradient_accum=row, denom=row)
    cam_spec = CameraParams(
        viewmatrix=P("data"), projmatrix=P("data"), campos=P("data"),
        tan_fovx=P("data"), tan_fovy=P("data"), height=H, width=W)

    smapped = shard_map(
        sharded_body,
        mesh=mesh,
        in_specs=(field_spec, opt_spec, stats_spec, P(), cam_spec,
                  P("data"), P("data"), P(), P()),
        out_specs=(field_spec, opt_spec, stats_spec, P(), P()),
        check_vma=False,
    )
    return jax.jit(smapped)


def make_tp_full_train_step(
    mesh,
    opt_cfg,
    raster_cfg: RasterizeConfig,
    spatial_scale: float,
    cam: CameraParams,
    use_normal_loss: bool,
    n_box_slots: int,
    box_lr_mult: float,
    boxmodel_lr: float,
    boxmodel_lambda_reg: float,
    sh_total_degree: int = 3,
    k_exch: int | None = None,
    guidance=None,
    aug_cam: CameraParams | None = None,
    perceptual_lam: float = 0.0,
    k_exch_aug: int | None = None,
):
    """The FULL VEGS model (static field + canonical-box instance fields +
    SE(3)+scale box deltas, reference train.py:112-290) trained with every
    per-Gaussian tensor sharded: the static field on its capacity axis and
    each box slot's field on ITS capacity axis (leaves [S, bcap, ...]
    sharded on axis 1), so composition (box2world transform), rendering,
    Adam and densify stats all run on 1/D rows per device. Only the box
    DELTAS (a few dozen floats) are replicated: their gradients flow from
    each device's own composed rows plus 1/D of the regularizer, so one
    psum over the shard axis restores the exact single-device gradient and
    the replicated delta-Adam update stays bit-identical across devices.

    Same update semantics as train.make_train_step (NaN guard on delta
    grads, box LRs WITHOUT spatial scale, active-slot masking, per-slot
    densify stats); equivalence test in tests/test_parallel.py. The build
    `cam` is a shape template; the step takes the camera as a traced
    argument (one compile per resolution, not per camera).

    fn(field, opt, stats, step, box_fields, box_opt, box_stats, deltas,
       delta_opt, box2worlds, active, cam, gt, normal, normal_valid,
       active_sh_degree, bg[, extras]) ->
      (field, opt, stats, step+1, box_fields, box_opt, box_stats, deltas,
       delta_opt, metrics)

    `guidance` (callable (key, crop, iteration) -> loss; pass `aug_cam` as
    the augmented-view shape template) and `perceptual_lam` complete the
    reference's capability set (train.py:171-193 SD window + the perceptual
    flag) in the NO-REPLICATION regime: the augmented view renders through
    the SAME tile-sharded path (1/D rows per device, one all_to_all), the
    gathered aug image feeds the diffusion score (VAE/UNet replicated
    compute — tiny next to per-Gaussian state), and the image-space loss
    gradients flow back through the gather's transpose onto the owning
    shards. When enabled, the step takes a trailing `extras` dict:
    {"aug_cam": CameraParams, "crop_start": i32, "gkey": key} and/or
    {"vgg_params": pytree} — all replicated.
    """
    from ..boxmodel import BoxDeltas, adjust_box2world
    from ..render import (_concat_arrays, field_arrays,
                          transform_field_arrays)

    ndev = mesh.shape[TILE_AXIS]
    H, W = cam.height, cam.width
    plan = make_tile_plan(ndev, cam, raster_cfg, k_exch)
    plan_aug = (make_tile_plan(ndev, aug_cam, raster_cfg, k_exch_aug)
                if guidance is not None else None)
    lam_dssim = opt_cfg.lambda_dssim
    lam_dnormal = opt_cfg.lambda_dnormal

    def _unstack(tree, i):
        return jax.tree.map(lambda x: x[i], tree)

    def local_loss(static_params, box_params, delta_params, field_tmpl,
                   bfields_tmpl, box2worlds, active, m2d_offset, cam, gt,
                   normal, normal_valid, active_sh_degree, bg, step,
                   extras=None):
        field = optim.with_params(field_tmpl, static_params)
        parts = [field_arrays(field, active_sh_degree)]
        bfields = optim.with_params(bfields_tmpl, box_params)
        deltas = BoxDeltas(**delta_params)
        b2w_adj = adjust_box2world(box2worlds, deltas)
        for i in range(n_box_slots):
            arr = field_arrays(_unstack(bfields, i), active_sh_degree)
            arr = transform_field_arrays(arr, b2w_adj[i])
            parts.append(arr._replace(valid=arr.valid & active[i]))
        arrays = _concat_arrays(parts)

        out_loc, proj, cap_info = tile_render_local(
            plan, cam, raster_cfg, sh_total_degree,
            arrays.means, arrays.quats, arrays.scales, arrays.opacities,
            arrays.shs, arrays.valid, means2d_offset=m2d_offset)
        out = jax.lax.all_gather(out_loc, TILE_AXIS, axis=1, tiled=True)
        t_fin = out[blend_ref.N_ACCUM, :H, :W]
        rgb = out[0:3, :H, :W] + t_fin[None] * bg[:, None, None]
        ll1 = l1_loss(rgb, gt)
        loss = (1 - lam_dssim) * ll1 + lam_dssim * (1.0 - ssim(rgb, gt))
        nloss = jnp.float32(0.0)
        if use_normal_loss:
            nloss = loss_normal_guidance(
                out[4:8, :H, :W], out[8:11, :H, :W], normal)
            loss = loss + lam_dnormal * nloss * normal_valid
        from ..boxmodel import safe_norm

        # safe_norm, NOT jnp.linalg.norm: NaN gradient at the identity
        # init would freeze the deltas via the NaN guard (boxmodel.py).
        reg_each = (
            safe_norm(deltas.delta_r - jnp.array([1.0, 0, 0, 0]))
            + safe_norm(deltas.delta_s - 1.0)
            + safe_norm(deltas.delta_t))
        reg = jnp.sum(reg_each * active.astype(jnp.float32))
        loss = loss + boxmodel_lambda_reg * reg
        g_loss = jnp.float32(0.0)
        p_loss = jnp.float32(0.0)
        if perceptual_lam:
            from ..losses.perceptual import vgg_perceptual_loss

            p_loss = vgg_perceptual_loss(extras["vgg_params"], rgb, gt)
            loss = loss + perceptual_lam * p_loss
        if guidance is not None:
            # Augmented view through the tile-sharded path (static field
            # only, reference train.py:177 ignores boxes for the aug render).
            Ha, Wa = aug_cam.height, aug_cam.width
            arrays_s = field_arrays(field, active_sh_degree)
            aug_loc, _, _ = tile_render_local(
                plan_aug, extras["aug_cam"], raster_cfg, sh_total_degree,
                arrays_s.means, arrays_s.quats, arrays_s.scales,
                arrays_s.opacities, arrays_s.shs, arrays_s.valid,
                means2d_offset=None)
            aug = jax.lax.all_gather(aug_loc, TILE_AXIS, axis=1, tiled=True)
            t_a = aug[blend_ref.N_ACCUM, :Ha, :Wa]
            rgb_a = aug[0:3, :Ha, :Wa] + t_a[None] * bg[:, None, None]
            crop = jax.lax.dynamic_slice(
                rgb_a, (0, 0, extras["crop_start"]), (3, Ha, Ha))
            g_loss = guidance(extras["gkey"], crop, step)
            loss = loss + g_loss
        # /ndev: identical loss on every shard — see make_tp_train_step.
        return loss / ndev, (proj.radii, ll1, nloss, loss, cap_info, g_loss,
                             p_loss)

    def sharded_body(field, opt_state, stats, step, bfields, box_opt,
                     box_stats, deltas, delta_opt, box2worlds, active,
                     cam, gt, normal, normal_valid, active_sh_degree, bg,
                     extras=None):
        c_loc = field.capacity
        bcap_loc = bfields.means.shape[1]
        static_params = optim.split_params(field)
        box_params = optim.split_params(bfields)
        delta_params = dict(delta_r=deltas.delta_r, delta_s=deltas.delta_s,
                            delta_t=deltas.delta_t)
        m2d = jnp.zeros((c_loc + n_box_slots * bcap_loc, 2), jnp.float32)

        (_, aux), grads = jax.value_and_grad(
            local_loss, argnums=(0, 1, 2, 7), has_aux=True)(
            static_params, box_params, delta_params, field, bfields,
            box2worlds, active, m2d, cam, gt, normal, normal_valid,
            active_sh_degree, bg, step, extras)
        g_static, g_box, g_delta, g_m2d = grads
        radii, ll1, nloss, loss, (dropped, needed, needed_ex), g_loss, p_loss = aux

        # Deltas are replicated: psum restores the full gradient (render
        # contributions land on the owning shard; the regularizer
        # contributes 1/D per device). NaN guard per reference
        # train.py:198-205.
        g_delta = jax.tree.map(
            lambda g: jnp.nan_to_num(jax.lax.psum(g, TILE_AXIS), nan=0.0),
            g_delta)

        # -- static shard update -----------------------------------------
        lrs = optim.field_lrs(opt_cfg, spatial_scale, step)
        new_field, new_opt = optim.adam_step(field, g_static, opt_state, lrs)
        norm_c, vis_c, rad_c = densify.stats_contribution(
            g_m2d[:c_loc], radii[:c_loc], H, W)
        new_stats = densify.apply_stats(stats, norm_c, vis_c, rad_c)

        # -- box shard update (no spatial scale on box LRs) ---------------
        box_lrs = optim.field_lrs(opt_cfg, 1.0, step,
                                  xyz_lr_mult=box_lr_mult)
        bf2, bopt2 = optim.adam_step(bfields, g_box, box_opt, box_lrs)

        def sel_mask(mask):
            def sel(new, old):
                m = mask.reshape((-1,) + (1,) * (new.ndim - 1))
                return jnp.where(m, new, old)
            return sel

        sel_act = sel_mask(active)
        bf2 = jax.tree.map(sel_act, bf2, bfields)
        bopt2 = optim.AdamState(
            mu=jax.tree.map(sel_act, bopt2.mu, box_opt.mu),
            nu=jax.tree.map(sel_act, bopt2.nu, box_opt.nu),
            count=bopt2.count)
        g_box_m2d = g_m2d[c_loc:].reshape(n_box_slots, bcap_loc, 2)
        b_radii = radii[c_loc:].reshape(n_box_slots, bcap_loc)
        bnorm, bvis, brad = jax.vmap(
            lambda g, r: densify.stats_contribution(g, r, H, W)
        )(g_box_m2d, b_radii)
        bstats2 = jax.vmap(densify.apply_stats)(box_stats, bnorm, bvis, brad)

        # -- replicated delta update (identical on every device) ----------
        nd2, ndo2 = optim.tensor_adam_step(delta_params, g_delta, delta_opt,
                                           boxmodel_lr)
        nd2 = {k: sel_act(v, getattr(deltas, k)) for k, v in nd2.items()}
        new_deltas = BoxDeltas(**nd2)

        metrics = {"loss": loss, "l1": ll1, "normal_loss": nloss,
                   "num_dropped": dropped, "num_needed": needed,
                   "num_needed_exch": needed_ex}
        if guidance is not None:
            metrics["guidance_loss"] = g_loss
        if perceptual_lam:
            metrics["perceptual_loss"] = p_loss
        return (new_field, new_opt, new_stats, step + 1, bf2, bopt2,
                bstats2, new_deltas, ndo2, metrics)

    row = P(TILE_AXIS)
    brow = P(None, TILE_AXIS)
    field_spec = GaussianField(
        means=row, quats=row, log_scales=row, sh_dc=row, sh_rest=row,
        opacity_logit=row, valid=row)
    opt_spec = optim.AdamState(mu=field_spec, nu=field_spec, count=P())
    stats_spec = DensifyStats(
        max_radii2d=row, xyz_gradient_accum=row, denom=row)
    bfield_spec = GaussianField(
        means=brow, quats=brow, log_scales=brow, sh_dc=brow, sh_rest=brow,
        opacity_logit=brow, valid=brow)
    bopt_spec = optim.AdamState(mu=bfield_spec, nu=bfield_spec, count=P())
    bstats_spec = DensifyStats(
        max_radii2d=brow, xyz_gradient_accum=brow, denom=brow)
    cam_spec = CameraParams(
        viewmatrix=P(), projmatrix=P(), campos=P(),
        tan_fovx=P(), tan_fovy=P(), height=H, width=W)

    in_specs = [field_spec, opt_spec, stats_spec, P(), bfield_spec,
                bopt_spec, bstats_spec, P(), P(), P(), P(), cam_spec,
                P(), P(), P(), P(), P()]
    if guidance is not None or perceptual_lam:
        extras_spec = {}
        if guidance is not None:
            extras_spec.update(
                aug_cam=CameraParams(
                    viewmatrix=P(), projmatrix=P(), campos=P(),
                    tan_fovx=P(), tan_fovy=P(),
                    height=aug_cam.height, width=aug_cam.width),
                crop_start=P(), gkey=P())
        if perceptual_lam:
            extras_spec["vgg_params"] = P()
        in_specs.append(extras_spec)

    smapped = shard_map(
        sharded_body,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(field_spec, opt_spec, stats_spec, P(), bfield_spec,
                   bopt_spec, bstats_spec, P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(smapped)


def tp_densify_and_prune(
    mesh,
    field: GaussianField,
    opt,
    stats: DensifyStats,
    key: jax.Array,
    *,
    grad_threshold: float,
    percent_dense: float,
    extent: float,
    min_opacity: float = 0.005,
    max_screen_size: int = 0,
    capacity_headroom: float = 1.0,
):
    """Shard-local densify/prune of a sharded (field, Adam, stats) triple.

    The clone/split/prune decisions are purely row-local (densify_masks), so
    each device recompacts ITS OWN rows — children land on the parent's
    shard; no resharding, no communication. Like the single-device
    densify_and_prune this is host-driven: the per-shard output capacity is
    the max requirement over shards (shards stay equal-sized so the state
    remains a plain [D*cap_loc, ...] sharded array), rounded to a bucket so
    recompilation amortizes. Returns (field, opt, stats, n_active_total).
    """
    from ..gaussians import round_capacity

    axis = mesh.axis_names[-1] if TILE_AXIS in mesh.axis_names else (
        mesh.axis_names[0])
    D = mesh.shape[axis]
    import numpy as np

    masks = densify.densify_masks(
        field, stats, grad_threshold, percent_dense, extent,
        min_opacity, max_screen_size)
    clone, split, prune = masks
    keep = field.valid & ~prune & ~split

    def per_shard(m):
        return np.asarray(m).reshape(D, -1).sum(axis=1)

    n_out = (per_shard(keep) + per_shard(clone) + 2 * per_shard(split))
    cap_loc = round_capacity(int(n_out.max() * capacity_headroom) + 1,
                             multiple=512)
    keys = jax.random.split(key, D)

    row = P(axis)
    field_spec = GaussianField(
        means=row, quats=row, log_scales=row, sh_dc=row, sh_rest=row,
        opacity_logit=row, valid=row)
    opt_spec = optim.AdamState(mu=field_spec, nu=field_spec, count=P())
    stats_spec = DensifyStats(
        max_radii2d=row, xyz_gradient_accum=row, denom=row)

    def body(field, opt, clone, split, prune, keys):
        f, o, s, n = densify._recompact(
            field, opt, (clone, split, prune), cap_loc, keys[0])
        return f, o, s, jax.lax.psum(n, axis)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(field_spec, opt_spec, row, row, row, row),
        out_specs=(field_spec, opt_spec, stats_spec, P()),
        check_vma=False)
    new_field, new_opt, new_stats, n_total = jax.jit(fn)(
        field, opt, clone, split, prune, keys)
    return new_field, new_opt, new_stats, int(n_total)
