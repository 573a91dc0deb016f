"""Tile-axis sharded rasterization with all-to-all splat exchange.

Second slice of the SURVEY §2.5 plan (the sequence-parallel analog: "shard
the H×W pixel/tile axis; ring = neighbor exchange of boundary-crossing
Gaussian splats between tile shards over ICI"). One mesh axis plays both
roles:

  * front end — each device holds a GAUSSIAN shard (N/D rows): projection,
    payload build, tile expansion, cull and the (tile, depth) sort all run
    on N/D-proportional data. Nothing is replicated.
  * splat exchange — the image's tile rows are block-sharded on the same
    axis (device d owns tile rows [d·nty/D, (d+1)·nty/D)). Because the
    local instance stream is sorted by tile id, the instances destined to
    each tile shard form CONTIGUOUS ranges; they are cut into fixed-size
    buckets and delivered with ONE jax.lax.all_to_all over ICI.
  * back end — each device depth-sorts the splats it received (a stable
    merge of D pre-sorted runs), re-lays them into the chunk-aligned
    per-tile layout, and blends ONLY its own tile rows.

Every step is differentiable (the exchange transposes to the reverse
all_to_all; bucket/relayout gathers transpose to unique-index scatters;
the per-Gaussian payload expansion reuses rasterize.gather_expand's
segment-reduce custom VJP), so the same wrapper trains — gradients arrive
pre-sharded on each device's own Gaussians.

Tie-ordering note: sorted ties (equal quantized (tile, depth) keys) resolve
to ascending GLOBAL Gaussian index here exactly as in the single-device
path — devices hold contiguous index ranges, all_to_all preserves source
order, and the receive-side sort is stable — so images are bit-identical
to `ops.rasterize`, not merely close (tested on an 8-device CPU mesh).

Replaces (TPU-natively) the reference's single-GPU whole-image rasterizer
call, /root/reference/gaussian_renderer/__init__.py:86-94; the reference has
no multi-device story at all (SURVEY §2.5).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from .. import geometry
from ..ops import binning, blend_ref
from ..ops.binning import PAD_ALIGN, SENTINEL, TileGrid
from ..ops.projection import CameraParams, project
from ..ops.rasterize import (AUX_COLS, RasterizeConfig,
                             assemble_dense_payload, build_payload,
                             gather_expand)

TILE_AXIS = "shard"


def make_tile_mesh(n_devices: int) -> jax.sharding.Mesh:
    import numpy as np

    return jax.sharding.Mesh(
        np.array(jax.devices()[:n_devices]), (TILE_AXIS,))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class TilePlan(NamedTuple):
    """Static shard-geometry for one (camera, mesh-size, config) triple."""
    ndev: int
    grid: TileGrid
    nty_loc: int
    tiles_loc: int
    hp_loc: int
    wp: int
    k_loc: int
    k_ex: int
    r_total: int
    k_blend: int
    aux_dtype: object


def make_tile_plan(ndev: int, cam: CameraParams, config: RasterizeConfig,
                   k_exch: int | None = None) -> TilePlan:
    H, W = cam.height, cam.width
    # Tile grid whose row count divides the mesh axis.
    base = TileGrid.for_image(H, W, config.tile_h, config.tile_w)
    nty = _round_up(base.nty, ndev)
    grid = TileGrid(config.tile_h, config.tile_w, base.ntx, nty)
    assert grid.num_tiles <= binning.MAX_TILES
    nty_loc = nty // ndev
    tiles_loc = nty_loc * grid.ntx
    k_loc = _round_up(max(config.k_cap // ndev, PAD_ALIGN), 512)
    k_ex = k_loc if k_exch is None else _round_up(k_exch, 8)
    r_total = ndev * k_ex  # rows received per device
    return TilePlan(
        ndev=ndev, grid=grid, nty_loc=nty_loc, tiles_loc=tiles_loc,
        hp_loc=nty_loc * grid.tile_h, wp=grid.ntx * grid.tile_w,
        k_loc=k_loc, k_ex=k_ex, r_total=r_total,
        k_blend=_round_up(r_total + tiles_loc * PAD_ALIGN, 512),
        aux_dtype=(jnp.bfloat16 if config.payload_dtype == "bf16"
                   else jnp.float32))


def tile_render_local(plan: TilePlan, cam: CameraParams,
                      config: RasterizeConfig, sh_degree: int,
                      means, quats, scales, opac, shs, valid,
                      means2d_offset=None):
    """Per-device body (call INSIDE shard_map over the `shard` axis): render
    this device's tile rows from its Gaussian shard. Returns
    (out_local [12, hp_loc, wp], proj (this shard's projection — radii /
    means2d for densify stats), (dropped, needed) scalars reduced over the
    axis — dropped is the psum of capacity losses; needed is the max local
    pre-cap instance requirement scaled to GLOBAL k_cap units (x ndev), the
    signal a k_cap adaptation policy compares against config.k_cap)."""
    grid, nty_loc = plan.grid, plan.nty_loc
    tiles_loc, hp_loc, wp = plan.tiles_loc, plan.hp_loc, plan.wp
    k_loc, k_ex, r_total, k_blend = (plan.k_loc, plan.k_ex, plan.r_total,
                                     plan.k_blend)
    ndev, aux_dtype = plan.ndev, plan.aux_dtype

    n_loc = means.shape[0]
    # ---- local front end: project + payload on the Gaussian shard ----
    cov6 = geometry.cov6_from_scaling_rotation(scales, quats)
    proj = project(means, cov6, opac, shs, cam, sh_degree=sh_degree,
                   valid=valid, means2d_offset=means2d_offset)
    quat_n = geometry.quat_standardize(geometry.quat_normalize(quats))
    pay_f32, pay_aux = build_payload(proj, quat_n, scales, aux_dtype)

    rb = binning.bin_raw(
        jax.lax.stop_gradient(proj.means2d),
        jax.lax.stop_gradient(proj.depths),
        proj.radii_xy, grid, k_loc,
        conics=jax.lax.stop_gradient(proj.conics),
        opacities=jax.lax.stop_gradient(proj.opacities),
        # Honor the config's cull_compact switch exactly like rasterize()
        # does. NOTE: "auto" gates on the SHARD-LOCAL n here (n_loc =
        # n_global / ndev), which is the right scale — the per-Gaussian
        # J-scans whose cost the gate trades off run on the shard.
        compact=(None if config.cull_compact == "auto"
                 else bool(config.cull_compact)))

    # Per-Gaussian -> per-instance expansion in SORTED-stream order,
    # with the segment-reduce backward (order = raw slot -> sorted pos,
    # the inverse of the sort's rawslot permutation).
    iota = jnp.arange(k_loc, dtype=jnp.int32)
    _, order_raw = jax.lax.sort((rb.rawslot_sorted, iota), num_keys=1)
    ends_l = jnp.minimum(rb.cum, k_loc)
    ends = jnp.concatenate([ends_l, ends_l[-1:]])
    st_pf, st_pa = gather_expand(
        jnp.pad(pay_f32, ((0, 1), (0, 0))),
        jnp.pad(pay_aux, ((0, 1), (0, 0))),
        rb.gidx_sorted, order_raw, ends)

    # ---- cut the sorted stream into destination-shard buckets --------
    # Destination ranges are contiguous (the stream is tile-sorted):
    # bucket d spans sorted positions [bstart[d], bstart[d+1]).
    shard_bounds = jnp.arange(ndev + 1, dtype=jnp.int32) * tiles_loc
    bstart = rb.raw_starts[shard_bounds]                     # [D+1]
    bucket_sizes = bstart[1:] - bstart[:-1]
    dropped_exch = jnp.sum(jnp.maximum(bucket_sizes - k_ex, 0))
    # Exchange-capacity signal: the largest (src, dst) bucket anywhere on
    # the mesh — the smallest lossless k_exch. On a balanced scene this is
    # ~k_cap/D^2, far below the lossless-default k_loc; callers can size
    # k_exch by it (SCALING overhead model).
    needed_exch = jax.lax.pmax(jnp.max(bucket_sizes), TILE_AXIS)
    if ndev == 1:
        # Degenerate mesh: the local stream IS the final stream — skip the
        # bucket gathers, the identity all_to_all, and the receive-side
        # merge sort (r_total == k_loc, tile_base == 0). This is also what
        # bounds the sharded path's fixed overhead at D=1 (SCALING model):
        # what remains vs ops.rasterize is the sorted-order payload
        # expansion + the carry re-gather into the padded layout.
        key_sorted = rb.key_sorted
        recv_sorted = jnp.arange(r_total, dtype=jnp.int32)
        raw_starts_l = rb.raw_starts
        pf_r, pa_r = st_pf, st_pa
    else:
        j = jnp.arange(k_ex, dtype=jnp.int32)
        idx = bstart[:-1, None] + j[None, :]                 # [D, k_ex]
        ok = idx < bstart[1:, None]
        # Invalid slots read the appended zero row (keeps the gather's
        # transpose a unique-index scatter — no cotangent collisions).
        idx_safe = jnp.where(ok, idx, k_loc).reshape(-1)     # [D*k_ex]
        keys_b = jnp.where(ok.reshape(-1),
                           rb.key_sorted[jnp.minimum(idx, k_loc - 1)
                                         .reshape(-1)], SENTINEL)
        pf_b = jnp.concatenate([st_pf, jnp.zeros((1, 8), st_pf.dtype)]
                               )[idx_safe]
        pa_b = jnp.concatenate(
            [st_pa, jnp.zeros((1, AUX_COLS), st_pa.dtype)])[idx_safe]

        # ---- the exchange: one all_to_all delivers every bucket ------
        keys_r = jax.lax.all_to_all(keys_b, TILE_AXIS, 0, 0, tiled=True)
        pf_r = jax.lax.all_to_all(pf_b, TILE_AXIS, 0, 0, tiled=True)
        pa_r = jax.lax.all_to_all(pa_b, TILE_AXIS, 0, 0, tiled=True)

        # ---- local back end: merge-sort received runs ----------------
        me = jax.lax.axis_index(TILE_AXIS)
        tile_base = (me * tiles_loc).astype(jnp.int32)
        key_loc = jnp.where(
            keys_r == SENTINEL, SENTINEL,
            keys_r - jax.lax.shift_left(tile_base, grid.tile_shift))
        recv_iota = jnp.arange(r_total, dtype=jnp.int32)
        key_sorted, recv_sorted = jax.lax.sort(
            (key_loc, recv_iota), num_keys=1)
        queries = jax.lax.shift_left(
            jnp.arange(tiles_loc + 1, dtype=jnp.int32), grid.tile_shift)
        raw_starts_l = jnp.searchsorted(
            key_sorted, queries, side="left").astype(jnp.int32)
    carry, keys_pad, tile_starts, _ = binning.pad_relayout(
        key_sorted, recv_sorted, raw_starts_l, tiles_loc, k_blend,
        dummy=r_total, want_keys=(config.backend == "dense"))
    pf_pad = jnp.concatenate([pf_r, jnp.zeros((1, 8), pf_r.dtype)]
                             )[carry]
    pa_pad = jnp.concatenate(
        [pa_r, jnp.zeros((1, AUX_COLS), pa_r.dtype)])[carry]
    # The local blend addresses pixels in LOCAL row coordinates: shift
    # the splat means' y into this shard's frame (a linear reindex —
    # gradients are unaffected).
    y_off = (me * hp_loc).astype(pf_pad.dtype)
    pf_pad = pf_pad.at[:, 1].add(-y_off)

    grid_loc = TileGrid(grid.tile_h, grid.tile_w, grid.ntx, nty_loc)
    if config.backend == "dense":
        out = blend_ref.blend_dense(
            assemble_dense_payload(pf_pad, pa_pad), keys_pad, tile_starts,
            grid_loc, hp_loc, wp)
    else:
        from ..ops import blend_pallas

        out = blend_pallas.blend(
            pf_pad.T, pa_pad.T, tile_starts, grid_loc, hp_loc, wp,
            chunk=config.blend_chunk)
    dropped = jax.lax.psum(rb.total - rb.num_raw + dropped_exch,
                           TILE_AXIS)
    # k_loc = k_cap/ndev, so the worst shard's raw requirement x ndev is the
    # smallest global k_cap that would have admitted every instance (the
    # analog of the single-device num_needed, rasterize.py's
    # tile_starts[-1], in the units Trainer._adapt_k_cap compares).
    # Saturating multiply: rb.total is int32 and a worst shard near 2^31/D
    # would wrap when scaled by ndev — clamp the local total first so the
    # adapter sees INT32_MAX (still "grow") instead of a negative number.
    needed = jnp.minimum(jax.lax.pmax(rb.total, TILE_AXIS),
                         (2**31 - 1) // max(ndev, 1)) * ndev
    return out, proj, (dropped, needed, needed_exch)


def make_tile_sharded_rasterize(mesh, cam: CameraParams,
                                config: RasterizeConfig,
                                sh_degree: int = 3,
                                k_exch: int | None = None):
    """Build a jitted fn(means, quats, scales, opac, shs, valid, bg) ->
    (rgb [3,H,W], depth [1,H,W], alpha [1,H,W]) with per-Gaussian inputs
    SHARDED on axis 0 and the blend sharded over tile rows.

    `config.k_cap` is the GLOBAL instance capacity; each device's local
    stream capacity is k_cap / D. `k_exch` is the per-(src, dst) exchange
    bucket capacity (default: the full local capacity — lossless; shrink it
    to trade memory for a bounded per-pair drop, reported like k_cap drops).
    """
    ndev = mesh.devices.size
    H, W = cam.height, cam.width
    plan = make_tile_plan(ndev, cam, config, k_exch)

    def body(means, quats, scales, opac, shs, valid, bg):
        out, _, (dropped, _, _) = tile_render_local(
            plan, cam, config, sh_degree,
            means, quats, scales, opac, shs, valid)
        t_fin = out[blend_ref.N_ACCUM]
        rgb = out[0:3] + t_fin[None] * bg[:, None, None]
        return rgb, out[3:4], 1.0 - t_fin[None], dropped

    smapped = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(TILE_AXIS), P(TILE_AXIS), P(TILE_AXIS),
                  P(TILE_AXIS), P(TILE_AXIS), P(TILE_AXIS), P()),
        out_specs=(P(None, TILE_AXIS, None), P(None, TILE_AXIS, None),
                   P(None, TILE_AXIS, None), P()),
        check_vma=False,
    )

    def run(means, quats, scales, opac, shs, valid, bg):
        rgb, depth, alpha, dropped = smapped(
            means, quats, scales, opac, shs, valid, bg)
        return (rgb[:, :H, :W], depth[:, :H, :W], alpha[:, :H, :W], dropped)

    return jax.jit(run)
