"""End-to-end differentiable Gaussian rasterization.

Mirrors the Python-visible API of the reference's CUDA extension
(`GaussianRasterizer.__call__`, /root/reference/gaussian_renderer/__init__.py:86-119):
6 outputs — rgb [3,H,W], depth [1,H,W], per-pixel covariance quaternion
[4,H,W], per-pixel covariance scale [3,H,W], alpha [1,H,W], radii [N] — plus
the screen-space gradient tap used for densification statistics.

TPU-first pipeline: project (XLA, autodiff) → bin+sort (XLA index math) →
gather payload (XLA; custom-VJP segment-reduce backward) → blend (Pallas
custom-VJP kernel, or the dense XLA reference for tests).

Mixed-precision payload (round-2 perf rework): the per-Gaussian payload is
split into an 8-column f32 table (pixel means, conic, opacity, depth — the
precision-critical geometry) and a 16-column bf16 table (rgb, quat, scale —
tolerant channels). Both hit the TPU's fast 32-byte-row aligned-gather path:
measured on v5e, a [2M] row gather costs 12.5 ms (f32 row-8) + 13 ms (bf16
row-16) versus 37 ms for a single f32 row-24 table — and the blend kernels'
HBM traffic drops 96 → 64 B/instance. `RasterizeConfig.payload_dtype`
selects "bf16" (default on TPU) or "f32" (exact; golden tests).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .. import geometry
from . import binning, blend_ref
from .projection import CameraParams, Projected, project

F32_COLS = 8   # mx, my, conic_a, conic_b, conic_c, opacity, depth, (pad)
AUX_COLS = 16  # r, g, b, qw, qx, qy, qz, sx, sy, sz, (pad x6)

# sat_cull="auto" gate: enable the saturation prepass once the mean
# instance depth (k_cap / num_tiles = superchunks x PAD_ALIGN per tile)
# is deep enough that per-tile saturated suffixes exist at superchunk
# granularity. Measured on the bench scene family: 458 slots/tile (500k)
# -> 0% cullable; 2300 slots/tile (2.23M) -> ~80% cullable.
SAT_MIN_SLOTS_PER_TILE = 1024


class RasterizeConfig(NamedTuple):
    tile_h: int = 16
    tile_w: int = 16
    k_cap: int = 1 << 22       # raw instance capacity (tile-expanded)
    backend: str = "auto"      # 'dense' | 'pallas' | 'auto'
    clamp_radius: int = 0      # 0 = unbounded footprint
    payload_dtype: str = "bf16"  # 'bf16' | 'f32' — rgb/quat/scale payload
    blend_chunk: int = 256     # instances per blend compute chunk (128|256)
    forward_only: bool = False  # skip backward-only binning byproducts
    #                             (inference paths: video/eval). Gradients
    #                             still flow but via XLA's slow scatter-add
    #                             transpose — don't train with this set.
    k_pad: int = 0             # padded-layout capacity (0 = k_cap); the
    #                            padded need (kept + per-tile PAD_ALIGN
    #                            rounding) can exceed the post-cull raw
    #                            need — splitting lets sort/segreduce run
    #                            at the smaller size (binning.bin_gaussians)
    cull_compact: object = "auto"  # pre-assignment cull of small rects
    #                            (binning.J_CAP): "auto" = on up to the
    #                            measured TPU crossover (binning.
    #                            COMPACT_MAX_N); True/False force it
    sat_cull: object = "auto"  # saturation prepass (ops/satcull.py): clip
    #                            each tile's instance stream to its
    #                            provably-contributing prefix BEFORE the
    #                            padded relayout, so relayout/gather/blend/
    #                            backward all run at the compacted size.
    #                            Lossless w.r.t. the blend spec. "auto" =
    #                            on for the pallas backend when the mean
    #                            instance depth reaches SAT_MIN_SLOTS_PER_
    #                            TILE (at the 500k bench nothing saturates
    #                            — 0% cullable, measured — so the prepass
    #                            would be pure overhead; at 2.23M it culls
    #                            ~80%); dense (golden) keeps the full
    #                            stream. True/False force it.


def _blocked_cumsum(x: jax.Array, block: int = 512) -> jax.Array:
    """Two-level inclusive cumsum over axis 0 (numerically stabler than one
    long scan and faster on TPU). x: [K, C], K % block == 0."""
    k, c = x.shape
    xb = x.reshape(k // block, block, c)
    inner = jnp.cumsum(xb, axis=1)
    tot = inner[:, -1]
    prefix = jnp.cumsum(tot, axis=0) - tot
    return (inner + prefix[:, None, :]).reshape(k, c)


def _gather_rows_aux(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Row gather of a [R, 16] bf16 (or f32) table.

    bf16 rows are bitcast to [R, 8] int32 first: the int32 row-8 gather hits
    the TPU fast aligned path (~7 ms at 2M rows) while the same 32-byte rows
    gathered as bf16x16 cost ~23 ms (measured, v5e)."""
    if table.dtype == jnp.bfloat16:
        t32 = jax.lax.bitcast_convert_type(
            table.reshape(table.shape[0], 8, 2), jnp.int32)
        g = t32[idx]
        return jax.lax.bitcast_convert_type(g, jnp.bfloat16).reshape(
            idx.shape[0], 16)
    return table[idx]


def build_payload(proj, quat_n: jax.Array, scales: jax.Array, aux_dtype):
    """THE mixed-precision payload layout (single source of truth; consumed
    by every blend path — single-device, gauss-sharded, tile-sharded).

    pay_f32 [N, 8]:  means2d (0:2), conics (2:5), opacity (5), depth (6),
                     pad (7).
    pay_aux [N, 16]: rgb (0:3), quat (3:7), scale (7:10), pad (10:16),
                     cast to `aux_dtype` (bf16 in production).
    """
    n = proj.means2d.shape[0]
    pay_f32 = jnp.concatenate(
        [proj.means2d, proj.conics, proj.opacities[:, None],
         proj.depths[:, None], jnp.zeros((n, 1), jnp.float32)],
        axis=1)
    pay_aux = jnp.concatenate(
        [proj.rgb, quat_n, scales,
         jnp.zeros((n, AUX_COLS - 10), jnp.float32)],
        axis=1).astype(aux_dtype)
    return pay_f32, pay_aux


def assemble_dense_payload(pf: jax.Array, pa: jax.Array) -> jax.Array:
    """Reassemble expanded (pf [K,8], pa [K,16]) rows into the classic
    [17, K] f32 column layout the golden blend_ref consumes."""
    pa_f = pa.astype(jnp.float32)
    return jnp.concatenate(
        [pf[:, :6], pa_f[:, 0:3], pf[:, 6:7], pa_f[:, 3:10]], axis=1).T


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def gather_expand(pay_f32: jax.Array, pay_aux: jax.Array, gidx: jax.Array,
                  order: jax.Array, ends: jax.Array):
    """Expand per-Gaussian payload tables to per-instance rows.

    pay_f32 [n+1, 8] f32, pay_aux [n+1, 16] (bf16|f32), gidx [K] int32
    -> (pf [K, 8] f32, pa [K, 16] aux-dtype).

    `order` ([K] int32: raw instance -> padded slot, K = dropped) and `ends`
    ([n+1] int32: exclusive end of each Gaussian's raw-instance range) come
    from binning (Binned.order / Binned.gauss_ends padded with one dummy
    entry) — they are byproducts of binning's own sorts, which kills the
    backward's former sort + searchsorted precompute (~26 ms at 2M).

    Custom VJP: XLA's transpose of this gather is a scatter-add with
    colliding indices (~410 ms at 2M instances). The backward instead
    gathers the cotangent rows into RAW (gaussian-grouped) order via
    `order` and segment-reduces them (Pallas membership-matmul kernel on
    TPU; blocked cumsum + boundary diff elsewhere).
    """
    if pay_aux.dtype == jnp.bfloat16 and jax.default_backend() == "tpu":
        # ONE fused 64-byte-row gather (measured ~2x the two row-8 gathers'
        # throughput at the bench shape, r05_gebwd2.py): pack both tables
        # as [n+1, 16] int32, gather, unpack.
        n1 = pay_f32.shape[0]
        k = gidx.shape[0]
        packed = jnp.concatenate(
            [jax.lax.bitcast_convert_type(pay_f32, jnp.int32),
             jax.lax.bitcast_convert_type(
                 pay_aux.reshape(n1, 8, 2), jnp.int32)], axis=1)
        g = packed[gidx]
        pf = jax.lax.bitcast_convert_type(g[:, :8], jnp.float32)
        pa = jax.lax.bitcast_convert_type(
            g[:, 8:], jnp.bfloat16).reshape(k, 16)
        return pf, pa
    return pay_f32[gidx], _gather_rows_aux(pay_aux, gidx)


def _ge_fwd(pay_f32, pay_aux, gidx, order, ends):
    return gather_expand(pay_f32, pay_aux, gidx, order, ends), (order, ends)


def _unpack_to_cm(g16: jax.Array, k: int) -> jax.Array:
    """[K, 16] int32 (8 f32-bitcast + 8 bf16-pair-bitcast cols) -> [24, K]
    f32 channel-major, aux re-interleaved to original column order."""
    gT = g16.T                                   # [16, K]
    g_f = jax.lax.bitcast_convert_type(gT[:8], jnp.float32)
    aux = gT[8:]
    # bf16 -> f32 upcast is exactly a 16-bit left shift (lo half) / a
    # high-half mask (hi half) of the packed int32.
    lo = jax.lax.bitcast_convert_type(jax.lax.shift_left(aux, 16), jnp.float32)
    hi = jax.lax.bitcast_convert_type(
        jnp.bitwise_and(aux, jnp.int32(-65536)), jnp.float32)
    inter = jnp.stack([lo, hi], axis=1).reshape(16, k)
    return jnp.concatenate([g_f, inter], axis=0)


def _ge_bwd(res, cots):
    order, ends = res
    d_pf, d_pa = cots
    aux_dtype = d_pa.dtype
    k = d_pf.shape[0]        # padded rows (k_pad): where cotangents live
    kr = order.shape[0]      # raw rows (k_cap): the reduce's working set
    n1 = ends.shape[0]
    from . import segreduce

    if (aux_dtype == jnp.bfloat16 and kr >= segreduce.RC and kr % 128 == 0
            and jax.default_backend() == "tpu"):
        # Production TPU path (round-3 rework, r05_segreduce2.py: 11.2 ms vs
        # 25.1 for the XLA path at the bench shape): ONE fused 64-byte-row
        # gather of both cotangent halves packed as [k_pad, 16] int32 into
        # RAW order ([kr, 16]), then the Pallas streaming segment-reduce
        # (membership-matmul) instead of cumsum + boundary gather + diff.
        packed = jnp.concatenate(
            [jax.lax.bitcast_convert_type(d_pf, jnp.int32),
             jax.lax.bitcast_convert_type(d_pa.reshape(k, 8, 2), jnp.int32)],
            axis=1)                                          # [k_pad, 16]
        dead = (order >= k)[:, None]
        g = jnp.where(dead, 0, packed[jnp.where(dead[:, 0], 0, order)])
        ng = -(-n1 // segreduce.GB) * segreduce.GB
        ends_p = jnp.concatenate(
            [ends, jnp.broadcast_to(ends[-1:], (ng - n1,))])
        starts_p = jnp.concatenate([jnp.zeros(1, jnp.int32), ends_p[:-1]])
        out = segreduce.segment_reduce_cols(
            _unpack_to_cm(g, kr), starts_p, ends_p)          # [24, NG]
        return (out[:F32_COLS, :n1].T,
                out[F32_COLS:, :n1].T.astype(aux_dtype),
                None, None, None)

    # XLA fallback (f32 payload / golden paths, CPU meshes, tiny k_cap).
    # order == k_pad marks dropped / nonexistent raw instances: clamp the
    # index and mask the row to zero after the gather (padding the tables
    # with zero rows instead costs two full-table copies, ~3 ms at 2M).
    dead = (order >= k)[:, None]
    order_c = jnp.where(dead[:, 0], 0, order)
    g_f = jnp.where(dead, 0.0, d_pf[order_c])                # [K, 8] f32
    g_a = jnp.where(dead, 0.0,
                    _gather_rows_aux(d_pa, order_c).astype(jnp.float32))
    # Cumsum the f32/aux halves separately: concatenating them first costs a
    # [K, 24] materialization (~190 MB of extra HBM traffic at 2M).
    cum_f = _blocked_cumsum(g_f)                             # [K, 8] inclusive
    cum_a = _blocked_cumsum(g_a)                             # [K, 16]
    # Segment sums via the INCLUSIVE cumsum: S(e) = cum[e-1] for e > 0 else 0
    # (gathering at ends-1 with an e==0 mask avoids prepending a zero row —
    # a full [K+1, 24] copy). d_rows[g] = S(ends[g]) - S(ends[g-1]), and
    # ends[g-1] == starts[g], so one gather + one row shift suffices.
    e_idx = jnp.maximum(ends - 1, 0)
    nonempty = (ends > 0).astype(jnp.float32)[:, None]
    Cf = cum_f[e_idx] * nonempty                             # [n+1, 8]
    Ca = jnp.concatenate(
        [cum_a[:, :8][e_idx], cum_a[:, 8:][e_idx]], axis=1) * nonempty
    C = jnp.concatenate([Cf, Ca], axis=1)                    # [n+1, 24]
    d_rows = C - jnp.concatenate([jnp.zeros((1, 24), C.dtype), C[:-1]], axis=0)
    return (d_rows[:, :F32_COLS], d_rows[:, F32_COLS:].astype(aux_dtype),
            None, None, None)


gather_expand.defvjp(_ge_fwd, _ge_bwd)


class RasterOut(NamedTuple):
    rgb: jax.Array        # [3, H, W] (background composited)
    depth: jax.Array      # [1, H, W]
    cov_quat: jax.Array   # [4, H, W]
    cov_scale: jax.Array  # [3, H, W]
    alpha: jax.Array      # [1, H, W]
    radii: jax.Array      # [N] int32
    means2d: jax.Array    # [N, 2] pixel coords (for densify-stat gradients)
    num_dropped: jax.Array  # scalar int32 — instances dropped at k_cap
    num_needed: jax.Array   # scalar int32 — padded-layout slots actually
    #                         used (tile_starts[-1]); k_pad decay signal
    num_needed_raw: jax.Array  # scalar int32 — raw-stream requirement
    #                         (pre-cull instance total); k_cap decay signal.
    #                         With sat_cull the padded need is ~5x smaller
    #                         than this, so the two caps adapt separately.


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
        # Scalar-form covariance: no [N,3,3] intermediates (see geometry).
        cov6 = geometry.cov6_from_scaling_rotation(scales, quats, scale_modifier)

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

    aux_dtype = jnp.bfloat16 if config.payload_dtype == "bf16" else jnp.float32

    pay_f32, pay_aux = build_payload(proj, quat_n, scale_eff, aux_dtype)

    backend = _resolve_backend(config.backend)
    sat_auto = config.k_cap >= SAT_MIN_SLOTS_PER_TILE * grid.num_tiles
    sat_on = (backend == "pallas"
              and (config.sat_cull if config.sat_cull != "auto"
                   else sat_auto))
    m2d_sg = jax.lax.stop_gradient(proj.means2d)
    dep_sg = jax.lax.stop_gradient(proj.depths)
    con_sg = jax.lax.stop_gradient(proj.conics)
    op_sg = jax.lax.stop_gradient(proj.opacities)
    compact = (None if config.cull_compact == "auto"
               else bool(config.cull_compact))
    rb = binning.bin_raw(
        m2d_sg, dep_sg, proj.radii_xy, grid, config.k_cap,
        conics=con_sg, opacities=op_sg,
        want_rawslot=not config.forward_only, compact=compact)
    if sat_on:
        from . import satcull

        # Saturation prepass input: the f32 payload rows gathered in
        # sorted order (stop-gradient — cull decisions are index math,
        # like binning). Measured A/B at 2.23M (2026-08-21): carrying
        # these six columns through the binning sort instead
        # (bin_raw(carry_prepass=True) -> RawBinned.prepass_cm) is NET
        # SLOWER — 2.564 vs 2.682 Mpix/s — because sort payload bytes
        # traverse every merge pass at k=4.87M (~+20 ms) while this
        # row-8 gather costs ~23 ms; the r11 micro's +0.6 ms at n-scale
        # did not extrapolate to k-scale sorts. gidx for tail slots past
        # num_real may point at junk rows; the kernel's in-range mask
        # zeroes them before they can matter.
        pf_sorted = jax.lax.stop_gradient(
            jnp.pad(pay_f32, ((0, 1), (0, 0))))[rb.gidx_sorted]
        sat_counts = satcull.satcount(pf_sorted.T, rb.raw_starts, grid)
    else:
        sat_counts = None
    binned = binning.bin_gaussians(
        m2d_sg,
        dep_sg,
        proj.radii_xy,
        grid,
        config.k_cap,
        conics=con_sg,
        opacities=op_sg,
        want_keys=(backend == "dense"),
        want_grad_maps=not config.forward_only,
        k_pad=config.k_pad,
        compact=compact,
        rb=rb,
        sat_counts=sat_counts,
    )
    # Dummy zero-opacity row at index n absorbs the padding slots (binning's
    # chunk-aligned layout points them at gidx == n). Row gathers hit the
    # 32-byte aligned fast path; the custom VJP replaces XLA's colliding
    # scatter-add transpose with a presorted segment reduction driven by
    # binning's raw->padded map (the dummy row gets an empty segment).
    if config.forward_only:
        pf = jnp.pad(pay_f32, ((0, 1), (0, 0)))[binned.gidx]
        pa = _gather_rows_aux(jnp.pad(pay_aux, ((0, 1), (0, 0))), binned.gidx)
    else:
        ends = jnp.concatenate([binned.gauss_ends, binned.gauss_ends[-1:]])
        pf, pa = gather_expand(
            jnp.pad(pay_f32, ((0, 1), (0, 0))),
            jnp.pad(pay_aux, ((0, 1), (0, 0))),
            binned.gidx,
            binned.order,
            ends,
        )
    payload_f32 = pf.T    # [8, k_cap]
    payload_aux = pa.T    # [16, k_cap]

    if backend == "dense":
        # Assemble the classic [17, K] f32 layout for the golden reference.
        payload_sorted = assemble_dense_payload(pf, pa)
        out = blend_ref.blend_dense(
            payload_sorted, binned.sort_keys, binned.tile_starts, grid, H, W
        )
    elif backend == "pallas":
        from . import blend_pallas

        hp, wp = grid.nty * grid.tile_h, grid.ntx * grid.tile_w
        out_p = blend_pallas.blend(
            payload_f32, payload_aux, binned.tile_starts, grid, hp, wp,
            chunk=config.blend_chunk,
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
        num_needed=binned.tile_starts[-1],
        num_needed_raw=rb.total,
    )
