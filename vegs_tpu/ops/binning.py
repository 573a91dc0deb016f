"""Tile binning: expand Gaussians into per-tile instances, sort by (tile, depth),
lay instances out in chunk-aligned per-tile ranges.

TPU-native replacement for the CUDA rasterizer's duplicateWithKeys → radix
sort → identifyTileRanges stages (SURVEY.md §2.3 item 1 [inferred] pipeline).
Everything here is index math on int32 — pure XLA (cumsum / scatter / one
lax.sort / searchsorted), no Pallas needed. Measured on v5e: the sort is
~2.4 ms per million instances and dominates this stage.

Layout contract (consumed by blend kernels):
  * Each tile's instance range [tile_starts[t], tile_starts[t+1]) is padded to
    a multiple of PAD_ALIGN (=256) slots — one double-buffered DMA superchunk
    in the blend kernel — so DMA offsets are aligned and chunk writes in the
    backward never straddle two tiles.
  * Padding slots inside a range carry gidx == n (a "dummy" Gaussian index —
    callers append one zero-opacity payload column at index n) and
    sort_keys == SENTINEL.
  * Instances within a tile are depth-ordered (quantized 19-bit keys).

Static-shape contract: instance capacity `k_cap` (multiple of 512 — the
blocked-cumsum block size) is fixed; overflow drops instances from the tail
and `num_dropped` reports how many — no silent truncation.

Key packing: key = tile_id << S | (float32_bits(depth) >> (31 - S)) with
S = grid.tile_shift. Positive-float bit patterns are order-preserving, so
the low S bits sort by depth. S = 19 (the CUDA-equivalent resolution, ~10
mantissa bits) whenever the grid fits 4094 tiles (1 Mpix at 16x16); larger
images automatically spend tile bits at the cost of coarser depth
quantization, down to S = 10 (2 exponent + 1 mantissa bits — still a valid
front-to-back order, just with more same-key ties) at the hard cap of
2,097,150 tiles (~537 Mpix at 16x16). Ties (same quantized depth) break
arbitrarily; the golden reference consumes the same sorted layout so
orderings agree exactly. Tile size itself is a RasterizeConfig choice
(tile_h/tile_w), so very large images can also raise it to stay in the
fine-depth regime.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

TILE_SHIFT = 19         # depth bits at the default (<= MAX_TILES) grid size
MAX_TILES = 4094        # largest grid with full 19-bit depth resolution
MIN_TILE_SHIFT = 10     # depth-bits floor -> hard cap 2**21 - 2 tiles
PAD_ALIGN = 256
SENTINEL = jnp.int32(2**31 - 1)


class TileGrid(NamedTuple):
    tile_h: int
    tile_w: int
    ntx: int  # tiles in x
    nty: int  # tiles in y

    @property
    def num_tiles(self) -> int:
        return self.ntx * self.nty

    @property
    def tile_shift(self) -> int:
        """Depth bits of the packed (tile << S | depth) sort key: 19 while
        the grid fits MAX_TILES (the original packing, bit-compatible),
        shrinking for larger images so tile ids always fit. Keys including
        the num_tiles range-query bound must stay below SENTINEL."""
        s = TILE_SHIFT
        while s > MIN_TILE_SHIFT and self.num_tiles > (1 << (31 - s)) - 2:
            s -= 1
        if self.num_tiles > (1 << (31 - s)) - 2:
            raise ValueError(
                f"{self.num_tiles} tiles exceeds the packed sort-key "
                f"capacity ({(1 << (31 - MIN_TILE_SHIFT)) - 2} at the "
                f"{MIN_TILE_SHIFT}-bit depth floor); raise "
                "RasterizeConfig.tile_h/tile_w for images this large")
        return s

    @staticmethod
    def for_image(height: int, width: int, tile_h: int = 16, tile_w: int = 16,
                  ntx_align: int = 8) -> "TileGrid":
        """Tile grid covering the image. ntx is rounded up to `ntx_align` so
        the Pallas blend's (tile_h, ntx_align*tile_w) output blocks tile the
        padded image exactly; the extra tiles are empty/cropped."""
        ntx = -(-width // tile_w)
        ntx = -(-ntx // ntx_align) * ntx_align
        nty = -(-height // tile_h)
        grid = TileGrid(tile_h, tile_w, ntx, nty)
        grid.tile_shift  # validate the packed-key capacity (raises if over)
        return grid

    @property
    def padded_height(self) -> int:
        return self.nty * self.tile_h

    @property
    def padded_width(self) -> int:
        return self.ntx * self.tile_w


class RawBinned(NamedTuple):
    """The (tile, depth)-sorted instance stream BEFORE the chunk-aligned
    relayout. Consumed directly by the tile-sharded rasterizer (each source
    device exchanges contiguous destination-shard ranges of this stream);
    `bin_gaussians` derives the padded single-device layout from it."""
    key_sorted: jax.Array      # [k_cap] packed keys (SENTINEL tail)
    gidx_sorted: jax.Array     # [k_cap] Gaussian index per sorted instance
    rawslot_sorted: jax.Array  # [k_cap] raw slot per sorted pos (permutation)
    raw_starts: jax.Array      # [num_tiles + 1] unpadded per-tile ranges
    num_real: jax.Array        # scalar — sorted entries surviving the cull
    total: jax.Array           # scalar — pre-cap instance count
    num_raw: jax.Array         # scalar — min(total, k_cap)
    cum: jax.Array             # [n] inclusive per-Gaussian count cumsum
    prepass_cm: jax.Array | None = None  # [8, k_cap] f32 channel-major
    #   (mx, my, conic a/b/c, op_lo, 0, 0) in SORTED order — the satcull
    #   prepass input, carried through the sort as 6 extra operands
    #   (measured ~2 ms at 4.87M) instead of a ~23 ms row gather. op_lo is
    #   dequantized one step DOWN from the rec's ceil'd dmax so it never
    #   exceeds the true opacity (satcount stays conservative).


class Binned(NamedTuple):
    gidx: jax.Array         # [k_pad] int32: slot -> Gaussian index (n = dummy)
    tile_starts: jax.Array  # [num_tiles + 1] int32, all multiples of PAD_ALIGN
    sort_keys: jax.Array    # [k_pad] int32 packed keys (SENTINEL = padding)
    num_instances: jax.Array  # scalar int32 — real instances kept
    num_dropped: jax.Array    # scalar int32 — instances lost to capacity
    # Gradient-reduction byproducts (consumed by rasterize.gather_expand's
    # custom VJP; computing them here reuses this stage's sorts and saves a
    # ~23 ms searchsorted + ~3 ms sort in the backward precompute).
    # WITHOUT sat_counts: `order` is [k_cap] (raw instance r -> padded slot;
    # k_pad = dropped -> zero row) and `gauss_ends` [n] bounds each
    # Gaussian's raw range. WITH sat_counts the backward working set is
    # COMPACTED: `order` is [k_pad] over kept-raw rows (rows past the kept
    # count -> k_pad dead marker) and `gauss_ends` bounds each Gaussian's
    # kept rows in the same compact coordinates — gather_expand's contract
    # (gaussian-grouped contiguous rows) is preserved at ~1/5 the size.
    order: jax.Array
    gauss_ends: jax.Array


def _blocked_cumsum_1d(x: jax.Array, block: int = 512) -> jax.Array:
    """Two-level inclusive cumsum (one long scan is slow on TPU)."""
    k = x.shape[0]
    assert k % block == 0, (
        f"length {k} must be a multiple of the cumsum block ({block}); "
        "size k_cap in 512-slot units")
    xb = x.reshape(k // block, block)
    inner = jnp.cumsum(xb, axis=1)
    tot = inner[:, -1]
    prefix = jnp.cumsum(tot) - tot
    return (inner + prefix[:, None]).reshape(k)


def depth_key(depths: jax.Array, tile_shift: int = TILE_SHIFT) -> jax.Array:
    """Order-preserving `tile_shift`-bit quantization of positive float32
    depths (drops the low 31 - tile_shift mantissa bits)."""
    bits = jax.lax.bitcast_convert_type(depths.astype(jnp.float32), jnp.int32)
    return jax.lax.shift_right_logical(bits, 31 - tile_shift)


def tile_rects(means2d, radii, grid: TileGrid):
    """Inclusive tile-index rectangles covered by each Gaussian's footprint.

    Matches the CUDA getRect convention: min = floor((p - r)/T) clamped,
    max(exclusive) = floor((p + r + T - 1)/T) clamped; returned inclusive.
    `radii` may be [N] (square footprint, the CUDA semantics) or [N, 2]
    per-axis AABB half-extents (tighter; see projection.radii_xy).
    """
    mx, my = means2d[:, 0], means2d[:, 1]
    if radii.ndim == 2:
        rx = radii[:, 0].astype(means2d.dtype)
        ry = radii[:, 1].astype(means2d.dtype)
    else:
        rx = ry = radii.astype(means2d.dtype)
    x0 = jnp.clip(jnp.floor((mx - rx) / grid.tile_w), 0, grid.ntx - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((my - ry) / grid.tile_h), 0, grid.nty - 1).astype(jnp.int32)
    x1 = jnp.clip(
        jnp.floor((mx + rx + grid.tile_w - 1) / grid.tile_w) - 1, 0, grid.ntx - 1
    ).astype(jnp.int32)
    y1 = jnp.clip(
        jnp.floor((my + ry + grid.tile_h - 1) / grid.tile_h) - 1, 0, grid.nty - 1
    ).astype(jnp.int32)
    return x0, y0, x1, y1


DMAX_QUANT = 12.0  # dmax = 2*ln(255*op) <= 2*ln(255) ~ 11.09 for op <= 1

# Cull-compact threshold: Gaussians whose AABB rect has <= J_CAP tile cells
# get their ellipse-tile cull evaluated BEFORE slot assignment, so culled
# cells never consume raw-stream slots (measured at the bench workload:
# rects <= 8 cells hold 86.5% of all cull savings; every downstream stage —
# slot map, rec gather, sort, segment reduce — is O(k_cap), so the raw
# capacity shrinks ~13%). Bigger rects keep the post-hoc cull (their culled
# cells still occupy slots and sort to the sentinel tail, exactly the old
# behavior). The compact path packs (h-1, small) into the high bits of the
# rec's cum_excl column, so it is gated on k_cap < 2^23 slots.
J_CAP = 8
_CUM_BITS = 23
_CUM_MASK = (1 << _CUM_BITS) - 1
# The rec's col1 packs (h-1) into 3 bits above the _CUM_BITS offset and the
# `small` flag one bit higher (see bin_raw's packing); rects qualify as
# small when w*h <= J_CAP, so h <= J_CAP must fit those 3 bits. Raising
# J_CAP past 8 would silently wrap (h-1) & 7 and corrupt cell selection.
assert J_CAP <= 8, "col1 bit layout gives (h-1) exactly 3 bits"
# Auto-gate crossover (TPU-measured, 2026-08-21): at the 500k bench the
# compact path wins clearly (9.4 -> 10.0 Mpix/s with the capacity split),
# but at the 2.23M reference scale the per-Gaussian/per-slot J-scans cost
# more than the ~12% capacity saving returns (1.678 vs 1.869 Mpix/s with
# the scans off). Above this n the default keeps the pure post-hoc cull.
COMPACT_MAX_N = 1_000_000


def _conic_invs(ca, cc):
    """Reciprocals of the (clamped) conic diagonal, hoisted OUT of the
    per-cell scans: VPU division is many times a multiply, and the J_CAP
    scans would otherwise issue 4 divides per cell per slot (measured as a
    net bench REGRESSION at 2.23M before hoisting)."""
    return (1.0 / jnp.maximum(ca, 1e-12), 1.0 / jnp.maximum(cc, 1e-12))


def _cell_qmin(ca, cb, cc, lx, hx, ly, hy, inv_a, inv_c):
    """Minimum Mahalanobis form q = a dx^2 + 2 b dx dy + c dy^2 over the
    pixel rect [lx, hx] x [ly, hy] (coords relative to the splat mean):
    0 if the mean is inside, else the min over the 4 clamped edge
    parabolas. Shared by the pre-assignment count scan and the per-slot
    cull so both make bit-identical keep decisions. `inv_a`/`inv_c` come
    from `_conic_invs` (division-free inner body)."""
    inside = (lx <= 0) & (hx >= 0) & (ly <= 0) & (hy >= 0)

    def q_at(dx, dy):
        return ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy

    def edge_x(d):  # dx fixed at d, minimize over dy in [ly, hy]
        dy = jnp.clip(-cb * d * inv_c, ly, hy)
        return q_at(d, dy)

    def edge_y(e):  # dy fixed at e, minimize over dx in [lx, hx]
        dx = jnp.clip(-cb * e * inv_a, lx, hx)
        return q_at(dx, e)

    qmin = jnp.minimum(
        jnp.minimum(edge_x(lx), edge_x(hx)),
        jnp.minimum(edge_y(ly), edge_y(hy)))
    return jnp.where(inside, 0.0, qmin)


def bin_raw(
    means2d: jax.Array,
    depths: jax.Array,
    radii: jax.Array,
    grid: TileGrid,
    k_cap: int,
    conics: jax.Array | None = None,
    opacities: jax.Array | None = None,
    want_rawslot: bool = True,
    compact: bool | None = None,
    carry_prepass: bool = False,
) -> RawBinned:
    """Expand each active Gaussian (radii > 0) into one instance per covered
    tile, sorted by (tile, quantized depth) — the raw stream, no relayout.

    `carry_prepass=True` (requires conics/opacities) additionally threads
    the saturation-prepass inputs (mx, my, conic, op_lo) through the sort
    as six extra operands and returns them channel-major in `prepass_cm`
    (see RawBinned).

    Deliberately SCATTER-FREE: XLA:TPU serializes scatters with potentially
    colliding indices into per-element loops, which turned a ~10 ms stage
    into >100 ms. Every index map here is a searchsorted (binary-search
    gathers) or a plain gather; the only non-elementwise ops are one
    lax.sort and short cumsums.

    With `conics`/`opacities` ([N,3]/[N], stop-gradient), each AABB tile cell
    additionally passes an EXACT ellipse-tile cull: the minimum Mahalanobis
    form q = a dx^2 + 2 b dx dy + c dy^2 over the tile's pixel rect is
    computed in closed form (0 if the mean is inside; else the min over the
    4 clamped edge parabolas) and the cell is dropped when
    q_min > 2 ln(255 * op) — i.e. when every pixel of the tile would skip
    the instance under the blend spec's alpha >= 1/255 rule (blend_ref
    lines 77/119), making the cull LOSSLESS w.r.t. the compositing spec.
    AABB corner tiles of anisotropic/diagonal splats are the usual casualty;
    every downstream stage is O(k_cap), so fewer instances compound.
    """
    n = means2d.shape[0]
    assert k_cap % 512 == 0, (
        "k_cap must be a multiple of 512 (PAD_ALIGN and the blocked-cumsum "
        "block)")
    num_tiles = grid.num_tiles
    tile_shift = grid.tile_shift  # raises a clear error past the key capacity
    # rec packs x0/y0 in 12 bits and the float-reciprocal div below needs
    # w <= 2^11; binding only for >32k-pixel-wide degenerate aspect ratios
    # (the num_tiles cap in tile_shift constrains everything else first).
    assert grid.ntx <= 2048 and grid.nty <= 2048, (
        f"{grid.ntx}x{grid.nty} tile grid exceeds the 2048 per-axis packing "
        "bound; raise tile_h/tile_w")
    do_cull = conics is not None and opacities is not None
    # Cull-compact gate (see J_CAP): needs do_cull's fields and 9 spare
    # bits in the rec's cum_excl column. `compact=False` forces the pure
    # post-hoc cull (tests compare the two paths); None = auto (on up to
    # COMPACT_MAX_N Gaussians — the measured TPU crossover).
    if compact is None:
        compact = n <= COMPACT_MAX_N
    compact = do_cull and compact and k_cap < (1 << _CUM_BITS)

    active = (jnp.min(radii, axis=1) if radii.ndim == 2 else radii) > 0
    x0, y0, x1, y1 = tile_rects(means2d, radii, grid)
    w = x1 - x0 + 1
    h = y1 - y0 + 1
    wh = w * h

    if do_cull:
        op_ = opacities.reshape(n)
        dmax = 2.0 * jnp.log(jnp.maximum(255.0 * op_, 1.0 + 1e-6))
        # round UP in quantization: the dequantized bound only KEEPS more
        dmax_q = jnp.minimum(
            jnp.ceil(dmax * (255.0 / DMAX_QUANT)), 255.0).astype(jnp.int32)
        ca, cb, cc = conics[:, 0], conics[:, 1], conics[:, 2]
    else:
        dmax_q = jnp.zeros_like(x0)
        ca = cb = cc = jnp.zeros((n,), jnp.float32)

    if compact:
        # Pre-assignment survivor count for small rects: scan the <= J_CAP
        # cells with EXACTLY the per-slot keep predicate (same quantized
        # dmax, same _cell_qmin float ops), so the per-slot selection scan
        # below reproduces the counts bit-for-bit.
        small = active & (wh <= J_CAP)
        gdmax_n = dmax_q.astype(jnp.float32) * (DMAX_QUANT / 255.0)
        mx_, my_ = means2d[:, 0], means2d[:, 1]
        recip_w = 1.0 / w.astype(jnp.float32)
        inv_a_n, inv_c_n = _conic_invs(ca, cc)
        cnt = jnp.zeros((n,), jnp.int32)
        for j in range(J_CAP):
            # variable-divisor div via exact biased float reciprocal
            qj = jnp.floor((j + 0.5) * recip_w).astype(jnp.int32)
            rj = j - qj * w
            lx = (x0 + rj).astype(jnp.float32) * grid.tile_w - mx_
            ly = (y0 + qj).astype(jnp.float32) * grid.tile_h - my_
            qmin_j = _cell_qmin(ca, cb, cc, lx, lx + (grid.tile_w - 1),
                                ly, ly + (grid.tile_h - 1), inv_a_n, inv_c_n)
            cnt += ((j < wh) & (qmin_j <= gdmax_n)).astype(jnp.int32)
        counts = jnp.where(active, jnp.where(small, cnt, wh), 0)
    else:
        small = jnp.zeros((n,), bool)
        counts = jnp.where(active, wh, 0)

    cum = jnp.cumsum(counts)              # inclusive, [n]
    total = cum[-1] if n > 0 else jnp.int32(0)
    num_raw = jnp.minimum(total, k_cap)
    cum_excl = cum - counts

    # Slot -> Gaussian index. Each active Gaussian g owns the raw-slot run
    # [cum_excl[g], cum[g]); the map is piecewise constant, so instead of a
    # searchsorted (measured 31.6 ms at k_cap=2M: method='sort' merges the
    # 2.5M-element key+query arrays) we scatter per-run deltas of g at the
    # run starts and integrate with one cumsum (~4.5 ms total).
    #
    # The unique_indices/indices_are_sorted hints are what make the scatter
    # fast, and they must actually HOLD for in-bounds indices (a colliding
    # pair under unique_indices can lose an update): empty Gaussians (which
    # would collide with the next active run's start) are routed out of
    # bounds (k_cap + 1, mode='drop'), and a cheap [n] pair sort restores
    # index order. In-bounds indices are then strictly increasing, because
    # consecutive active runs differ by counts >= 1.
    gid = jnp.arange(n, dtype=jnp.int32)
    nonempty = counts > 0
    last_nonempty = jax.lax.cummax(jnp.where(nonempty, gid, -1))
    prev_nonempty = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32), last_nonempty[:-1]])
    run_delta = jnp.where(nonempty, gid - jnp.maximum(prev_nonempty, 0), 0)
    scat_idx, scat_val = jax.lax.sort(
        (jnp.where(nonempty, cum_excl, k_cap + 1), run_delta), num_keys=1)
    z = jnp.zeros((k_cap,), jnp.int32).at[scat_idx].add(
        scat_val, mode="drop", unique_indices=True, indices_are_sorted=True)
    gidx_raw = _blocked_cumsum_1d(z)
    slot = jnp.arange(k_cap, dtype=jnp.int32)

    # ONE packed row-8 gather for all per-Gaussian fields (8-int rows hit the
    # fast aligned-gather path; separate 1D gathers cost ~8 ms each at 1M).
    # Bit layout (room made for the cull fields): col0 = x0 | y0<<12 |
    # dmax_q<<24; col1 = cum_excl (23 bits under `compact`, full otherwise)
    # | (h-1)<<23 | small<<26; col2 = dkey | w<<19 (dkey < 2^19 since
    # positive float bits >>12; tile ids and w fit 12/13 bits by the
    # MAX_TILES cap); cols 3..7 = conic a/b/c, mx, my bitcast f32.
    # (In-play rows always have cum_excl < k_cap < 2^23 when compact —
    # a slot's run start cannot exceed the slot index — so the packing is
    # lossless where it is ever read.)
    bc = lambda v: jax.lax.bitcast_convert_type(v.astype(jnp.float32), jnp.int32)
    if compact:
        col1 = ((cum_excl & _CUM_MASK)
                | (((h - 1) & 7) << _CUM_BITS)
                | (small.astype(jnp.int32) << (_CUM_BITS + 3)))
    else:
        col1 = cum_excl
    rec = jnp.stack(
        [x0 | (y0 << 12) | (dmax_q << 24),
         col1,
         depth_key(depths, tile_shift) | (w << tile_shift),
         bc(ca), bc(cb), bc(cc),
         bc(means2d[:, 0]), bc(means2d[:, 1])],
        axis=1,
    )  # [n, 8] int32
    rec_g = rec[gidx_raw]  # [k_cap, 8]
    mask12 = (1 << 12) - 1
    gx0 = rec_g[:, 0] & mask12
    gy0 = jax.lax.shift_right_logical(rec_g[:, 0], 12) & mask12
    if compact:
        goff = rec_g[:, 1] & _CUM_MASK
        gh = (jax.lax.shift_right_logical(rec_g[:, 1], _CUM_BITS) & 7) + 1
        gsmall = jax.lax.shift_right_logical(
            rec_g[:, 1], _CUM_BITS + 3) > 0
    else:
        goff = rec_g[:, 1]
        gh = None
        gsmall = None
    gdkey = rec_g[:, 2] & ((1 << tile_shift) - 1)
    gw_ = jax.lax.shift_right_logical(rec_g[:, 2], tile_shift)

    in_range = slot < num_raw
    li = slot - goff
    gw = jnp.maximum(gw_, 1)
    # Integer div/mod with a VARIABLE divisor is emulated very slowly on the
    # TPU VPU (~80 ms at 1M elements). li < w*h fits float32 exactly, so a
    # biased float reciprocal is exact here: (li + 0.5)/gw can never sit on
    # an integer boundary for gw < 2^11, making the floor decision safe.
    recip_gw = 1.0 / gw.astype(jnp.float32)
    q = jnp.floor((li.astype(jnp.float32) + 0.5) * recip_gw
                  ).astype(jnp.int32)
    r_big = li - q * gw
    q_big = q

    keep = in_range
    if do_cull:
        fbc = lambda v: jax.lax.bitcast_convert_type(v, jnp.float32)
        ga, gb, gc = fbc(rec_g[:, 3]), fbc(rec_g[:, 4]), fbc(rec_g[:, 5])
        gmx, gmy = fbc(rec_g[:, 6]), fbc(rec_g[:, 7])
        gdmax = (jax.lax.shift_right_logical(rec_g[:, 0], 24) & 255
                 ).astype(jnp.float32) * (DMAX_QUANT / 255.0)
        inv_ga, inv_gc = _conic_invs(ga, gc)

    if compact:
        # Small rects: slot li holds the li-th SURVIVING cell — rerun the
        # count scan's predicate over the <= J_CAP cells and select where
        # the running survivor count equals li.
        gwh = gw * gh
        c = jnp.zeros_like(li)
        sel_r = jnp.zeros_like(li)
        sel_q = jnp.zeros_like(li)
        for j in range(J_CAP):
            qj = jnp.floor((j + 0.5) * recip_gw).astype(jnp.int32)
            rj = j - qj * gw
            lx_j = (gx0 + rj).astype(jnp.float32) * grid.tile_w - gmx
            ly_j = (gy0 + qj).astype(jnp.float32) * grid.tile_h - gmy
            qmin_j = _cell_qmin(ga, gb, gc, lx_j, lx_j + (grid.tile_w - 1),
                                ly_j, ly_j + (grid.tile_h - 1),
                                inv_ga, inv_gc)
            keep_j = (j < gwh) & (qmin_j <= gdmax)
            hit = keep_j & (c == li)
            sel_r = jnp.where(hit, rj, sel_r)
            sel_q = jnp.where(hit, qj, sel_q)
            c += (gsmall & keep_j).astype(jnp.int32)
        tx = gx0 + jnp.where(gsmall, sel_r, r_big)
        ty = gy0 + jnp.where(gsmall, sel_q, q_big)
        # li beyond the survivor count would select cell 0 spuriously —
        # cannot happen for in-range slots (runs are sized by the same
        # scan), but guard against it explicitly.
        keep = keep & (~gsmall | (li < c))
    else:
        tx = gx0 + r_big
        ty = gy0 + q_big
    tile_id = ty * grid.ntx + tx

    if do_cull:
        # Post-hoc exact ellipse-tile cull at the selected cell (for small
        # rects this re-verifies the scan's selected survivor — always
        # true; for big rects it is the production cull, whose rejected
        # cells become SENTINEL keys and sort to the tail).
        lx = tx.astype(jnp.float32) * grid.tile_w - gmx
        ly = ty.astype(jnp.float32) * grid.tile_h - gmy
        qmin = _cell_qmin(ga, gb, gc, lx, lx + (grid.tile_w - 1),
                          ly, ly + (grid.tile_h - 1), inv_ga, inv_gc)
        keep = keep & (qmin <= gdmax)

    key = jnp.where(keep, jax.lax.shift_left(tile_id, tile_shift) | gdkey,
                    SENTINEL)

    # Carry the raw slot through the sort: it anchors the raw->padded map
    # (`order`) that the gradient segment-reduce consumes (3-operand sort is
    # only ~0.4 ms dearer than 2-operand at 2M; 8 extra payload operands
    # cost ~0.6 ms at 2.23M — r11_recscan micro). Forward-only renders
    # (want_rawslot=False) drop the rawslot operand.
    carry_prepass = carry_prepass and do_cull
    extra = ()
    if carry_prepass:
        fbc2 = lambda v: jax.lax.bitcast_convert_type(v, jnp.int32)
        # one quantization step BELOW the ceil'd dmax -> op_lo <= op
        op_lo = jnp.exp(0.5 * (gdmax - DMAX_QUANT / 255.0)) / 255.0
        extra = (rec_g[:, 6], rec_g[:, 7], rec_g[:, 3], rec_g[:, 4],
                 rec_g[:, 5], fbc2(op_lo))
    if want_rawslot:
        key_sorted, gidx_sorted, rawslot_sorted, *extra_s = jax.lax.sort(
            (key, gidx_raw, slot) + extra, num_keys=1)
    else:
        key_sorted, gidx_sorted, *extra_s = jax.lax.sort(
            (key, gidx_raw) + extra, num_keys=1)
        rawslot_sorted = None
    prepass_cm = None
    if carry_prepass:
        fb = lambda v: jax.lax.bitcast_convert_type(v, jnp.float32)
        prepass_cm = jnp.concatenate(
            [jnp.stack([fb(c) for c in extra_s], axis=0),
             jnp.zeros((2, k_cap), jnp.float32)], axis=0)  # [8, k_cap]

    # Raw (unpadded) per-tile ranges via binary search on the sorted keys
    # (few queries -> the scan method is fine here).
    queries = jax.lax.shift_left(
        jnp.arange(num_tiles + 1, dtype=jnp.int32), tile_shift
    )
    raw_starts = jnp.searchsorted(key_sorted, queries, side="left").astype(jnp.int32)
    return RawBinned(
        key_sorted=key_sorted,
        gidx_sorted=gidx_sorted,
        rawslot_sorted=rawslot_sorted,
        raw_starts=raw_starts,
        # Count of real (non-sentinel) sorted entries; < num_raw when the
        # ellipse-tile cull dropped AABB cells.
        num_real=raw_starts[num_tiles],
        total=total,
        num_raw=num_raw,
        cum=cum,
        prepass_cm=prepass_cm,
    )


def pad_relayout(
    key_sorted: jax.Array,    # [k_src] sorted packed keys (SENTINEL tail)
    carry_sorted: jax.Array,  # [k_src] int32 value carried per instance
    raw_starts: jax.Array,    # [num_tiles + 1]
    num_tiles: int,
    k_cap: int,
    dummy: int,
    want_keys: bool = True,
    counts_override: jax.Array | None = None,  # [num_tiles] per-tile clip
):
    """Re-lay a (tile, depth)-sorted instance stream into the chunk-aligned
    per-tile layout the blend kernels consume: each tile's range is padded to
    a PAD_ALIGN multiple; padding slots carry `dummy` / SENTINEL.

    `counts_override` (e.g. satcull.satcount's kept counts) clips each
    tile's instance count — only the leading `counts_override[t]` instances
    of tile t survive into the padded layout.

    Returns (carry_padded [k_cap], keys_padded [k_cap] or None,
             padded_starts [num_tiles + 1], num_kept scalar).
    Only the dense (golden) blend consumes the padded keys; the Pallas
    backend walks tile_starts directly, so `want_keys=False` skips
    producing them.
    """
    assert k_cap % PAD_ALIGN == 0
    k_src = key_sorted.shape[0]
    num_real = raw_starts[num_tiles]
    tile_counts = raw_starts[1:] - raw_starts[:-1]  # [T]
    if counts_override is not None:
        tile_counts = jnp.minimum(tile_counts, counts_override)

    # Chunk-aligned layout: pad each tile's range up to PAD_ALIGN slots.
    padded_counts = -(-tile_counts // PAD_ALIGN) * PAD_ALIGN
    padded_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded_counts)]
    )
    padded_starts = jnp.minimum(padded_starts, k_cap)  # clamp keeps alignment

    # Padded re-layout: per-slot tile lookups expand via the boundary-delta
    # trick — scatter per-tile value DELTAS at the (few thousand) padded range
    # boundaries, then one cumsum broadcasts them to every slot in the range.
    # Costs ~0.3 ms vs ~90 ms for a 1M-query searchsorted into the table.
    def tile_broadcast(values):  # [T] -> [k_cap] piecewise-constant
        deltas = jnp.concatenate([values[:1], values[1:] - values[:-1]])
        z = jnp.zeros((k_cap,), values.dtype)
        # Clamped (overflowed) boundaries sit exactly at k_cap: drop them.
        z = z.at[padded_starts[:-1]].add(deltas, mode="drop")
        return jnp.cumsum(z)

    base_map = tile_broadcast(padded_starts[:-1])   # padded_starts[t_of]
    rawstart_map = tile_broadcast(raw_starts[:-1])  # raw_starts[t_of]
    count_map = tile_broadcast(tile_counts)         # tile_counts[t_of]

    slot = jnp.arange(k_cap, dtype=jnp.int32)
    r_of = slot - base_map
    src = rawstart_map + r_of
    valid = (
        (slot < padded_starts[num_tiles])
        & (r_of < count_map)
        & (src < num_real)
    )
    src_c = jnp.clip(src, 0, k_src - 1)
    # Final relayout pull: ALWAYS pack (carry, key) into one row-2 gather —
    # 8-byte rows hit the aligned-gather path, while the bare 1-column
    # gather is the slow 1-D random-gather path (measured r08: the
    # want_keys=False full bin was 1.8 ms SLOWER than want_keys=True at the
    # bench shape purely from this pull).
    packed = jnp.stack([carry_sorted, key_sorted], axis=1)  # [k_src, 2]
    pulled = packed[src_c]
    carry_padded = jnp.where(valid, pulled[:, 0], dummy)
    keys_padded = (jnp.where(valid, pulled[:, 1], SENTINEL) if want_keys
                   else None)

    num_kept = jnp.sum(valid.astype(jnp.int32))
    return carry_padded, keys_padded, padded_starts, num_kept


def bin_gaussians(
    means2d: jax.Array,
    depths: jax.Array,
    radii: jax.Array,
    grid: TileGrid,
    k_cap: int,
    conics: jax.Array | None = None,
    opacities: jax.Array | None = None,
    want_keys: bool = True,
    want_grad_maps: bool = True,
    k_pad: int = 0,
    compact: bool | None = None,
    rb: RawBinned | None = None,
    sat_counts: jax.Array | None = None,
) -> Binned:
    """Expand each active Gaussian into one instance per covered tile,
    sorted by (tile, quantized depth), in the chunk-aligned padded layout
    the blend kernels consume. See `bin_raw` (expansion/cull/sort) and
    `pad_relayout` (layout) for the two stages this composes.

    `want_keys=False` skips the padded sort-key output (only the dense
    golden blend consumes it); `want_grad_maps=False` skips the raw->padded
    `order` map and its extra sort operand + permutation sort (~5 ms at 2M)
    for forward-only renders that never run gather_expand's backward.

    `k_pad` (default 0 = k_cap) sizes the PADDED layout (gidx/sort_keys/
    tile_starts — what gather_expand and the blend consume) independently of
    the raw-stream capacity `k_cap` (slot map, sort, order, segment reduce).
    The two needs differ: the raw stream must hold every assigned slot
    (post-cull totals under the compact path), the padded layout holds the
    kept instances PLUS per-tile PAD_ALIGN rounding — at the bench workload
    padding exceeds the residual cull slack, so k_pad > k_cap buys the raw
    stages a ~15% smaller working set (mirrors tile_sharded's existing
    k_loc/k_blend split).

    `rb` lets the caller reuse a precomputed bin_raw result (rasterize runs
    the saturation prepass between bin_raw and the relayout); `sat_counts`
    ([num_tiles], satcull.satcount) clips each tile to its saturation
    prefix — clipped instances are provably invisible, so they are neither
    laid out nor counted as dropped."""
    n = means2d.shape[0]
    num_tiles = grid.num_tiles
    if k_pad <= 0:
        k_pad = k_cap
    assert k_pad % PAD_ALIGN == 0
    if rb is None:
        rb = bin_raw(means2d, depths, radii, grid, k_cap,
                     conics=conics, opacities=opacities,
                     want_rawslot=want_grad_maps, compact=compact)
    gidx_padded, keys_padded, padded_starts, num_kept = pad_relayout(
        rb.key_sorted, rb.gidx_sorted, rb.raw_starts, num_tiles, k_pad,
        dummy=n, want_keys=want_keys, counts_override=sat_counts)
    # capacity losses only: AABB cells removed by the ellipse cull and
    # saturated suffixes removed by sat_counts are not "dropped".
    raw_counts = rb.raw_starts[1:] - rb.raw_starts[:-1]
    if sat_counts is not None:
        kept_target = jnp.sum(jnp.minimum(raw_counts, sat_counts))
    else:
        kept_target = rb.num_real
    num_dropped = rb.total - (rb.num_raw - rb.num_real) - (
        rb.num_real - kept_target) - num_kept

    if not want_grad_maps:
        return Binned(
            gidx=gidx_padded,
            tile_starts=padded_starts,
            sort_keys=keys_padded,
            num_instances=num_kept,
            num_dropped=num_dropped,
            order=None,
            gauss_ends=jnp.minimum(rb.cum, k_cap),
        )

    # ---- raw -> padded slot map (`order`) --------------------------------
    # The padded destination of SORTED position p (in tile t) is
    # p + (padded_starts[t] - raw_starts[t]) — a per-tile constant shift,
    # broadcast to every sorted position with the boundary-delta trick
    # (deltas across empty tiles are 0, so colliding boundaries are benign).
    # (Unhinted scatter: only num_tiles entries, and boundaries of empty
    # tiles collide — the slow-but-correct path costs ~nothing here.)
    slot = jnp.arange(k_cap, dtype=jnp.int32)
    shift = padded_starts[:-1] - rb.raw_starts[:-1]       # [T]
    shift_deltas = jnp.concatenate([shift[:1], shift[1:] - shift[:-1]])
    zs = jnp.zeros((k_cap,), jnp.int32).at[rb.raw_starts[:-1]].add(
        shift_deltas, mode="drop")
    dest = slot + _blocked_cumsum_1d(zs)                  # [k_cap] per sorted pos
    landed = (slot < rb.num_real) & (dest < padded_starts[num_tiles])
    if sat_counts is not None:
        # Satcull-clipped tails must not land: their shifted dest would
        # alias the NEXT tile's padded range. Broadcast each tile's kept
        # count and raw start to its sorted positions (same boundary-delta
        # trick) and require the in-tile position to sit in the prefix.
        def bcast(values):
            deltas = jnp.concatenate([values[:1], values[1:] - values[:-1]])
            z = jnp.zeros((k_cap,), jnp.int32).at[rb.raw_starts[:-1]].add(
                deltas, mode="drop")
            return _blocked_cumsum_1d(z)
        kept_counts = jnp.minimum(raw_counts, sat_counts)
        landed = landed & (
            slot - bcast(rb.raw_starts[:-1]) < bcast(kept_counts))
    dest = jnp.where(landed, dest, k_pad)  # k_pad == "dropped" marker
    if sat_counts is None:
        # rawslot_sorted is a full permutation of [0, k_cap): sorting by it
        # scatters each sorted position's destination back to its raw slot.
        _, order = jax.lax.sort((rb.rawslot_sorted, dest), num_keys=1)
        gauss_ends = jnp.minimum(rb.cum, k_cap)
    else:
        # COMPACT backward working set (see Binned docstring): sort kept
        # sorted positions by raw slot — dead positions get key k_cap and
        # sink to the tail — so the sorted values enumerate the kept
        # instances in gaussian-grouped (raw) order directly; the first
        # k_pad rows are the whole backward working set (~the satcull keep
        # ratio of k_cap). Carrying gidx as a 3rd operand makes the
        # per-Gaussian compact ranges nearly free.
        raw_masked = jnp.where(landed, rb.rawslot_sorted, k_cap)
        _, dest_c, gidx_c = jax.lax.sort(
            (raw_masked, dest, rb.gidx_sorted), num_keys=1)
        # compact capacity: kept rows <= num_real <= k_cap AND <= the padded
        # capacity; k_pad can exceed k_cap (per-tile padding > cull slack at
        # some scales), so bound by both. The dead marker stays k_pad (the
        # cotangent table's row count) regardless.
        kr2 = min(k_pad, k_cap)
        order = dest_c[:kr2]
        gidx_c = gidx_c[:kr2]
        n_kept = jnp.sum(landed.astype(jnp.int32))
        # Per-Gaussian exclusive ends in compact coords: scatter (c + 1) at
        # gidx_c[c] for each run boundary inside the kept region (gidx_c is
        # nondecreasing there), then cummax fills Gaussians with no kept
        # rows with the previous end. Boundary targets are strictly
        # increasing and the dead tail routes out of bounds AFTER them, so
        # the scatter hints hold.
        c = jnp.arange(kr2, dtype=jnp.int32)
        nxt = jnp.concatenate([gidx_c[1:], gidx_c[-1:]])
        is_boundary = (c + 1 >= n_kept) | (nxt != gidx_c)
        tgt = jnp.where(is_boundary & (c < n_kept), gidx_c, n + 1)
        z = jnp.zeros((n,), jnp.int32).at[tgt].max(
            c + 1, mode="drop", unique_indices=True, indices_are_sorted=True)
        gauss_ends = jax.lax.cummax(z)

    return Binned(
        gidx=gidx_padded,
        tile_starts=padded_starts,
        sort_keys=keys_padded,
        num_instances=num_kept,
        num_dropped=num_dropped,
        order=order,
        gauss_ends=gauss_ends,
    )
