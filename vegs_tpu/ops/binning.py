"""Tile binning: expand Gaussians into per-tile instances, sort by (tile, depth),
compute per-tile instance ranges.

TPU-native replacement for the CUDA rasterizer's duplicateWithKeys → radix
sort → identifyTileRanges stages (SURVEY.md §2.3 item 1 [inferred] pipeline).
Everything here is index math on int32 — pure XLA (cumsum / scatter / one
lax.sort / searchsorted), no Pallas needed. Measured on v5e: the sort is
~2.4 ms per million instances and dominates this stage.

Static-shape contract: instance capacity `k_cap` is fixed; if a view produces
more instances they are dropped from the tail (per-Gaussian order) and
`num_dropped` reports how many — no silent truncation.

Key packing: key = tile_id << 19 | (float32_bits(depth) >> 12). Positive-float
bit patterns are order-preserving, so the low 19 bits sort by depth with ~10
mantissa bits of resolution. Requires num_tiles <= 4095. Ties (same quantized
depth) break arbitrarily; the golden reference uses the same quantized key so
orderings agree exactly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

DEPTH_SHIFT = 12
TILE_SHIFT = 19
MAX_TILES = 4095
SENTINEL = jnp.int32(2**31 - 1)


class TileGrid(NamedTuple):
    tile_h: int
    tile_w: int
    ntx: int  # tiles in x
    nty: int  # tiles in y

    @property
    def num_tiles(self) -> int:
        return self.ntx * self.nty

    @staticmethod
    def for_image(height: int, width: int, tile_h: int = 16, tile_w: int = 16) -> "TileGrid":
        ntx = -(-width // tile_w)
        nty = -(-height // tile_h)
        grid = TileGrid(tile_h, tile_w, ntx, nty)
        assert grid.num_tiles <= MAX_TILES, (
            f"{grid.num_tiles} tiles exceeds packed-key capacity; "
            "increase tile size for very large images"
        )
        return grid


class Binned(NamedTuple):
    gidx: jax.Array         # [k_cap] int32: sorted instance -> Gaussian index
    tile_starts: jax.Array  # [num_tiles + 1] int32 instance-range boundaries
    sort_keys: jax.Array    # [k_cap] int32 packed keys (sorted; SENTINEL = pad)
    num_instances: jax.Array  # scalar int32 (clamped to k_cap)
    num_dropped: jax.Array    # scalar int32


def depth_key(depths: jax.Array) -> jax.Array:
    """Order-preserving 19-bit quantization of positive float32 depths."""
    bits = jax.lax.bitcast_convert_type(depths.astype(jnp.float32), jnp.int32)
    return jax.lax.shift_right_logical(bits, DEPTH_SHIFT)


def tile_rects(means2d, radii, grid: TileGrid):
    """Inclusive tile-index rectangles covered by each Gaussian's footprint.

    Matches the CUDA getRect convention: min = floor((p - r)/T) clamped,
    max(exclusive) = floor((p + r + T - 1)/T) clamped; returned inclusive.
    """
    mx, my = means2d[:, 0], means2d[:, 1]
    r = radii.astype(means2d.dtype)
    x0 = jnp.clip(jnp.floor((mx - r) / grid.tile_w), 0, grid.ntx - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((my - r) / grid.tile_h), 0, grid.nty - 1).astype(jnp.int32)
    x1 = jnp.clip(
        jnp.floor((mx + r + grid.tile_w - 1) / grid.tile_w) - 1, 0, grid.ntx - 1
    ).astype(jnp.int32)
    y1 = jnp.clip(
        jnp.floor((my + r + grid.tile_h - 1) / grid.tile_h) - 1, 0, grid.nty - 1
    ).astype(jnp.int32)
    return x0, y0, x1, y1


def bin_gaussians(
    means2d: jax.Array,
    depths: jax.Array,
    radii: jax.Array,
    grid: TileGrid,
    k_cap: int,
) -> Binned:
    """Expand each active Gaussian (radii > 0) into one instance per covered
    tile, sorted by (tile, quantized depth)."""
    n = means2d.shape[0]
    active = radii > 0
    x0, y0, x1, y1 = tile_rects(means2d, radii, grid)
    w = x1 - x0 + 1
    h = y1 - y0 + 1
    counts = jnp.where(active, w * h, 0)

    offsets = jnp.cumsum(counts) - counts  # exclusive
    total = offsets[-1] + counts[-1] if n > 0 else jnp.int32(0)
    num_instances = jnp.minimum(total, k_cap)
    num_dropped = jnp.maximum(total - k_cap, 0)

    # Slot -> Gaussian map: scatter a 1 at each active Gaussian's start offset
    # (only where count > 0; empty Gaussians share offsets with successors),
    # then inclusive-cumsum-minus-one gives each slot the ORDINAL of its
    # active Gaussian; a compacted ordinal->index table resolves the actual
    # Gaussian index (empty Gaussians make ordinal != index).
    marker = jnp.zeros((k_cap,), jnp.int32)
    scatter_off = jnp.where(counts > 0, offsets, k_cap)  # k_cap -> dropped
    marker = marker.at[scatter_off].add(1, mode="drop")
    ordinal = jnp.clip(jnp.cumsum(marker) - 1, 0, max(n - 1, 0))  # [k_cap]

    active_ord = jnp.cumsum((counts > 0).astype(jnp.int32)) - 1  # [n]
    compact = jnp.zeros((n,), jnp.int32)
    compact = compact.at[jnp.where(counts > 0, active_ord, n)].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop"
    )
    gidx = compact[ordinal]

    slot = jnp.arange(k_cap, dtype=jnp.int32)
    in_range = slot < num_instances

    li = slot - offsets[gidx]
    gw = w[gidx]
    tx = x0[gidx] + li % jnp.maximum(gw, 1)
    ty = y0[gidx] + li // jnp.maximum(gw, 1)
    tile_id = ty * grid.ntx + tx

    dkey = depth_key(depths)[gidx]
    key = jnp.where(
        in_range,
        jax.lax.shift_left(tile_id, TILE_SHIFT) | dkey,
        SENTINEL,
    )

    key_sorted, gidx_sorted = jax.lax.sort((key, gidx), num_keys=1)

    # Per-tile ranges via binary search on the sorted keys.
    queries = jax.lax.shift_left(
        jnp.arange(grid.num_tiles + 1, dtype=jnp.int32), TILE_SHIFT
    )
    tile_starts = jnp.searchsorted(key_sorted, queries, side="left").astype(jnp.int32)

    return Binned(
        gidx=gidx_sorted,
        tile_starts=tile_starts,
        sort_keys=key_sorted,
        num_instances=num_instances,
        num_dropped=num_dropped,
    )
