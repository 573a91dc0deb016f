"""Offline (CPU) potential analysis for tile-level saturation culling at the
reference scale.

Question: at the 2.23M bench scene, what fraction of the sorted instance
stream sits BEHIND the depth at which every pixel of its tile is provably
saturated (conservative bound: counted instances have whole-tile
alpha_min = op * exp(-0.5 * qmax_tile) >= 1/255; cull instance i when
prod_{counted j<i in tile} (1 - min(alpha_min_j, 0.99)) < T_EPS = 1e-4,
which per blend_ref's per-pixel stop rule makes i's contribution exactly
zero for every pixel)?

Also reports the per-pixel ORACLE ratio (instances past every covered
pixel's own stop) as the cull's upper bound.

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python perf/r09_satcull_analysis.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tests.utils import make_camera, random_gaussians
    from vegs_tpu import geometry
    from vegs_tpu.ops import binning
    from vegs_tpu.ops.projection import project

    H, W = 376, 1408
    N = int(os.environ.get("VEGS_SAT_N", "2233571"))
    TILE_H = int(os.environ.get("VEGS_TILE_H", "16"))
    TILE_W = int(os.environ.get("VEGS_TILE_W", "16"))

    cam = make_camera(height=H, width=W, fovx=1.2, fovy=0.4)
    rng = np.random.default_rng(0)
    means, quats, scales, opac, shs = random_gaussians(
        rng, N, depth_range=(2.0, 60.0), xy_extent=40.0,
        scale_range=(0.002, 0.025))
    z = np.asarray(rng.uniform(2.0, 60.0, N), np.float32)
    u = rng.uniform(-0.95, 0.95, N)
    v = rng.uniform(-0.95, 0.95, N)
    means = jnp.asarray(np.stack([
        z * np.tan(0.6) * u, z * np.tan(0.2) * v, z],
        axis=1, dtype=np.float32))

    grid = binning.TileGrid.for_image(H, W, TILE_H, TILE_W)
    cov6 = geometry.cov6_from_scaling_rotation(scales, quats)
    proj = project(means, cov6, opac, shs, cam)
    k_cap = (1 << 23) - 512
    rb = binning.bin_raw(
        proj.means2d, proj.depths, proj.radii_xy, grid, k_cap,
        conics=proj.conics, opacities=proj.opacities, compact=False)

    num_real = int(rb.num_real)
    keys = np.asarray(rb.key_sorted[:num_real])
    gidx = np.asarray(rb.gidx_sorted[:num_real])
    raw_starts = np.asarray(rb.raw_starts)
    print(f"n={N}, real instances={num_real}, tiles={grid.num_tiles}")

    m2d = np.asarray(proj.means2d)
    con = np.asarray(proj.conics)
    op = np.asarray(proj.opacities).reshape(-1)

    tile_id = keys >> grid.tile_shift
    tx = (tile_id % grid.ntx).astype(np.int64)
    ty = (tile_id // grid.ntx).astype(np.int64)

    # whole-tile minimum alpha: qmax over the tile rect = max over 4 corners
    mx, my = m2d[gidx, 0], m2d[gidx, 1]
    a, b, c = con[gidx, 0], con[gidx, 1], con[gidx, 2]
    lx = tx * grid.tile_w - mx
    hx = lx + (grid.tile_w - 1)
    ly = ty * grid.tile_h - my
    hy = ly + (grid.tile_h - 1)

    def q(dx, dy):
        return a * dx * dx + 2.0 * b * dx * dy + c * dy * dy

    qmax = np.maximum.reduce([q(lx, ly), q(lx, hy), q(hx, ly), q(hx, hy)])
    alpha_min = np.minimum(op[gidx] * np.exp(-0.5 * qmax), 0.99)
    counted = alpha_min >= 1.0 / 255.0
    lg = np.where(counted, np.log1p(-alpha_min), 0.0)

    cum = np.cumsum(lg)
    base = np.zeros(num_real)
    starts = raw_starts[:-1]
    ends = raw_starts[1:]
    # exclusive-in-tile prefix: subtract cum at tile start
    tile_of_slot = np.repeat(np.arange(grid.num_tiles),
                             np.maximum(ends - starts, 0))
    cum_at_start = np.concatenate([[0.0], cum])[starts[tile_of_slot]]
    s_excl = (cum - lg) - cum_at_start
    culled = s_excl < np.log(1e-4)
    print(f"counted (alpha_min >= 1/255): {counted.mean() * 100:.1f}%")
    print(f"conservative tile-saturation cull: {culled.sum()} "
          f"({culled.mean() * 100:.1f}% of instances)")

    # per-tile kept distribution
    kept_per_tile = np.bincount(tile_of_slot, weights=(~culled),
                                minlength=grid.num_tiles)
    tot_per_tile = np.maximum(ends - starts, 1)
    print(f"median kept/tile {np.median(kept_per_tile):.0f} of "
          f"{np.median(ends - starts):.0f}")

    # Oracle (sampled): evaluate the spec per pixel on a subset of tiles and
    # count instances contributing nothing anywhere in their tile.
    rng2 = np.random.default_rng(1)
    sample_tiles = rng2.choice(
        np.flatnonzero((ends - starts) > 0), size=min(120, grid.num_tiles),
        replace=False)
    oracle_cullable = 0
    oracle_total = 0
    cons_in_sample = 0
    suffix_exact = 0
    suffix_chunk = 0
    for t in sample_tiles:
        s0, e0 = starts[t], ends[t]
        idx = np.arange(s0, e0)
        txp = (t % grid.ntx) * grid.tile_w
        typ = (t // grid.ntx) * grid.tile_h
        pxs = np.arange(txp, txp + grid.tile_w)
        pys = np.arange(typ, typ + grid.tile_h)
        PX, PY = np.meshgrid(pxs, pys, indexing="xy")
        dx = PX.reshape(-1)[None, :] - mx[idx][:, None]
        dy = PY.reshape(-1)[None, :] - my[idx][:, None]
        power = (-0.5 * (a[idx][:, None] * dx * dx
                         + c[idx][:, None] * dy * dy)
                 - b[idx][:, None] * dx * dy)
        alpha = np.minimum(op[gidx[idx]][:, None] * np.exp(power), 0.99)
        valid = (power <= 0) & (alpha >= 1 / 255)
        alpha = np.where(valid, alpha, 0.0)
        L = np.log1p(-alpha)
        logT = np.cumsum(L, axis=0) - L
        T = np.exp(logT)
        crossing = (T * (1 - alpha) < 1e-4) & (alpha > 0)
        stopped_before = np.cumsum(crossing, axis=0) - crossing > 0
        include = valid & ~stopped_before & ~crossing
        contributes = include.any(axis=1)
        oracle_cullable += (~contributes).sum()
        oracle_total += len(idx)
        cons_in_sample += culled[idx].sum()
        # suffix cull: all pixels dead after their crossing -> every later
        # instance is skippable. Pixel p dies at first crossing; the tile is
        # dead after max_p(first crossing). Report exact and 256-chunk
        # (PAD_ALIGN / blend superchunk) granularity.
        any_cross = crossing.any(axis=0)
        first_cross = np.where(any_cross, crossing.argmax(axis=0), len(idx))
        tile_dead_after = int(first_cross.max()) + 1 if len(idx) else 0
        suffix_exact += max(len(idx) - tile_dead_after, 0)
        kept_256 = min(-(-tile_dead_after // 256) * 256, len(idx))
        suffix_chunk += len(idx) - kept_256
    print(f"oracle (sampled {len(sample_tiles)} tiles): "
          f"{oracle_cullable / oracle_total * 100:.1f}% contribute nothing; "
          f"conservative got {cons_in_sample / oracle_total * 100:.1f}%")
    print(f"suffix cull (all pixels saturated): exact "
          f"{suffix_exact / oracle_total * 100:.1f}%, 256-chunk granular "
          f"{suffix_chunk / oracle_total * 100:.1f}%")


if __name__ == "__main__":
    main()
