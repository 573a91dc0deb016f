"""Binning rework experiments at the bench shape (round-3 VERDICT item 1b).

Current binning stage ~21 ms; targets here:
  1. Replace the rec row-8 gather (~5 ms at k=1.13M) with a delta-encoded
     broadcast: scatter +rec[g] at each Gaussian's run start and -rec[g] at
     its run end (both unique-index scatters), then ONE blocked int32 cumsum
     over [k, 9] reconstructs the per-slot rows exactly (int32 wraparound
     makes delta coding exact for arbitrary bit patterns). The gidx column
     rides along as column 8, absorbing the old separate z-scatter+cumsum.
  2. Quantify each stage of bin_gaussians to know what's left.
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

H, W = 376, 1408
N = 500_000
K_CAP = 1126912


def timeit(name, fn, args, iters=8):
    @functools.partial(jax.jit, static_argnums=(1,))
    def loop(args, n):
        def body(i, carry):
            args, acc = carry
            s = fn(args, acc)
            return args, acc + s * 1e-20
        return jax.lax.fori_loop(0, n, body, (args, 0.0))[1]

    float(loop(args, 1))
    t0 = time.time(); float(loop(args, 1)); t1 = time.time()
    float(loop(args, 1 + iters))
    t2 = time.time(); float(loop(args, 1 + iters)); t3 = time.time()
    ms = ((t3 - t2) - (t1 - t0)) / iters * 1e3
    print(f"{name:58s} {ms:9.2f} ms", flush=True)
    return ms


def dep(x, acc):
    return x + (jnp.sin(acc) * 1e-20).astype(x.dtype)


def depi(x, acc):
    return x + (jnp.sin(acc) * 0.0).astype(x.dtype)


def main():
    from tests.utils import make_camera, random_gaussians
    from vegs_tpu import geometry
    from vegs_tpu.ops import binning
    from vegs_tpu.ops.projection import project

    cam = make_camera(height=H, width=W, fovx=1.2, fovy=0.4)
    rng = np.random.default_rng(0)
    means, quats, scales, opac, shs = random_gaussians(
        rng, N, depth_range=(2.0, 60.0), xy_extent=40.0,
        scale_range=(0.002, 0.025))
    z = np.asarray(rng.uniform(2.0, 60.0, N), np.float32)
    u = rng.uniform(-0.95, 0.95, N)
    v = rng.uniform(-0.95, 0.95, N)
    means = jnp.asarray(np.stack(
        [z * np.tan(0.6) * u, z * np.tan(0.2) * v, z], axis=1,
        dtype=np.float32))
    grid = binning.TileGrid.for_image(H, W)
    cov6 = geometry.cov6_from_scaling_rotation(scales, quats)
    proj = jax.jit(project)(means, cov6, opac, shs, cam)
    m2d = jax.lax.stop_gradient(proj.means2d)
    dpt = jax.lax.stop_gradient(proj.depths)
    con = jax.lax.stop_gradient(proj.conics)
    ops_ = jax.lax.stop_gradient(proj.opacities)
    rxy = proj.radii_xy

    # --- current full binning ------------------------------------------------
    def full_bin(a, acc):
        m, d, r, c, o = a
        b = binning.bin_gaussians(dep(m, acc), d, r, grid, K_CAP,
                                  conics=c, opacities=o, want_keys=False)
        return (jnp.sum(b.gidx) + jnp.sum(b.order)).astype(jnp.float32)
    timeit("bin_gaussians FULL (want_keys=False)", full_bin,
           (m2d, dpt, rxy, con, ops_))

    def raw_only(a, acc):
        m, d, r, c, o = a
        rb = binning.bin_raw(dep(m, acc), d, r, grid, K_CAP,
                             conics=c, opacities=o)
        return (jnp.sum(rb.key_sorted) + jnp.sum(rb.gidx_sorted)).astype(
            jnp.float32)
    timeit("bin_raw only", raw_only, (m2d, dpt, rxy, con, ops_))

    # --- pieces: replicate bin_raw's precomputation on host side -------------
    x0, y0, x1, y1 = binning.tile_rects(m2d, rxy, grid)
    active = jnp.min(rxy, axis=1) > 0
    w_ = x1 - x0 + 1
    h_ = y1 - y0 + 1
    counts = jnp.where(active, w_ * h_, 0)
    cum = jnp.cumsum(counts)
    cum_excl = cum - counts
    nonempty = counts > 0
    op_ = ops_.reshape(N)
    dmax = 2.0 * jnp.log(jnp.maximum(255.0 * op_, 1.0 + 1e-6))
    dmax_q = jnp.minimum(jnp.ceil(dmax * (255.0 / 12.0)), 255.0).astype(
        jnp.int32)
    bc = lambda v: jax.lax.bitcast_convert_type(v.astype(jnp.float32),
                                                jnp.int32)
    tile_shift = grid.tile_shift
    rec = jnp.stack(
        [x0 | (y0 << 12) | (dmax_q << 24),
         cum_excl,
         binning.depth_key(dpt, tile_shift) | (w_ << tile_shift),
         bc(con[:, 0]), bc(con[:, 1]), bc(con[:, 2]),
         bc(m2d[:, 0]), bc(m2d[:, 1])], axis=1)
    gid = jnp.arange(N, dtype=jnp.int32)
    rec9 = jnp.concatenate([rec, gid[:, None]], axis=1)  # col 8 = gidx

    # current: z-scatter + 1-col cumsum + row-8 gather
    last_nonempty = jax.lax.cummax(jnp.where(nonempty, gid, -1))
    prev_nonempty = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32), last_nonempty[:-1]])
    run_delta = jnp.where(nonempty, gid - jnp.maximum(prev_nonempty, 0), 0)

    def cur_map(a, acc):
        ce, rd, ne, r8 = a
        scat_idx, scat_val = jax.lax.sort(
            (jnp.where(ne, depi(ce, acc), K_CAP + 1), rd), num_keys=1)
        zz = jnp.zeros((K_CAP,), jnp.int32).at[scat_idx].add(
            scat_val, mode="drop", unique_indices=True,
            indices_are_sorted=True)
        gidx_raw = binning._blocked_cumsum_1d(zz)
        rec_g = r8[gidx_raw]
        return jnp.sum(rec_g).astype(jnp.float32)
    timeit("CURRENT slot map: sort2 + scatter + cumsum1 + row8-gather",
           cur_map, (cum_excl, run_delta, nonempty, rec))

    # candidate: start/end row-9 scatters + [k,9] cumsum
    def cumsum9(x, block=512):
        k, c = x.shape
        xb = x.reshape(k // block, block, c)
        inner = jnp.cumsum(xb, axis=1)
        tot = inner[:, -1]
        prefix = jnp.cumsum(tot, axis=0) - tot
        return (inner + prefix[:, None, :]).reshape(k, c)

    def delta_map(a, acc):
        ce, cu, ne, r9 = a
        sidx = jnp.where(ne, depi(ce, acc), K_CAP + 1)
        eidx = jnp.where(ne, cu, K_CAP + 1)
        zz = jnp.zeros((K_CAP, 9), jnp.int32)
        zz = zz.at[sidx].add(r9, mode="drop", unique_indices=True)
        zz = zz.at[eidx].add(-r9, mode="drop", unique_indices=True)
        rec_g = cumsum9(zz)
        return jnp.sum(rec_g).astype(jnp.float32)
    timeit("DELTA slot map: 2x row9-scatter(uns) + cumsum9", delta_map,
           (cum_excl, cum, nonempty, rec9))

    # correctness of the delta map vs gather
    sidx = jnp.where(nonempty, cum_excl, K_CAP + 1)
    eidx = jnp.where(nonempty, cum, K_CAP + 1)
    zz = jnp.zeros((K_CAP, 9), jnp.int32)
    zz = zz.at[sidx].add(rec9, mode="drop", unique_indices=True)
    zz = zz.at[eidx].add(-rec9, mode="drop", unique_indices=True)
    rec_g_new = np.asarray(cumsum9(zz))
    scat_idx, scat_val = jax.lax.sort(
        (sidx, run_delta), num_keys=1)
    z1 = jnp.zeros((K_CAP,), jnp.int32).at[scat_idx].add(
        scat_val, mode="drop", unique_indices=True, indices_are_sorted=True)
    gidx_raw = binning._blocked_cumsum_1d(z1)
    rec_g_old = np.asarray(rec[gidx_raw])
    total = int(cum[-1])
    nr = min(total, K_CAP)
    ok8 = np.array_equal(rec_g_new[:nr, :8], rec_g_old[:nr])
    okg = np.array_equal(rec_g_new[:nr, 8], np.asarray(gidx_raw)[:nr])
    print(f"delta-map exactness: rec cols {ok8}, gidx col {okg} "
          f"(total={total}, nr={nr})")

    # scatter-only / cumsum-only splits
    def scat_only(a, acc):
        ce, cu, ne, r9 = a
        sidx = jnp.where(ne, depi(ce, acc), K_CAP + 1)
        eidx = jnp.where(ne, cu, K_CAP + 1)
        zz = jnp.zeros((K_CAP, 9), jnp.int32)
        zz = zz.at[sidx].add(r9, mode="drop", unique_indices=True)
        zz = zz.at[eidx].add(-r9, mode="drop", unique_indices=True)
        return jnp.sum(zz).astype(jnp.float32)
    timeit("  2x row9-scatter only", scat_only,
           (cum_excl, cum, nonempty, rec9))

    zz0 = jnp.asarray(np.asarray(zz))
    def cs_only(a, acc):
        return jnp.sum(cumsum9(depi(a, acc))).astype(jnp.float32)
    timeit("  cumsum [k,9] only", cs_only, zz0)


if __name__ == "__main__":
    main()
