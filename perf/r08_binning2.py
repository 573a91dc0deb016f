"""Round-4 binning micro-A/B at the new bench config (16x32 tiles,
cull-compact, k_cap/k_pad split).

Targets:
  1. pad_relayout's carry pull when want_keys=False (production pallas
     path): 1-col gather vs packing carry into a row-2 gather (measured
     round-3: 1-D random gather ~7.6 ms/M vs row-2 ~4 ms/M — the
     want_keys gating may have REGRESSED the pallas path).
  2. Stage totals after the rework (bin_raw / full bin / order block).

Run on TPU:  python perf/r08_binning2.py
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
TILE_H, TILE_W = 16, 32


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
    grid = binning.TileGrid.for_image(H, W, TILE_H, TILE_W)
    cov6 = geometry.cov6_from_scaling_rotation(scales, quats)
    proj = jax.jit(project)(means, cov6, opac, shs, cam)
    m2d = jax.lax.stop_gradient(proj.means2d)
    dpt = jax.lax.stop_gradient(proj.depths)
    con = jax.lax.stop_gradient(proj.conics)
    ops_ = jax.lax.stop_gradient(proj.opacities)
    rxy = proj.radii_xy

    rb0 = jax.jit(lambda: binning.bin_raw(
        m2d, dpt, rxy, grid, 1 << 21, conics=con, opacities=ops_))()
    k_raw = min(1 << 21, (int(rb0.total) * 21 // 20 + 511) // 512 * 512)
    b0 = jax.jit(lambda: binning.bin_gaussians(
        m2d, dpt, rxy, grid, k_raw, conics=con, opacities=ops_))()
    k_pad = (int(b0.tile_starts[-1]) * 21 // 20 + 511) // 512 * 512
    print(f"k_raw {k_raw}, k_pad {k_pad}, kept {int(b0.num_instances)}")

    def full_bin(a, acc):
        m, d, r, c, o = a
        b = binning.bin_gaussians(dep(m, acc), d, r, grid, k_raw,
                                  conics=c, opacities=o, want_keys=False,
                                  k_pad=k_pad)
        return (jnp.sum(b.gidx) + jnp.sum(b.order)).astype(jnp.float32)
    timeit("bin_gaussians FULL (want_keys=False, split)", full_bin,
           (m2d, dpt, rxy, con, ops_))

    def full_bin_keys(a, acc):
        m, d, r, c, o = a
        b = binning.bin_gaussians(dep(m, acc), d, r, grid, k_raw,
                                  conics=c, opacities=o, want_keys=True,
                                  k_pad=k_pad)
        return (jnp.sum(b.gidx) + jnp.sum(b.order)
                + jnp.sum(b.sort_keys)).astype(jnp.float32)
    timeit("bin_gaussians FULL (want_keys=True row-2 pull)", full_bin_keys,
           (m2d, dpt, rxy, con, ops_))

    def raw_only(a, acc):
        m, d, r, c, o = a
        rb = binning.bin_raw(dep(m, acc), d, r, grid, k_raw,
                             conics=c, opacities=o)
        return (jnp.sum(rb.key_sorted) + jnp.sum(rb.gidx_sorted)).astype(
            jnp.float32)
    timeit("bin_raw only (sort3 + compact expand)", raw_only,
           (m2d, dpt, rxy, con, ops_))

    def raw_nogradmaps(a, acc):
        m, d, r, c, o = a
        rb = binning.bin_raw(dep(m, acc), d, r, grid, k_raw,
                             conics=c, opacities=o, want_rawslot=False)
        return (jnp.sum(rb.key_sorted) + jnp.sum(rb.gidx_sorted)).astype(
            jnp.float32)
    timeit("bin_raw sort2 (no rawslot operand)", raw_nogradmaps,
           (m2d, dpt, rxy, con, ops_))

    # isolated: the two pad_relayout pull variants at this shape
    rb = jax.jit(lambda: binning.bin_raw(
        m2d, dpt, rxy, grid, k_raw, conics=con, opacities=ops_))()
    ks, gs, rs = rb.key_sorted, rb.gidx_sorted, rb.raw_starts

    def relay_1col(a, acc):
        ks_, gs_, rs_ = a
        carry, keys, starts, kept = binning.pad_relayout(
            dep(ks_, acc), gs_, rs_, grid.num_tiles, k_pad, dummy=N,
            want_keys=False)
        return jnp.sum(carry).astype(jnp.float32)
    timeit("pad_relayout want_keys=False (1-col gather)", relay_1col,
           (ks, gs, rs))

    def relay_row2(a, acc):
        ks_, gs_, rs_ = a
        carry, keys, starts, kept = binning.pad_relayout(
            dep(ks_, acc), gs_, rs_, grid.num_tiles, k_pad, dummy=N,
            want_keys=True)
        return (jnp.sum(carry) + jnp.sum(keys)).astype(jnp.float32)
    timeit("pad_relayout want_keys=True (row-2 gather)", relay_row2,
           (ks, gs, rs))


if __name__ == "__main__":
    main()
