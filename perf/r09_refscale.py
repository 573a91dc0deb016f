"""Round-5 stage split at the REFERENCE scale (2,233,571 Gaussians,
376x1408 — the recorded mid-training shape at
/root/reference/gaussian_renderer/__init__.py:116-118).

The round-4 verdict's top item: 2.23M runs at 1.869 Mpix/s (19% of the
10 Mpix/s nominal baseline) and nobody has published WHERE the ~283 ms/step
goes at this scale. This harness measures every stage with the in-jit loop
differencing method, at the exact auto-sized caps bench.py would use, plus
the 16x32 tile A/B (compact off — the n-gate disables the J-scans here).

Run on TPU:  python perf/r09_refscale.py        (~10 min warm cache)
Env: VEGS_R09_N (default 2233571), VEGS_R09_TILES=16x16,16x32
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

from tests.utils import make_camera, random_gaussians
from vegs_tpu import geometry
from vegs_tpu.ops import binning
from vegs_tpu.ops.projection import project
from vegs_tpu.ops.rasterize import (RasterizeConfig, build_payload,
                                    gather_expand, rasterize)
from vegs_tpu.ops import blend_pallas

H, W = 376, 1408
N = int(os.environ.get("VEGS_R09_N", "2233571"))


def timeit(name, fn, args, iters=6):
    @functools.partial(jax.jit, static_argnums=(1,))
    def loop(args, n):
        def body(i, carry):
            args, acc = carry
            a2, s = fn(args, acc)
            return a2, acc + s * 1e-20
        return jax.lax.fori_loop(0, n, body, (args, 0.0))[1]

    float(loop(args, 1))
    t0 = time.time(); float(loop(args, 1)); t1 = time.time()
    float(loop(args, 1 + iters))
    t2 = time.time(); float(loop(args, 1 + iters)); t3 = time.time()
    ms = ((t3 - t2) - (t1 - t0)) / iters * 1e3
    print(f"{name:52s} {ms:9.2f} ms", flush=True)
    return ms


def dep(x, acc):
    return x + jnp.sin(acc) * 1e-20


def build_scene():
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
    return cam, means, quats, scales, opac, shs


def size_caps(cam, means, quats, scales, opac, shs, tile_h, tile_w,
              compact=None, sat=True):
    from vegs_tpu.ops import satcull
    from vegs_tpu.ops.rasterize import build_payload

    probe_cap = (1 << 23) - 512
    grid = binning.TileGrid.for_image(H, W, tile_h, tile_w)
    cov6 = geometry.cov6_from_scaling_rotation(scales, quats)
    proj = project(means, cov6, opac, shs, cam)
    rb = binning.bin_raw(
        proj.means2d, proj.depths, proj.radii_xy, grid, probe_cap,
        conics=proj.conics, opacities=proj.opacities, compact=compact)
    sat_counts = None
    if sat:
        qn = geometry.quat_standardize(geometry.quat_normalize(quats))
        pf, _ = build_payload(proj, qn, scales, jnp.bfloat16)
        pf_sorted = jnp.pad(pf, ((0, 1), (0, 0)))[rb.gidx_sorted]
        sat_counts = satcull.satcount(pf_sorted.T, rb.raw_starts, grid)
    pb = binning.bin_gaussians(
        proj.means2d, proj.depths, proj.radii_xy, grid, probe_cap,
        conics=proj.conics, opacities=proj.opacities, compact=compact,
        rb=rb, sat_counts=sat_counts)
    r512 = lambda v: (int(v * 1.05) + 511) // 512 * 512
    k_cap = min(probe_cap, r512(int(rb.total)))
    k_pad = min(probe_cap, r512(int(pb.tile_starts[-1])))
    print(f"# tiles {tile_h}x{tile_w} sat={sat}: raw need {int(rb.total)} "
          f"-> {k_cap}, padded need {int(pb.tile_starts[-1])} -> {k_pad}",
          flush=True)
    return grid, k_cap, k_pad


def main():
    cam, means, quats, scales, opac, shs = build_scene()
    bg = jnp.zeros(3)
    args0 = (means, quats, scales, opac, shs)

    tiles = os.environ.get("VEGS_R09_TILES", "16x16")
    sat_on = os.environ.get("VEGS_R09_SAT", "1") != "0"
    for spec in tiles.split(","):
        th, tw = (int(x) for x in spec.split("x"))
        grid, k_cap, k_pad = size_caps(cam, means, quats, scales, opac, shs,
                                       th, tw, sat=sat_on)
        cfg = RasterizeConfig(backend="pallas", k_cap=k_cap, k_pad=k_pad,
                              tile_h=th, tile_w=tw, sat_cull=sat_on)

        def full_fb(args, acc, cfg=cfg):
            m, q, s, o, sh = args
            def loss(m, q, s, o, sh):
                out = rasterize(m, q, s, o, sh, cam, bg=bg, config=cfg)
                return jnp.mean(out.rgb ** 2) + 0.01 * jnp.mean(out.depth ** 2)
            l, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(
                dep(m, acc), q, s, o, sh)
            return args, l + sum(jnp.sum(x) for x in g) * 1e-9
        ms = timeit(f"[{spec}] full fwd+bwd", full_fb, args0)
        print(f"  -> {H * W / ms / 1e3:.3f} Mpix/s", flush=True)

        def full_fwd(args, acc, cfg=cfg):
            m, q, s, o, sh = args
            out = rasterize(dep(m, acc), q, s, o, sh, cam, bg=bg, config=cfg)
            return args, jnp.sum(out.rgb) + jnp.sum(out.depth)
        timeit(f"[{spec}] full forward", full_fwd, args0)

    # ---- fine-grained stages at the default 16x16 shape ------------------
    grid, k_cap, k_pad = size_caps(cam, means, quats, scales, opac, shs,
                                   16, 16, sat=sat_on)
    cfg = RasterizeConfig(backend="pallas", k_cap=k_cap, k_pad=k_pad,
                          sat_cull=sat_on)

    cov6 = geometry.cov6_from_scaling_rotation(scales, quats)

    def proj_fb(args, acc):
        m, q, s, o, sh = args
        def loss(m, q, s, o, sh):
            c6 = geometry.cov6_from_scaling_rotation(s, q)
            p = project(m, c6, o, sh, cam)
            return (jnp.sum(p.means2d * 1e-6) + jnp.sum(p.rgb * 1e-6)
                    + jnp.sum(p.conics * 1e-9))
        l, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(
            dep(m, acc), q, s, o, sh)
        return args, l + sum(jnp.sum(x) for x in g) * 1e-9
    timeit("project (+cov6) fwd+bwd", proj_fb, args0)

    p = project(means, cov6, opac, shs, cam)

    def bin_full(args, acc):
        m2d, d, r = args
        b = binning.bin_gaussians(dep(m2d, acc), d, r, grid, k_cap,
                                  conics=p.conics, opacities=p.opacities,
                                  want_keys=False, k_pad=k_pad)
        return args, jnp.sum(b.gidx).astype(jnp.float32)
    timeit("binning full (grad maps, no keys)", bin_full,
           (p.means2d, p.depths, p.radii_xy))

    def bin_raw_only(args, acc):
        m2d, d, r = args
        rb = binning.bin_raw(dep(m2d, acc), d, r, grid, k_cap,
                             conics=p.conics, opacities=p.opacities)
        return args, (jnp.sum(rb.key_sorted).astype(jnp.float32)
                      + jnp.sum(rb.gidx_sorted).astype(jnp.float32))
    timeit("bin_raw (expand+cull+sort3)", bin_raw_only,
           (p.means2d, p.depths, p.radii_xy))

    # sort-only at the real k: 3-operand
    keys = np.random.default_rng(1).integers(
        0, 2**30, size=k_cap, dtype=np.int32)
    vals = np.arange(k_cap, dtype=np.int32)

    def sort3(args, acc):
        k, v = args
        ks, vs, rs = jax.lax.sort(
            (k + (acc * 1e-20).astype(jnp.int32), v, v), num_keys=1)
        return args, jnp.sum(ks).astype(jnp.float32) * 1e-9
    timeit(f"lax.sort 3-operand at k={k_cap}", sort3,
           (jnp.asarray(keys), jnp.asarray(vals)))

    # ---- satcull prepass isolated ----------------------------------------
    from vegs_tpu.ops import satcull as _sc

    rb0 = binning.bin_raw(p.means2d, p.depths, p.radii_xy, grid, k_cap,
                          conics=p.conics, opacities=p.opacities)
    quat_n0 = geometry.quat_standardize(geometry.quat_normalize(quats))
    pay_f32_0, _ = build_payload(p, quat_n0, scales, jnp.bfloat16)
    pf_pad0 = jnp.pad(pay_f32_0, ((0, 1), (0, 0)))

    def prepass_gather(args, acc):
        (pf,) = args
        g = dep(pf, acc)[rb0.gidx_sorted]
        return args, jnp.sum(g) * 1e-9
    timeit("satcull prepass gather [k_cap, 8]", prepass_gather, (pf_pad0,))

    pf_sorted0 = pf_pad0[rb0.gidx_sorted]

    def satcount_only(args, acc):
        (pfs,) = args
        c = _sc.satcount(dep(pfs, acc).T, rb0.raw_starts, grid)
        return args, jnp.sum(c).astype(jnp.float32) * 1e-6
    timeit("satcount kernel", satcount_only, (pf_sorted0,))

    sat0 = _sc.satcount(pf_sorted0.T, rb0.raw_starts, grid)
    print(f"# satcull keeps {int(jnp.sum(jnp.minimum(sat0, rb0.raw_starts[1:] - rb0.raw_starts[:-1])))} "
          f"of {int(rb0.num_real)} real instances", flush=True)

    # ---- gather_expand isolated (satcull binning when sat_on) ------------
    binned = binning.bin_gaussians(p.means2d, p.depths, p.radii_xy, grid,
                                   k_cap, conics=p.conics,
                                   opacities=p.opacities, k_pad=k_pad,
                                   rb=rb0 if sat_on else None,
                                   sat_counts=sat0 if sat_on else None)
    quat_n = geometry.quat_standardize(geometry.quat_normalize(quats))
    pay_f32, pay_aux = build_payload(p, quat_n, scales, jnp.bfloat16)
    pf_pad = jnp.pad(pay_f32, ((0, 1), (0, 0)))
    pa_pad = jnp.pad(pay_aux, ((0, 1), (0, 0)))
    ends_e = jnp.concatenate([binned.gauss_ends, binned.gauss_ends[-1:]])

    def ge_fwd(args, acc):
        pf, pa = args
        a, b = gather_expand(dep(pf, acc), pa, binned.gidx, binned.order,
                             ends_e)
        return args, jnp.sum(a) * 1e-9 + jnp.sum(b.astype(jnp.float32)) * 1e-9
    timeit("gather_expand fwd", ge_fwd, (pf_pad, pa_pad))

    def ge_fb(args, acc):
        pf, pa = args
        def loss(pf, pa):
            a, b = gather_expand(pf, pa, binned.gidx, binned.order, ends_e)
            return jnp.sum(a) * 1e-9 + jnp.sum(b.astype(jnp.float32)) * 1e-9
        l, g = jax.value_and_grad(loss, argnums=(0, 1))(dep(pf, acc), pa)
        return args, l + sum(jnp.sum(x.astype(jnp.float32)) for x in g) * 1e-9
    timeit("gather_expand fwd+bwd", ge_fb, (pf_pad, pa_pad))

    # ---- blend isolated --------------------------------------------------
    pf_e, pa_e = gather_expand(pf_pad, pa_pad, binned.gidx, binned.order,
                               ends_e)
    hp, wp = grid.nty * grid.tile_h, grid.ntx * grid.tile_w

    def blend_fwd(args, acc):
        pf, pa = args
        out = blend_pallas.blend(dep(pf, acc).T, pa.T, binned.tile_starts,
                                 grid, hp, wp)
        return args, jnp.sum(out[:3])
    timeit("blend fwd", blend_fwd, (pf_e, pa_e))

    def blend_fb(args, acc):
        pf, pa = args
        def loss(pf, pa):
            out = blend_pallas.blend(pf.T, pa.T, binned.tile_starts,
                                     grid, hp, wp)
            return jnp.mean(out[:3] ** 2)
        l, g = jax.value_and_grad(loss, argnums=(0, 1))(dep(pf, acc), pa)
        return args, l + sum(jnp.sum(x.astype(jnp.float32)) for x in g) * 1e-9
    timeit("blend fwd+bwd", blend_fb, (pf_e, pa_e))

    # instance statistics for the saturation analysis
    nk = int(binned.num_instances)
    print(f"# kept instances {nk} over {grid.num_tiles} tiles "
          f"({nk / grid.num_tiles:.1f}/tile, "
          f"{nk / (H * W):.2f}/pixel)", flush=True)


if __name__ == "__main__":
    main()
