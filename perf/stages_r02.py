"""Stage-by-stage timing of the rasterization step at the bench workload.

Each timing uses the in-jit loop differencing method (see micro_r02.py).
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
from vegs_tpu.ops.rasterize import RasterizeConfig, gather_expand, rasterize
from vegs_tpu.ops import blend_pallas

H, W = 376, 1408
N = 500_000
K_CAP = 1126912


def timeit(name, fn, args, iters=8):
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
    print(f"{name:45s} {ms:9.2f} ms")
    return ms


def main():
    cam = make_camera(height=H, width=W, fovx=1.2, fovy=0.4)
    rng = np.random.default_rng(0)
    means, quats, scales, opac, shs = random_gaussians(
        rng, N, depth_range=(2.0, 60.0), xy_extent=40.0,
        scale_range=(0.002, 0.025))
    z = np.asarray(rng.uniform(2.0, 60.0, N), np.float32)
    u = rng.uniform(-0.95, 0.95, N)
    v = rng.uniform(-0.95, 0.95, N)
    means = jnp.asarray(np.stack([
        z * np.tan(0.6) * u, z * np.tan(0.2) * v, z], axis=1, dtype=np.float32))
    grid = binning.TileGrid.for_image(H, W)
    bg = jnp.zeros(3)
    cfg = RasterizeConfig(backend="pallas", k_cap=K_CAP)

    def dep(x, acc):
        return x + jnp.sin(acc) * 1e-20

    args0 = (means, quats, scales, opac, shs)

    # --- full fwd only ----------------------------------------------------
    def full_fwd(args, acc):
        m, q, s, o, sh = args
        out = rasterize(dep(m, acc), q, s, o, sh, cam, bg=bg, config=cfg)
        return args, jnp.sum(out.rgb) + jnp.sum(out.depth)
    timeit("full forward", full_fwd, args0)

    # --- full fwd+bwd -----------------------------------------------------
    def full_fb(args, acc):
        m, q, s, o, sh = args
        def loss(m, q, s, o, sh):
            out = rasterize(m, q, s, o, sh, cam, bg=bg, config=cfg)
            return jnp.mean(out.rgb ** 2) + 0.01 * jnp.mean(out.depth ** 2)
        l, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(
            dep(m, acc), q, s, o, sh)
        return args, l + sum(jnp.sum(x) for x in g) * 1e-9
    timeit("full fwd+bwd", full_fb, args0)

    # --- project only -----------------------------------------------------
    cov6 = geometry.cov6_from_scaling_rotation(scales, quats)
    def proj_only(args, acc):
        m, c6, o, sh = args
        p = project(dep(m, acc), c6, o, sh, cam)
        return args, jnp.sum(p.means2d) + jnp.sum(p.rgb)
    timeit("project", proj_only, (means, cov6, opac, shs))

    # --- binning ----------------------------------------------------------
    p = project(means, cov6, opac, shs, cam)
    def bin_only(args, acc):
        m2d, d, r = args
        b = binning.bin_gaussians(dep(m2d, acc), d, r, grid, K_CAP,
                                  conics=p.conics, opacities=p.opacities)
        return args, jnp.sum(b.gidx).astype(jnp.float32)
    timeit("binning", bin_only, (p.means2d, p.depths, p.radii_xy))

    # --- gather fwd (with vjp-fwd precompute) + transposes ----------------
    binned = binning.bin_gaussians(p.means2d, p.depths, p.radii_xy, grid, K_CAP,
                                   conics=p.conics, opacities=p.opacities)
    pay_f32 = jnp.concatenate(
        [p.means2d, p.conics, p.opacities[:, None], p.depths[:, None],
         jnp.zeros((N, 1), jnp.float32)], axis=1)
    pay_aux = jnp.concatenate(
        [p.rgb, geometry.quat_standardize(geometry.quat_normalize(quats)),
         scales, jnp.zeros((N, 6), jnp.float32)], axis=1).astype(jnp.bfloat16)
    pf_pad = jnp.pad(pay_f32, ((0, 1), (0, 0)))
    pa_pad = jnp.pad(pay_aux, ((0, 1), (0, 0)))
    order_e = binned.order
    ends_e = jnp.concatenate([binned.gauss_ends, binned.gauss_ends[-1:]])

    def gather_primal(args, acc):
        pf, pa, gidx = args
        a, b = gather_expand(dep(pf, acc), pa, gidx, order_e, ends_e)
        return args, jnp.sum(a.T) + jnp.sum(b.T).astype(jnp.float32)
    timeit("gather_expand primal+T", gather_primal, (pf_pad, pa_pad, binned.gidx))

    def gather_fb(args, acc):
        pf, pa, gidx = args
        def loss(pf, pa):
            a, b = gather_expand(pf, pa, gidx, order_e, ends_e)
            return jnp.sum(a.T * 1e-6) + jnp.sum(b.T.astype(jnp.float32) * 1e-6)
        l, g = jax.value_and_grad(loss, argnums=(0, 1))(dep(pf, acc), pa)
        return args, l + jnp.sum(g[0]) * 1e-9
    timeit("gather_expand fwd+bwd (vjp+reduce)", gather_fb,
           (pf_pad, pa_pad, binned.gidx))

    # --- blend kernels ----------------------------------------------------
    pf_i, pa_i = gather_expand(pf_pad, pa_pad, binned.gidx, order_e, ends_e)
    payload_f32 = pf_i.T
    payload_aux = pa_i.T
    hp, wp = grid.nty * grid.tile_h, grid.ntx * grid.tile_w

    def blend_fwd(args, acc):
        pfi, pai, ts = args
        out = blend_pallas.blend(dep(pfi, acc), pai, ts, grid, hp, wp)
        return args, jnp.sum(out)
    timeit("blend fwd", blend_fwd, (payload_f32, payload_aux, binned.tile_starts))

    def blend_fb(args, acc):
        pfi, pai, ts = args
        def loss(pfi, pai):
            out = blend_pallas.blend(pfi, pai, ts, grid, hp, wp)
            return jnp.sum(out)
        l, g = jax.value_and_grad(loss, argnums=(0, 1))(dep(pfi, acc), pai)
        return args, l + jnp.sum(g[0]) * 1e-9
    timeit("blend fwd+bwd", blend_fb,
           (payload_f32, payload_aux, binned.tile_starts))




def bisect():
    """Bisect full forward: run rasterize's internals up to successive stages."""
    cam = make_camera(height=H, width=W, fovx=1.2, fovy=0.4)
    rng = np.random.default_rng(0)
    means, quats, scales, opac, shs = random_gaussians(
        rng, N, depth_range=(2.0, 60.0), xy_extent=40.0,
        scale_range=(0.002, 0.025))
    z = np.asarray(rng.uniform(2.0, 60.0, N), np.float32)
    u = rng.uniform(-0.95, 0.95, N)
    v = rng.uniform(-0.95, 0.95, N)
    means = jnp.asarray(np.stack([
        z * np.tan(0.6) * u, z * np.tan(0.2) * v, z], axis=1, dtype=np.float32))
    grid = binning.TileGrid.for_image(H, W)

    def dep(x, acc):
        return x + jnp.sin(acc) * 1e-20

    def upto(stage):
        def fn(args, acc):
            m, q, s, o, sh = args
            m = dep(m, acc)
            cov6 = geometry.cov6_from_scaling_rotation(s, q)
            p = project(m, cov6, o, sh, cam)
            if stage == "project":
                return args, jnp.sum(p.means2d) + jnp.sum(p.rgb) + jnp.sum(p.conics)
            quat_n = geometry.quat_standardize(geometry.quat_normalize(q))
            pay_f32 = jnp.concatenate(
                [p.means2d, p.conics, p.opacities[:, None], p.depths[:, None],
                 jnp.zeros((N, 1), jnp.float32)], axis=1)
            pay_aux = jnp.concatenate(
                [p.rgb, quat_n, s, jnp.zeros((N, 6), jnp.float32)],
                axis=1).astype(jnp.bfloat16)
            b = binning.bin_gaussians(
                jax.lax.stop_gradient(p.means2d), jax.lax.stop_gradient(p.depths),
                p.radii_xy, grid, K_CAP)
            if stage == "binning":
                return args, (jnp.sum(b.gidx) + jnp.sum(b.tile_starts)).astype(jnp.float32) + jnp.sum(pay_f32) + jnp.sum(pay_aux.astype(jnp.float32))
            pf, pa = gather_expand(
                jnp.pad(pay_f32, ((0, 1), (0, 0))),
                jnp.pad(pay_aux, ((0, 1), (0, 0))), b.gidx, b.order,
                jnp.concatenate([b.gauss_ends, b.gauss_ends[-1:]]))
            pfT, paT = pf.T, pa.T
            if stage == "gather":
                return args, jnp.sum(pfT[:, ::17]) + jnp.sum(paT[:, ::17]).astype(jnp.float32)
            hp, wp = grid.nty * grid.tile_h, grid.ntx * grid.tile_w
            out = blend_pallas.blend(pfT, paT, b.tile_starts, grid, hp, wp)
            return args, jnp.sum(out)
        return fn

    args0 = (means, quats, scales, opac, shs)
    for stage in ["project", "binning", "gather", "blend"]:
        timeit(f"fwd upto {stage}", upto(stage), args0)


if __name__ == "__main__":
    if "bisect" in sys.argv:
        bisect()
    else:
        main()
