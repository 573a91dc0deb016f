"""Tile-size sweep at the bench workload: bigger tiles mean fewer
boundary-crossing duplicates (smaller K for every O(K) stage: sorts,
gathers, segment reduce, blend superchunks) at the cost of more pixels per
blend program and a coarser early-exit. Measures fwd+bwd Mpix/s per tile
shape with per-shape auto-sized k_cap."""

import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W = 376, 1408
N = 500_000
K_CAP = 1 << 21
ITERS = 8


def main():
    import jax
    import jax.numpy as jnp

    from tests.utils import make_camera, random_gaussians
    from vegs_tpu import geometry
    from vegs_tpu.ops import binning
    from vegs_tpu.ops.projection import project
    from vegs_tpu.ops.rasterize import RasterizeConfig, rasterize

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
    bg = jnp.zeros(3)

    shapes = [(16, 16), (16, 32), (32, 32), (32, 16)]
    if len(sys.argv) > 1:
        shapes = [tuple(map(int, s.split("x"))) for s in sys.argv[1:]]

    for th, tw in shapes:
        grid = binning.TileGrid.for_image(H, W, th, tw)
        cov6 = geometry.cov6_from_scaling_rotation(scales, quats)
        proj = project(means, cov6, opac, shs, cam)
        probe = binning.bin_gaussians(
            proj.means2d, proj.depths, proj.radii_xy, grid, K_CAP,
            conics=proj.conics, opacities=proj.opacities)
        need = int(probe.tile_starts[-1])
        k_cap = min(K_CAP, (int(need * 1.05) + 511) // 512 * 512)
        chk = binning.bin_gaussians(
            proj.means2d, proj.depths, proj.radii_xy, grid, k_cap,
            conics=proj.conics, opacities=proj.opacities)
        nd = int(chk.num_dropped)
        print(f"# tile {th}x{tw}: need {need}, k_cap {k_cap}, dropped {nd}",
              file=sys.stderr, flush=True)
        if nd:
            k_cap = min(K_CAP, (k_cap * 5 // 4 + 511) // 512 * 512)

        cfg = RasterizeConfig(backend="pallas", k_cap=k_cap,
                              tile_h=th, tile_w=tw)

        @functools.partial(jax.jit, static_argnums=(5,))
        def fwdbwd_loop(means, quats, scales, opac, shs, iters, cfg=cfg):
            def loss(m, q, s, o, sh):
                out = rasterize(m, q, s, o, sh, cam, bg=bg, config=cfg)
                return jnp.mean(out.rgb ** 2) + 0.01 * jnp.mean(out.depth ** 2)

            def body(i, acc):
                m = means + jnp.sin(acc) * 1e-20
                l, g = jax.value_and_grad(loss)(m, quats, scales, opac, shs)
                return acc + l + jnp.sum(g) * 1e-9

            return jax.lax.fori_loop(0, iters, body, 0.0)

        args = (means, quats, scales, opac, shs)
        float(fwdbwd_loop(*args, 1))
        t0 = time.time(); float(fwdbwd_loop(*args, 1)); t1 = time.time()
        float(fwdbwd_loop(*args, 1 + ITERS))
        t2 = time.time(); float(fwdbwd_loop(*args, 1 + ITERS)); t3 = time.time()
        per_iter = ((t3 - t2) - (t1 - t0)) / ITERS
        mpixs = H * W / per_iter / 1e6
        print(json.dumps({"tile": f"{th}x{tw}", "k_cap": k_cap,
                          "mpixs": round(mpixs, 3)}), flush=True)


if __name__ == "__main__":
    main()
