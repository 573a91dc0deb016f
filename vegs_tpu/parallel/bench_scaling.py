"""Data-parallel scaling benchmark: rays/s at 1..N devices.

Measures the north-star scaling-efficiency metric (BASELINE.md: >=0.9 linear
from 1 chip to N) by running the DP train step on meshes of growing size with
one camera per device — throughput is rendered rays (pixels) per second
across the batch. On a CPU host this exercises the virtual-device mesh; on a
pod slice it measures real ICI scaling.

Usage:  python -m vegs_tpu.parallel.bench_scaling [--devices 1 2 4 8]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def run_tile(device_counts, n_gaussians=100_000, height=256, width=512,
             iters=4, backend="pallas"):
    """Tile-sharded single-render scaling: ONE image, Gaussians and tile
    rows both sharded over the mesh axis (parallel/tile_sharded.py). Each
    device touches N/D Gaussians and H/D pixel rows; the all_to_all splat
    exchange is the only cross-device traffic. Reports fwd+bwd rays/s."""
    if backend == "dense":
        n_gaussians = min(n_gaussians, 2_000)
        height, width = min(height, 64), min(width, 128)
    import jax
    import jax.numpy as jnp

    from tests.utils import make_camera, random_gaussians
    from ..ops.rasterize import RasterizeConfig
    from .gauss_sharded import shard_field_arrays
    from .tile_sharded import make_tile_mesh, make_tile_sharded_rasterize

    rng = np.random.default_rng(0)
    cam = make_camera(height=height, width=width)
    means, quats, scales, opac, shs = random_gaussians(rng, n_gaussians)
    bg = jnp.zeros(3)
    cfg = RasterizeConfig(
        backend=backend, k_cap=(1 << 14) if backend == "dense" else (1 << 19))

    results = {}
    for nd in device_counts:
        if nd > len(jax.devices()):
            continue
        mesh = make_tile_mesh(nd)
        fn = make_tile_sharded_rasterize(mesh, cam, cfg)
        sharded = shard_field_arrays(
            mesh, means, quats, scales, opac, shs,
            jnp.ones((n_gaussians,), bool))

        def loss(m):
            rgb, _, _, _ = fn(m, *sharded[1:], bg)
            return jnp.mean(rgb ** 2)

        grad = jax.jit(jax.grad(loss))
        g = grad(sharded[0])
        float(jnp.sum(g))  # sync
        t0 = time.time()
        for _ in range(iters):
            g = grad(sharded[0])
        float(jnp.sum(g))
        dt = (time.time() - t0) / iters
        results[nd] = {"sec_per_step": dt,
                       "rays_per_s": height * width / dt}

    base = results.get(device_counts[0], {}).get("sec_per_step")
    for nd, r in results.items():
        # one image split D ways: ideal is CONSTANT rays/s with 1/D the
        # per-device memory/FLOPs — report speedup vs the smallest mesh
        r["speedup"] = base / r["sec_per_step"] if base else None
    return results


def run(device_counts, n_gaussians=100_000, height=256, width=512,
        iters=4, backend="pallas"):
    if backend == "dense":
        # The dense reference blend materializes [k_cap, H*W] — usable only
        # at test scale. Shrink so the CPU path stays in memory.
        n_gaussians = min(n_gaussians, 2_000)
        height, width = min(height, 48), min(width, 128)
    import jax
    import jax.numpy as jnp

    from tests.utils import make_camera, random_gaussians
    from .. import gaussians, optim
    from ..config import OptimizationParams
    from ..gaussians import DensifyStats
    from ..ops.rasterize import RasterizeConfig
    from .mesh import make_mesh
    from .sharded_step import make_dp_train_step, stack_camera_batch

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(n_gaussians, 3)).astype(np.float32) * 8
    pts[:, 2] = np.abs(pts[:, 2]) + 2
    cols = rng.uniform(0, 1, (n_gaussians, 3)).astype(np.float32)
    field = gaussians.create_from_points(pts, cols)
    raster = RasterizeConfig(
        backend=backend, k_cap=(1 << 13) if backend == "dense" else (1 << 19))

    results = {}
    for nd in device_counts:
        if nd > len(jax.devices()):
            continue
        mesh = make_mesh(nd)
        cams = []
        for i in range(nd):
            th = 2 * np.pi * i / max(nd, 1)
            R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                          [-np.sin(th), 0, np.cos(th)]])
            cams.append(make_camera(height=height, width=width, R=R,
                                    t=np.array([0, 0, 10.0])))
        step = make_dp_train_step(mesh, OptimizationParams(), raster,
                                  spatial_scale=8.0, height=height,
                                  width=width)
        cam_batch = stack_camera_batch(cams)
        gt = jnp.zeros((nd, 3, height, width))
        nm = jnp.zeros((nd, 3, height, width))
        args = (field, optim.adam_init(field),
                DensifyStats.zeros(field.capacity), jnp.int32(0),
                cam_batch, gt, nm, jnp.int32(3), jnp.zeros(3))

        out = step(*args)
        float(out[4]["loss"])  # sync
        t0 = time.time()
        for _ in range(iters):
            out = step(*args)
        float(out[4]["loss"])
        dt = (time.time() - t0) / iters
        rays_s = nd * height * width / dt
        results[nd] = {"sec_per_step": dt, "rays_per_s": rays_s}

    base = results.get(device_counts[0], {}).get("rays_per_s")
    for nd, r in results.items():
        r["scaling_eff"] = (
            r["rays_per_s"] / (base * nd / device_counts[0]) if base else None)
    return results


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", nargs="+", type=int, default=[1, 2, 4, 8])
    ap.add_argument("--backend", default="pallas")
    ap.add_argument("--mode", default="dp", choices=["dp", "tile"])
    args = ap.parse_args()
    fn = run_tile if args.mode == "tile" else run
    print(json.dumps(fn(args.devices, backend=args.backend), indent=2))
