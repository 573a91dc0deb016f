"""Real-chip validation of the sharded paths with the PALLAS backend
(round-2 verdict item 4).

Until now every tile_sharded / tp_trainer run used the dense golden backend
on the virtual CPU mesh; the shard_map + Pallas composition had never
executed on hardware. This script runs, on the one real TPU chip (1-device
mesh — all that exists behind the tunnel):

  1. tile-sharded rasterize (pallas) vs the unsharded production
     `ops.rasterize` (pallas) — forward parity at the bench workload shape.
  2. fwd+bwd throughput of both paths (same differencing harness as
     bench.py).
  3. one fully-sharded train step (make_tp_train_step, pallas backend) —
     compiles, runs, finite loss, step time recorded.

Results go into NOTES_PERF.md ("real-chip shard_map+pallas" section).

Run: python perf/r07_shard_pallas.py   (no PYTHONPATH override — it would
clobber /root/.axon_site where the TPU plugin registers)
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
N = 200_000
TIMING_ITERS = 4


def timed(fn, args, iters=TIMING_ITERS):
    @functools.partial(jax.jit, static_argnums=(1,))
    def loop(args, n):
        def body(i, acc):
            a0 = args[0] + jnp.sin(acc) * 1e-20
            return acc + fn((a0,) + args[1:])
        return jax.lax.fori_loop(0, n, body, 0.0)

    float(loop(args, 1))
    t0 = time.time(); float(loop(args, 1)); t1 = time.time()
    float(loop(args, 1 + iters))
    t2 = time.time(); float(loop(args, 1 + iters)); t3 = time.time()
    return ((t3 - t2) - (t1 - t0)) / iters


def main():
    from tests.utils import make_camera, random_gaussians
    from vegs_tpu.ops.rasterize import RasterizeConfig, rasterize
    from vegs_tpu.parallel.tile_sharded import (make_tile_mesh,
                                                make_tile_sharded_rasterize)

    print(f"devices: {jax.devices()}", flush=True)
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
    valid = jnp.ones((N,), bool)
    bg = jnp.zeros(3)
    cfg = RasterizeConfig(backend="pallas", k_cap=1 << 19)

    # 1. forward parity: unsharded pallas vs 1-device-mesh tile-sharded pallas
    base = jax.jit(lambda m: rasterize(m, quats, scales, opac, shs, cam,
                                       bg=bg, config=cfg))
    out0 = base(means)
    mesh = make_tile_mesh(1)
    shard_fn = make_tile_sharded_rasterize(mesh, cam, cfg)
    rgb1, depth1, alpha1, dropped = shard_fn(means, quats, scales, opac,
                                             shs, valid, bg)
    derr = float(jnp.max(jnp.abs(out0.rgb - rgb1)))
    print(f"tile-sharded(1-dev, pallas) vs rasterize(pallas): "
          f"max |rgb diff| = {derr:.3e}, dropped={int(dropped)}", flush=True)
    assert derr <= 1e-5, derr

    # 2. fwd+bwd throughput of both paths
    def loss_base(a):
        out = rasterize(a[0], quats, scales, opac, shs, cam, bg=bg,
                        config=cfg)
        return jnp.mean(out.rgb ** 2)

    def loss_shard(a):
        rgb, depth, alpha, _ = shard_fn(a[0], quats, scales, opac, shs,
                                        valid, bg)
        return jnp.mean(rgb ** 2)

    dt_b = timed(lambda a: jax.value_and_grad(loss_base)(a)[0], (means,))
    dt_s = timed(lambda a: jax.value_and_grad(loss_shard)(a)[0], (means,))
    print(f"fwd+bwd unsharded pallas:    {dt_b*1e3:8.2f} ms "
          f"({H*W/dt_b/1e6:.2f} Mpix/s)", flush=True)
    print(f"fwd+bwd tile-sharded pallas: {dt_s*1e3:8.2f} ms "
          f"({H*W/dt_s/1e6:.2f} Mpix/s)", flush=True)

    # 3. one fully-sharded (tp_trainer) step with the pallas backend
    from vegs_tpu import gaussians, optim
    from vegs_tpu.config import OptimizationParams
    from vegs_tpu.gaussians import DensifyStats
    from vegs_tpu.parallel.tp_trainer import (make_tp_train_step,
                                              shard_train_state)

    pts = np.asarray(means[:50_000])
    cols = rng.uniform(0, 1, (50_000, 3)).astype(np.float32)
    field = gaussians.create_from_points(pts, cols, capacity=1 << 16)
    sf, so, ss = shard_train_state(mesh, field, optim.adam_init(field),
                                   DensifyStats.zeros(field.capacity))
    tp_cfg = RasterizeConfig(backend="pallas", k_cap=1 << 18)
    step_fn = make_tp_train_step(mesh, OptimizationParams(), tp_cfg,
                                 spatial_scale=6.0, cam=cam)
    gt = jnp.zeros((3, H, W))
    normal = jnp.zeros((3, H, W))
    t0 = time.time()
    sf, so, ss, step, met = step_fn(sf, so, ss, jnp.int32(0), cam, gt,
                                    normal, jnp.int32(3), bg)
    jax.block_until_ready(sf.means)
    t_compile = time.time() - t0
    t0 = time.time()
    sf, so, ss, step, met = step_fn(sf, so, ss, step, cam, gt, normal,
                                    jnp.int32(3), bg)
    jax.block_until_ready(sf.means)
    t_step = time.time() - t0
    loss = float(met["loss"])
    assert np.isfinite(loss)
    print(f"tp_trainer step (pallas, 1-dev mesh, 50k gauss @376x1408): "
          f"loss {loss:.4f}, first call {t_compile:.1f}s, "
          f"steady step {t_step*1e3:.0f} ms (incl. ~40ms tunnel dispatch)",
          flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
