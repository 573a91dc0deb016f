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
    # k_cap must hold the PADDED layout on the unsharded side too — a
    # capacity drop there shows up as a bogus "parity" failure (the sharded
    # side's k_blend is ~2x larger at the same config).
    cfg = RasterizeConfig(backend="pallas", k_cap=1 << 20)

    # 1. forward parity: unsharded pallas vs 1-device-mesh tile-sharded
    # pallas. These are two SEPARATE compilations, so bitwise equality is
    # not on the table (per-compilation FMA reassociation in the projection
    # chain; with bf16 payloads a 1-ulp f32 wobble near a bf16 rounding
    # boundary amplifies to a bf16 quantum, and near the alpha>=1/255 /
    # T<1e-4 thresholds it flips an instance in or out). The dense CPU-mesh
    # test (test_parallel.py) pins exact layout/tie-order equivalence; here
    # we pin "visually identical" (PSNR) on hardware, for f32 AND bf16.
    mesh = make_tile_mesh(1)
    for pdt in ("f32", "bf16"):
        c = cfg._replace(payload_dtype=pdt) if hasattr(cfg, "_replace") \
            else RasterizeConfig(backend="pallas", k_cap=1 << 20,
                                 payload_dtype=pdt)
        base = jax.jit(lambda m, c=c: rasterize(
            m, quats, scales, opac, shs, cam, bg=bg, config=c))
        out0 = base(means)
        assert int(out0.num_dropped) == 0
        shard_fn = make_tile_sharded_rasterize(mesh, cam, c)
        rgb1, depth1, alpha1, dropped = shard_fn(means, quats, scales, opac,
                                                 shs, valid, bg)
        d = jnp.abs(out0.rgb - rgb1)
        mse = float(jnp.mean(d ** 2))
        psnr_db = 10 * np.log10(1.0 / max(mse, 1e-12))
        print(f"[{pdt}] tile-sharded(1-dev) vs unsharded pallas: "
              f"max {float(jnp.max(d)):.3e} mean {float(jnp.mean(d)):.3e} "
              f"psnr {psnr_db:.1f} dB, dropped={int(dropped)}", flush=True)
        assert psnr_db > 45.0, psnr_db
    shard_fn = make_tile_sharded_rasterize(mesh, cam, cfg)

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
    # Pin the big per-step inputs on device ONCE: over the tunnel every
    # call otherwise re-uploads gt+normal (~12 MB) and block_until_ready
    # does not truly sync (NOTES_PERF hazards), so a naive
    # time-one-call measurement reports transfer time, not step time.
    gt = jax.device_put(jnp.zeros((3, H, W)))
    normal = jax.device_put(jnp.zeros((3, H, W)))
    t0 = time.time()
    sf, so, ss, step, met = step_fn(sf, so, ss, jnp.int32(0), cam, gt,
                                    normal, jnp.int32(3), bg)
    loss0 = float(met["loss"])            # host fetch = true sync
    t_compile = time.time() - t0
    t0 = time.time()
    sf, so, ss, step, met = step_fn(sf, so, ss, step, cam, gt, normal,
                                    jnp.int32(3), bg)
    l1 = float(met["loss"])
    t1 = time.time() - t0
    t0 = time.time()
    for _ in range(4):
        sf, so, ss, step, met = step_fn(sf, so, ss, step, cam, gt, normal,
                                        jnp.int32(3), bg)
    l2 = float(met["loss"])               # one fetch after 4 chained steps
    t4 = (time.time() - t0) / 4
    assert np.isfinite(loss0) and np.isfinite(l2)
    print(f"tp_trainer step (pallas, 1-dev mesh, 50k gauss @376x1408): "
          f"loss {loss0:.4f}->{l2:.4f}, first call {t_compile:.1f}s, "
          f"1-step (incl fetch) {t1*1e3:.0f} ms, chained steady "
          f"{t4*1e3:.0f} ms/step", flush=True)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
