"""End-to-end quality evidence (round-1 verdict item 4).

Trains the config-2 static pipeline (L1+SSIM, Adam schedules, SH warm-up,
densify/prune, opacity reset) on the independent ray-traced street scene
(vegs_tpu.utils.synthetic — GT renderer shares no code with the Gaussian
rasterizer) from a COLMAP-style noisy surface sampling, reports the held-out
PSNR trend (reference split: idx % 8 == 0, dataset_readers.py:605-607), and
writes QUALITY_r02.md.

Run (TPU, pallas backend — the production path):
  python perf/quality_r02.py
Run (CPU, dense golden backend — slow, ~hours):
  PYTHONPATH=. JAX_PLATFORMS=cpu VEGS_QUALITY_BACKEND=dense python perf/quality_r02.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache_cpu"))
os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

BACKEND = os.environ.get("VEGS_QUALITY_BACKEND", "pallas")
if BACKEND == "dense":
    jax.config.update("jax_platforms", "cpu")
    from jax._src import xla_bridge as _xb

    # A downed TPU tunnel makes axon plugin init hang
    # (see tests/conftest.py).
    _xb._backend_factories.pop("axon", None)

    if _xb.backends_are_initialized():
        from jax.extend.backend import clear_backends

        clear_backends()

import numpy as np

H, W = 64, 128  # ntx divides the 8-tile program width exactly
N_CAMS = 17
ITERS = 1000
EVAL_EVERY = 100


def build_trainer(tmp="/tmp/vegs_quality_r02"):
    from vegs_tpu.config import VegsConfig
    from vegs_tpu.ops.rasterize import RasterizeConfig
    from vegs_tpu.scene import Scene, dataset_readers as dr
    from vegs_tpu.train import Trainer
    from vegs_tpu.utils import synthetic as syn

    rng = np.random.default_rng(0)
    infos = syn.street_camera_infos(N_CAMS, H, W)
    train_infos = [c for i, c in enumerate(infos) if i % 8 != 0]
    test_infos = [c for i, c in enumerate(infos) if i % 8 == 0]
    pts, cols = syn.sample_scene_points(rng, n_ground=3000, n_box=600)
    pcd = dr.BasicPointCloud(pts, cols)
    info = dr.SceneInfo(
        point_cloud=pcd, train_cameras=train_infos, test_cameras=test_infos,
        nerf_normalization=dr.getNerfppNorm(infos, pcd), ply_path="")

    cfg = VegsConfig()
    cfg.model.model_path = tmp
    cfg.opt.densify_from_iter = 100
    cfg.opt.densification_interval = 100
    cfg.opt.densify_until_iter = 700
    cfg.opt.opacity_reset_interval = 10_000
    # toy-scale NDC gradients are larger than KITTI-scale: raise tau a bit
    cfg.opt.densify_grad_threshold = 0.0004
    scene = Scene(cfg.model, scene_info=info, shuffle=False)
    raster = RasterizeConfig(backend=BACKEND, k_cap=1 << 14)
    return Trainer(cfg, scene, raster_cfg=raster, rng_seed=3)


def main():
    tr = build_trainer()
    t0 = time.time()
    trend = []
    e0 = tr.evaluate()
    trend.append((0, e0["psnr"], int(tr.state.field.num_active())))
    print(f"iter 0: psnr {e0['psnr']:.2f} n={trend[-1][2]}", flush=True)
    for it in range(1, ITERS + 1):
        t_it = time.time()
        tr.train_iteration(it)
        if it <= 3 or it % 10 == 0:
            print(f"  it {it}: {time.time()-t_it:.1f}s "
                  f"(total {time.time()-t0:.0f}s)", flush=True)
        if it % EVAL_EVERY == 0:
            e = tr.evaluate()
            n = int(tr.state.field.num_active())
            trend.append((it, e["psnr"], n))
            print(f"iter {it}: psnr {e['psnr']:.2f} n={n} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    lines = [
        "# QUALITY_r02 — end-to-end training quality evidence",
        "",
        "No real dataset ships in this image (zero egress), so the oracle is",
        "an INDEPENDENT ray-traced street scene (`vegs_tpu/utils/synthetic.py`:",
        "checkerboard ground + lambertian boxes + sky; the GT renderer shares",
        "no code or representation with the Gaussian rasterizer). Training",
        "starts from a COLMAP-style noisy surface sampling and runs the full",
        "config-2 pipeline: L1+SSIM, Adam schedules, SH warm-up, densify",
        f"window [100, 700] every 100, at {H}x{W}, {N_CAMS} cameras with the",
        "reference idx%8 test split.",
        "",
        "| iteration | held-out PSNR (dB) | active Gaussians |",
        "|---|---|---|",
    ]
    for it, p, n in trend:
        lines.append(f"| {it} | {p:.2f} | {n} |")
    lines += [
        "",
        f"Wall-clock: {time.time()-t0:.0f} s "
        f"({BACKEND} backend on {jax.devices()[0].platform}).",
        "Reproduce: `python perf/quality_r02.py` (TPU, pallas backend) or",
        "`JAX_PLATFORMS=cpu VEGS_QUALITY_BACKEND=dense python"
        " perf/quality_r02.py` (CPU golden).",
        "The slow-tier test `tests/test_training.py::test_static_training_descends`",
        "asserts loss descent on a shorter budget in CI.",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "QUALITY_r02.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
