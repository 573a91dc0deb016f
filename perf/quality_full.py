"""FULL-MODEL end-to-end quality evidence (round-2 verdict item 2).

Config-5 shape on the independent ray-traced street oracle: normal-prior
covariance init + normal-guidance loss + ONE DYNAMIC BOX moving through the
scene (per-frame SE(3) annotations deliberately corrupted with noise so the
learned BoxDeltas have something to recover) + VGG perceptual loss +
(tiny-model) SD guidance window at the end — the structural analog of the
reference's full training loop (/root/reference/train.py:112-290).

Reports the held-out PSNR + SSIM trend (boxes composited into the eval
renders), the box-pose translation error before/after the learned deltas,
and wall-clock, into QUALITY_FULL_r03.md.

Run (TPU, pallas backend — the production path):
  python perf/quality_full.py
Run (CPU, dense golden backend — slow):
  PYTHONPATH=. JAX_PLATFORMS=cpu VEGS_QUALITY_BACKEND=dense \
  env -u PALLAS_AXON_POOL_IPS python perf/quality_full.py
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

    # A downed TPU tunnel makes axon plugin init hang (tests/conftest.py).
    _xb._backend_factories.pop("axon", None)

    if _xb.backends_are_initialized():
        from jax.extend.backend import clear_backends

        clear_backends()

import numpy as np

H, W = 64, 128
N_CAMS = 17
ITERS = int(os.environ.get("VEGS_QF_ITERS", "1000"))
EVAL_EVERY = 100
GUIDE_FROM = int(ITERS * 0.75)          # reference window: last 2.5% of 100k;
GUIDE_TO = ITERS                        # scaled up so it is actually exercised
BOX_NOISE_T = 0.08                      # annotation translation noise (m)


class _Box:
    def __init__(self, m):
        self.box2world = m


def build_scene_info(rng, h=None, w=None, n_cams=None, noise_t=None,
                     stereo_baseline=0.0):
    from vegs_tpu.scene import dataset_readers as dr
    from vegs_tpu.utils import synthetic as syn

    h = H if h is None else h
    w = W if w is None else w
    n_cams = N_CAMS if n_cams is None else n_cams
    noise_t = BOX_NOISE_T if noise_t is None else noise_t

    infos = syn.street_camera_infos(
        n_cams, h, w, moving_box=True, render_normal=True,
        stereo_baseline=stereo_baseline)
    train_infos = [c for i, c in enumerate(infos) if i % 8 != 0]
    test_infos = [c for i, c in enumerate(infos) if i % 8 == 0]

    pts, cols = syn.sample_scene_points(rng, n_ground=3000, n_box=600)
    pcd = dr.BasicPointCloud(pts, cols)

    # Mover: noisy per-frame annotations + a dynamic point cloud whose
    # world points are EXACT (ray-traced surface), so the canonical field
    # init sees the same noise a real detector/tracker would introduce.
    canon, ccols = syn.mover_canonical_points(rng, n=420)
    true_b2w, noisy_b2w = {}, {}
    dyn_pts, dyn_cols, dyn_ts = [], [], []
    for f in range(n_cams):
        m = syn.mover_box2world(f, n_cams)
        true_b2w[f] = m
        noise = np.eye(4, dtype=np.float32)
        noise[:3, 3] = rng.normal(0, noise_t, 3).astype(np.float32)
        noisy_b2w[f] = noise @ m
        wpts = (np.concatenate([canon, np.ones((len(canon), 1),
                                               np.float32)], 1)
                @ m.T)[:, :3]
        dyn_pts.append(wpts)
        dyn_cols.append(ccols)
        dyn_ts.append(np.full(len(canon), f))
    dyn = dr.DynamicPointCloud(
        points=np.concatenate(dyn_pts).astype(np.float32),
        colors=np.concatenate(dyn_cols).astype(np.float32),
        instances=np.full(sum(len(p) for p in dyn_pts), syn.MOVER_INSTANCE),
        timestamps=np.concatenate(dyn_ts))

    train_frames = {int(c.frame) for c in train_infos}
    info = dr.SceneInfo(
        point_cloud=pcd, train_cameras=train_infos, test_cameras=test_infos,
        nerf_normalization=dr.getNerfppNorm(infos, pcd), ply_path="",
        dyn_point_cloud=dyn,
        train_bboxes={f: {syn.MOVER_INSTANCE: _Box(noisy_b2w[f])}
                      for f in range(n_cams) if f in train_frames},
        test_bboxes={f: {syn.MOVER_INSTANCE: _Box(noisy_b2w[f])}
                     for f in range(n_cams) if f not in train_frames},
        instances_info=[syn.MOVER_INSTANCE])
    return info, true_b2w, noisy_b2w


def build_trainer(info, tmp="/tmp/vegs_quality_full"):
    from vegs_tpu.config import VegsConfig
    from vegs_tpu.diffusion.pipeline import DiffusionModels
    from vegs_tpu.losses.sd_guidance import SDGuidance
    from vegs_tpu.ops.rasterize import RasterizeConfig
    from vegs_tpu.priors import initialize_gaussians_with_window_normals
    from vegs_tpu.scene import Scene
    from vegs_tpu.train import Trainer

    cfg = VegsConfig()
    cfg.model.model_path = tmp
    cfg.opt.densify_from_iter = 100
    cfg.opt.densification_interval = 100
    cfg.opt.densify_until_iter = 700
    cfg.opt.opacity_reset_interval = 10_000
    cfg.opt.densify_grad_threshold = 0.0004   # toy-scale NDC grads
    # Perceptual loss ON (the reference declares the flag but never applies
    # it, train.py:98-100; here it contributes real gradients).
    cfg.sd.perceptual_loss = True
    cfg.sd.perceptual_loss_lambda = 0.01
    # Tiny-model SD guidance window at the end of training.
    cfg.sd.start_guiding_from_iter = GUIDE_FROM
    cfg.sd.end_guiding_at_iter = GUIDE_TO
    cfg.sd.sd_image_size = 32
    cfg.sd.sm_lambda = 1e-7

    scene = Scene(cfg.model, scene_info=info, shuffle=False)
    raster = RasterizeConfig(backend=BACKEND, k_cap=1 << 14)
    tr = Trainer(cfg, scene, raster_cfg=raster, rng_seed=3)

    # Normal-prior covariance init (reference train.py:81).
    tr.state = tr.state.replace(
        field=initialize_gaussians_with_window_normals(
            tr.state.field, scene.getTrainCameras()))

    models = DiffusionModels.tiny(jax.random.key(0), image_size=32)
    tr.sd_guidance = SDGuidance(models, guidance_mode="score-matching",
                                start_iter=GUIDE_FROM, max_iters=ITERS,
                                max_step=50)
    return tr


def box_pose_errors(tr, true_b2w):
    """Mean translation error of the (noisy annotation ∘ learned delta)
    box pose vs the TRUE pose, over train frames; plus the raw annotation
    error for reference."""
    from vegs_tpu import boxmodel
    import jax.numpy as jnp

    syn_inst = list(tr.scene.train_bboxes.values())[0]
    inst = list(syn_inst.keys())[0]
    errs_adj, errs_raw = [], []
    for f, boxes in tr.scene.train_bboxes.items():
        noisy = np.asarray(boxes[inst].box2world, np.float32)
        d = tr.frame_deltas.get((f, inst))
        adj = (np.asarray(boxmodel.adjust_box2world(
            jnp.asarray(noisy), d)) if d is not None else noisy)
        errs_adj.append(np.linalg.norm(adj[:3, 3] - true_b2w[f][:3, 3]))
        errs_raw.append(np.linalg.norm(noisy[:3, 3] - true_b2w[f][:3, 3]))
    return float(np.mean(errs_adj)), float(np.mean(errs_raw))


def main():
    rng = np.random.default_rng(7)
    info, true_b2w, noisy_b2w = build_scene_info(rng)
    tr = build_trainer(info)
    t0 = time.time()
    trend = []
    e0 = tr.evaluate(with_boxes=True, with_ssim=True)
    err_adj0, err_raw = box_pose_errors(tr, true_b2w)
    trend.append((0, e0["psnr"], e0["ssim"],
                  int(tr.state.field.num_active()), err_adj0))
    print(f"iter 0: psnr {e0['psnr']:.2f} ssim {e0['ssim']:.3f} "
          f"box-err {err_adj0:.3f} (raw {err_raw:.3f})", flush=True)
    guided = 0
    for it in range(1, ITERS + 1):
        t_it = time.time()
        m = tr.train_iteration(it)
        guided += 1 if "guidance_loss" in m else 0
        if it <= 3 or it % 50 == 0:
            print(f"  it {it}: {time.time()-t_it:.1f}s loss {m['loss']:.4f} "
                  f"(total {time.time()-t0:.0f}s)", flush=True)
        if it % EVAL_EVERY == 0:
            e = tr.evaluate(with_boxes=True, with_ssim=True)
            err_adj, _ = box_pose_errors(tr, true_b2w)
            n = int(tr.state.field.num_active())
            trend.append((it, e["psnr"], e["ssim"], n, err_adj))
            print(f"iter {it}: psnr {e['psnr']:.2f} ssim {e['ssim']:.3f} "
                  f"n={n} box-err {err_adj:.3f} ({time.time()-t0:.0f}s)",
                  flush=True)

    wall = time.time() - t0
    lines = [
        "# QUALITY_FULL_r03 — full-model training quality evidence",
        "",
        "Config-5 shape on the independent ray-traced street oracle",
        "(`vegs_tpu/utils/synthetic.py` — the GT renderer shares no code with",
        "the Gaussian rasterizer): normal-prior covariance init +",
        "normal-guidance loss + ONE dynamic box crossing the street (per-frame",
        f"SE(3) annotations corrupted with {BOX_NOISE_T} m translation noise;",
        "the learned per-frame BoxDeltas must recover the true pose) + VGG",
        "perceptual loss + tiny-model SD guidance window",
        f"[{GUIDE_FROM}, {GUIDE_TO}]. {H}x{W}, {N_CAMS} cameras, reference",
        f"idx%8 test split, densify window [100, 700] every 100, {ITERS}",
        "iterations. Held-out renders COMPOSITE the box (with learned",
        "deltas) via render_all.",
        "",
        "| iteration | held-out PSNR (dB) | SSIM | active Gaussians |"
        " box-pose err (m) |",
        "|---|---|---|---|---|",
    ]
    for it, p, s, n, be in trend:
        lines.append(f"| {it} | {p:.2f} | {s:.3f} | {n} | {be:.3f} |")
    lines += [
        "",
        f"Raw (uncorrected) annotation translation error: {err_raw:.3f} m —",
        "the box-pose err column shows the learned deltas pulling the pose",
        "back toward the truth.",
        f"Guided iterations executed: {guided} (window"
        f" [{GUIDE_FROM}, {GUIDE_TO}], in-step single-dispatch path).",
        f"Wall-clock: {wall:.0f} s ({BACKEND} backend on"
        f" {jax.devices()[0].platform}).",
        "Reproduce: `python perf/quality_full.py` (TPU) or",
        "`JAX_PLATFORMS=cpu VEGS_QUALITY_BACKEND=dense env -u"
        " PALLAS_AXON_POOL_IPS python perf/quality_full.py` (CPU golden).",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "QUALITY_FULL_r03.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
