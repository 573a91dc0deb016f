"""FULL-MODEL quality at scale + GUIDANCE ABLATION (round-3 verdict item 4).

Two identical config-5 training runs on the ray-traced street oracle at
128x256 / 2000 iterations — one with the diffusion-guidance window, one
without — evaluated on BOTH the held-out idx%8 split and on EXTRAPOLATED
views (test cameras yawed +-18 deg, ground truth re-ray-traced at the new
poses). The reference's raison d'etre is that guidance improves
extrapolated views (/root/reference/train.py:171-193,524-530); the ablation
makes that claim measurable here.

Unlike earlier rounds' random-weight tiny SD, the guidance model is
PRETRAINED on the scene itself: the tiny UNet is fit with
epsilon-prediction MSE on random 32x32 crops of the training images (the
structural analog of the reference's per-segment LoRA fine-tune,
bash_scripts/lora_train_kitti360.sh) before the guided run.

Writes QUALITY_FULL_r04.md.  Run (TPU): python perf/quality_full_r04.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import quality_full as qf

H = int(os.environ.get("VEGS_QF4_H", "128"))
W = int(os.environ.get("VEGS_QF4_W", "256"))
N_CAMS = int(os.environ.get("VEGS_QF4_CAMS", "17"))
ITERS = int(os.environ.get("VEGS_QF4_ITERS", "2000"))
EVAL_EVERY = 200
GUIDE_FROM = int(ITERS * 0.6)
DENSIFY_UNTIL = int(ITERS * 0.6)
AUG_YAW_DEG = 18.0
PRETRAIN_STEPS = int(os.environ.get("VEGS_QF4_PRETRAIN", "1500"))


def pretrain_unet(models, images_chw, steps=PRETRAIN_STEPS, batch=8,
                  crop=32, lr=2e-4, seed=0):
    """Fit the ENTIRE tiny UNet with eps-prediction MSE on random crops of
    the scene's training images (per-scene prior, analog of the reference's
    LoRA fine-tune — the tiny model has no pretrained base to adapt, so all
    parameters train)."""
    import jax
    import jax.numpy as jnp
    import optax

    from vegs_tpu.diffusion.lora import random_square_crops

    unet, sched = models.unet, models.schedule
    params = models.unet_params
    tx = optax.adamw(optax.cosine_decay_schedule(lr, steps))
    opt_state = tx.init(params)
    images = jnp.asarray(np.asarray(images_chw).transpose(0, 2, 3, 1))
    ctx = models.text_embeddings[0:1]

    @jax.jit
    def step(params, opt_state, key):
        k_crop, k_t, k_n, k_enc = jax.random.split(key, 4)
        crops = random_square_crops(k_crop, images, crop, batch)
        lat = models.vae.apply(
            models.vae_params, crops * 2.0 - 1.0, k_enc, method="encode")
        t = jax.random.randint(k_t, (batch,), 0, sched.num_train_timesteps)
        noise = jax.random.normal(k_n, lat.shape)
        noisy = sched.add_noise(lat, noise, t)

        def loss_fn(p):
            eps = unet.apply(p, noisy, t, jnp.repeat(ctx, batch, 0))
            return jnp.mean((eps - noise) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.key(seed)
    losses = []
    for i in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        if i % 100 == 0 or i == steps - 1:
            losses.append(float(loss))
    print(f"  unet pretrain: eps-MSE {losses[0]:.4f} -> {losses[-1]:.4f} "
          f"({steps} steps)", flush=True)
    return models._replace(unet_params=params), losses


def make_aug_cameras(test_cams, yaw_deg=AUG_YAW_DEG):
    """Extrapolated eval set: each test camera re-posed with +-yaw about
    its own position, ground truth re-ray-traced at the new pose (the
    oracle renders any pose — the privilege a synthetic scene buys)."""
    from vegs_tpu.scene.cameras import Camera
    from vegs_tpu.scene.dataset_readers import fov2focal
    from vegs_tpu.utils import synthetic as syn

    out = []
    for c in test_cams:
        f = int(c.frame)
        h, w = c.image_height, c.image_width
        for sgn in (-1.0, 1.0):
            a = np.deg2rad(yaw_deg) * sgn
            ca, sa = np.cos(a), np.sin(a)
            Ry = np.array([[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]],
                          np.float32)
            # camera convention: c.R is the transposed w2c rotation
            Rw2c = np.asarray(c.R).T
            C = -Rw2c.T @ np.asarray(c.T)          # camera center
            Rw2c_aug = Ry @ Rw2c
            T_aug = (-Rw2c_aug @ C).astype(np.float32)
            img = syn.raytrace(
                Rw2c_aug.T, T_aug, h, w, c.FoVx, c.FoVy,
                extra_boxes=[syn.mover_box(f, N_CAMS)])
            K = np.array([[fov2focal(c.FoVx, w), 0, w / 2],
                          [0, fov2focal(c.FoVy, h), h / 2],
                          [0, 0, 1.0]], np.float32)
            out.append(Camera(
                colmap_id=1000 + 10 * f + (0 if sgn < 0 else 1),
                R=Rw2c_aug.T.astype(np.float32), T=T_aug,
                FoVx=c.FoVx, FoVy=c.FoVy, K=K, image=img,
                image_name=f"aug_{f}_{sgn:+.0f}", frame=f))
    return out


def snapshot_trainer(tr):
    """Deep-enough snapshot of Trainer mutable state for trunk/branch runs
    (pytrees are immutable — only containers and host RNG need copying)."""
    import copy

    tr._materialize_box_pool()
    return dict(
        state=tr.state,
        box_fields=dict(tr.box_fields), box_opts=dict(tr.box_opts),
        box_stats=dict(tr.box_stats),
        frame_deltas=dict(tr.frame_deltas),
        frame_delta_opts=dict(tr.frame_delta_opts),
        rng=copy.deepcopy(tr.rng), key=tr.key,
        viewpoint_stack=list(tr.viewpoint_stack),
        raster_cfg=tr.raster_cfg,
        kcap_streak=getattr(tr, "_kcap_low_streak", 0))


def restore_trainer(tr, snap):
    tr._box_pool = None
    tr.state = snap["state"]
    tr.box_fields = dict(snap["box_fields"])
    tr.box_opts = dict(snap["box_opts"])
    tr.box_stats = dict(snap["box_stats"])
    tr.frame_deltas = dict(snap["frame_deltas"])
    tr.frame_delta_opts = dict(snap["frame_delta_opts"])
    import copy

    tr.rng = copy.deepcopy(snap["rng"])
    tr.key = snap["key"]
    tr.viewpoint_stack = list(snap["viewpoint_stack"])
    tr.raster_cfg = snap["raster_cfg"]
    tr._kcap_low_streak = snap["kcap_streak"]


def build_trainer(info, seed=3):
    import jax
    from vegs_tpu.scene import Scene
    from vegs_tpu.train import Trainer
    from vegs_tpu.config import VegsConfig
    from vegs_tpu.ops.rasterize import RasterizeConfig
    from vegs_tpu.priors import initialize_gaussians_with_window_normals

    cfg = VegsConfig()
    cfg.model.model_path = "/tmp/vegs_qf4"
    cfg.opt.densify_from_iter = 100
    cfg.opt.densification_interval = 150
    cfg.opt.densify_until_iter = DENSIFY_UNTIL
    cfg.opt.opacity_reset_interval = 10_000
    cfg.opt.densify_grad_threshold = 0.0004
    cfg.sd.perceptual_loss = True
    cfg.sd.perceptual_loss_lambda = 0.01
    cfg.sd.sd_image_size = 32
    cfg.sd.start_guiding_from_iter = 10 ** 9   # trunk runs unguided
    cfg.sd.end_guiding_at_iter = 10 ** 9

    scene = Scene(cfg.model, scene_info=info, shuffle=False)
    raster = RasterizeConfig(backend=qf.BACKEND, k_cap=1 << 15)
    tr = Trainer(cfg, scene, raster_cfg=raster, rng_seed=seed)
    tr.state = tr.state.replace(
        field=initialize_gaussians_with_window_normals(
            tr.state.field, scene.getTrainCameras()))
    return tr


def make_snap_fn(tr, aug_cams, label, t0, trend):
    def snap(it):
        e = tr.evaluate(with_boxes=True, with_ssim=True)
        ea = tr.evaluate(cameras=aug_cams, with_boxes=True, with_ssim=True)
        n = int(tr.state.field.num_active())
        trend.append((it, e["psnr"], e["ssim"], ea["psnr"], ea["ssim"], n))
        print(f"[{label}] it {it}: test {e['psnr']:.2f}/{e['ssim']:.3f} "
              f"aug {ea['psnr']:.2f}/{ea['ssim']:.3f} n={n} "
              f"({time.time()-t0:.0f}s)", flush=True)
    return snap


def main():
    import jax
    from vegs_tpu.diffusion.pipeline import DiffusionModels
    from vegs_tpu.losses.sd_guidance import SDGuidance

    rng = np.random.default_rng(7)
    info, true_b2w, noisy_b2w = qf.build_scene_info(rng, h=H, w=W,
                                                    n_cams=N_CAMS)
    train_imgs = np.stack([np.asarray(c.image) for c in info.train_cameras])
    models = DiffusionModels.tiny(jax.random.key(0), image_size=32)
    models, pre_losses = pretrain_unet(models, train_imgs)

    # ---- shared trunk (iterations 1..GUIDE_FROM, unguided) -----------------
    tr = build_trainer(info)
    aug_cams = make_aug_cameras(tr.scene.getTestCameras())
    t0 = time.time()
    trunk_trend = []
    snap = make_snap_fn(tr, aug_cams, "trunk", t0, trunk_trend)
    snap(0)
    for it in range(1, GUIDE_FROM + 1):
        tr.train_iteration(it)
        if it % EVAL_EVERY == 0:
            snap(it)
    if GUIDE_FROM % EVAL_EVERY:
        snap(GUIDE_FROM)
    trunk_snap = snapshot_trainer(tr)
    wall_trunk = time.time() - t0

    # ---- branch A: guided window ------------------------------------------
    tr.sd_guidance = SDGuidance(
        models, guidance_mode="score-matching", start_iter=GUIDE_FROM,
        max_iters=ITERS, max_step=50, sm_lambda=3e-7)
    tr.cfg.sd.start_guiding_from_iter = GUIDE_FROM
    tr.cfg.sd.end_guiding_at_iter = ITERS
    tr.cfg.sd.sm_lambda = 3e-7
    t0 = time.time()
    g_trend = []
    snap = make_snap_fn(tr, aug_cams, "guided", t0, g_trend)
    guided = 0
    for it in range(GUIDE_FROM + 1, ITERS + 1):
        m = tr.train_iteration(it)
        guided += 1 if "guidance_loss" in m else 0
        if it % EVAL_EVERY == 0:
            snap(it)
    if ITERS % EVAL_EVERY:
        snap(ITERS)
    wall_g = time.time() - t0

    # ---- branch B: same iterations, no guidance ---------------------------
    restore_trainer(tr, trunk_snap)
    tr.sd_guidance = None
    tr.cfg.sd.start_guiding_from_iter = 10 ** 9
    tr.cfg.sd.end_guiding_at_iter = 10 ** 9
    t0 = time.time()
    n_trend = []
    snap = make_snap_fn(tr, aug_cams, "no-guid", t0, n_trend)
    for it in range(GUIDE_FROM + 1, ITERS + 1):
        tr.train_iteration(it)
        if it % EVAL_EVERY == 0:
            snap(it)
    if ITERS % EVAL_EVERY:
        snap(ITERS)
    wall_n = time.time() - t0

    lines = [
        "# QUALITY_FULL_r04 — full-model quality at 128x256 + guidance ablation",
        "",
        "Config-5 training on the ray-traced street oracle",
        f"({H}x{W}, {N_CAMS} cameras, idx%8 split, {ITERS} iterations,",
        f"densify [100, {DENSIFY_UNTIL}] every 150, normal-prior init +",
        "normal guidance + dynamic box + VGG perceptual), with a",
        "trunk-and-branch ablation of the diffusion-guidance window",
        f"[{GUIDE_FROM}, {ITERS}]: one shared trunk to {GUIDE_FROM}, then",
        "the SAME state trained on the SAME camera sequence with and",
        "without guidance — the two arms differ ONLY in the guidance term.",
        "The guidance model is the tiny UNet PRETRAINED on crops of this",
        f"scene's training images (eps-MSE {pre_losses[0]:.3f} ->",
        f"{pre_losses[-1]:.3f} over {PRETRAIN_STEPS} steps — the analog of",
        "the reference's per-segment LoRA). 'aug' columns evaluate",
        f"EXTRAPOLATED views: test cameras yawed +-{AUG_YAW_DEG:.0f} deg,",
        "GT re-ray-traced at the new poses (reference train.py:524-530's",
        "extrapolation sweeps, but with true GT to score against).",
        "",
        "Trunk (shared prefix):",
        "",
        "| iter | test PSNR/SSIM | aug PSNR/SSIM | active |",
        "|---|---|---|---|",
    ]
    for it, p, sm, pa, sa, n in trunk_trend:
        lines.append(f"| {it} | {p:.2f}/{sm:.3f} | {pa:.2f}/{sa:.3f} | {n} |")
    lines += [
        "",
        "Branches (identical state + camera sequence at the fork):",
        "",
        "| iter | guided test | guided AUG | no-guid test | no-guid AUG |",
        "|---|---|---|---|---|",
    ]
    for (it, p, sm, pa, sa, n), (_, p2, s2, pa2, sa2, _) in zip(
            g_trend, n_trend):
        lines.append(
            f"| {it} | {p:.2f}/{sm:.3f} | {pa:.2f}/{sa:.3f} "
            f"| {p2:.2f}/{s2:.3f} | {pa2:.2f}/{sa2:.3f} |")
    gl, nl = g_trend[-1], n_trend[-1]
    lines += [
        "",
        f"Final extrapolated-view delta (guided - unguided): "
        f"PSNR {gl[3]-nl[3]:+.2f} dB, SSIM {gl[4]-nl[4]:+.3f}.",
        f"Final test-view delta: PSNR {gl[1]-nl[1]:+.2f} dB.",
        f"Guided iterations executed: {guided}.",
        f"Wall-clock: trunk {wall_trunk:.0f} s + guided {wall_g:.0f} s + "
        f"unguided {wall_n:.0f} s ({qf.BACKEND} backend).",
        "Reproduce: `python perf/quality_full_r04.py`.",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "QUALITY_FULL_r04.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
