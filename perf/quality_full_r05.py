"""Round-5 full-model quality decomposition + guidance ablation
(round-4 verdict items 3 and 4).

Decomposes the config-5 quality gap component-wise at 128x256 with the
budget the verdict prescribes (reference densify_grad_threshold 0.0002 —
/root/reference/arguments/__init__.py:93 — densify window >= 60% of the
run, capacity free to grow):

  A  static-only            (boxes stripped, plain init, no normal loss)
  B  + normal-prior init    (boxes stripped)
  C  + normal-guidance loss (boxes stripped)
  D  + boxes                (mover scene, both priors)
  E  full config-5          (D + perceptual; guidance trunk-and-branch)

Arms A-C run on the scene WITHOUT the mover (their numbers are comparable
to the static-oracle trajectory of QUALITY_r02); D adds the moving box and
its models (C -> D therefore crosses a scene change — the mover pixels are
unfittable for C-style arms and newly fittable for D).

Arm E doubles as the guidance ablation: trunk to GUIDE_FROM, then two
branches differing ONLY in the guidance term, evaluated on held-out AND
extrapolated (+-18 deg yawed, re-ray-traced GT) views. Unlike round 4 the
tiny VAE is PRETRAINED on scene crops (recon+KL) alongside the UNet —
round 4's neutral result was attributed to the random VAE encoder
(QUALITY_FULL_r04.md).

Writes QUALITY_FULL_r05.md incrementally after each arm.
Run (TPU): python perf/quality_full_r05.py
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
import quality_full_r04 as qf4

H = int(os.environ.get("VEGS_QF5_H", "128"))
W = int(os.environ.get("VEGS_QF5_W", "256"))
N_CAMS = int(os.environ.get("VEGS_QF5_CAMS", "17"))
ITERS = int(os.environ.get("VEGS_QF5_ITERS", "1500"))
EVAL_EVERY = 300
DENSIFY_UNTIL = int(ITERS * 0.6)
GUIDE_FROM = int(ITERS * 0.75)
PRETRAIN_STEPS = int(os.environ.get("VEGS_QF5_PRETRAIN", "1200"))
ARMS = os.environ.get("VEGS_QF5_ARMS", "A,B,C,D,E").split(",")

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "QUALITY_FULL_r05.md")


def strip_boxes(info):
    from vegs_tpu.scene import dataset_readers as dr
    return dr.SceneInfo(
        point_cloud=info.point_cloud, train_cameras=info.train_cameras,
        test_cameras=info.test_cameras,
        nerf_normalization=info.nerf_normalization, ply_path=info.ply_path,
        dyn_point_cloud=None, train_bboxes={}, test_bboxes={},
        instances_info=[])


def build_trainer(info, *, norminit, lam_dnormal, perceptual, seed=3,
                  tag="arm"):
    import jax
    from vegs_tpu.scene import Scene
    from vegs_tpu.train import Trainer
    from vegs_tpu.config import VegsConfig
    from vegs_tpu.ops.rasterize import RasterizeConfig
    from vegs_tpu.priors import initialize_gaussians_with_window_normals

    cfg = VegsConfig()
    cfg.model.model_path = f"/tmp/vegs_qf5_{tag}"
    cfg.opt.densify_from_iter = 100
    cfg.opt.densification_interval = 100
    cfg.opt.densify_until_iter = DENSIFY_UNTIL
    cfg.opt.opacity_reset_interval = 10_000
    cfg.opt.densify_grad_threshold = 0.0002   # the reference's threshold
    cfg.opt.lambda_dnormal = lam_dnormal
    cfg.sd.perceptual_loss = perceptual
    cfg.sd.perceptual_loss_lambda = 0.01
    cfg.sd.sd_image_size = 32
    cfg.sd.start_guiding_from_iter = 10 ** 9   # branches flip this on
    cfg.sd.end_guiding_at_iter = 10 ** 9

    scene = Scene(cfg.model, scene_info=info, shuffle=False)
    raster = RasterizeConfig(backend=qf.BACKEND, k_cap=1 << 17)
    tr = Trainer(cfg, scene, raster_cfg=raster, rng_seed=seed)
    if norminit:
        tr.state = tr.state.replace(
            field=initialize_gaussians_with_window_normals(
                tr.state.field, scene.getTrainCameras()))
    return tr


def pretrain_vae(models, images_chw, steps=PRETRAIN_STEPS, batch=8,
                 crop=32, lr=2e-4, seed=1):
    """Fit the tiny VAE on scene crops (recon MSE + small KL) — the missing
    half of round 4's per-scene prior (its encoder was random, which the
    r04 report names as the reason guidance was neutral)."""
    import jax
    import jax.numpy as jnp
    import optax

    from vegs_tpu.diffusion.lora import random_square_crops

    vae = models.vae
    params = models.vae_params
    tx = optax.adamw(optax.cosine_decay_schedule(lr, steps))
    opt_state = tx.init(params)
    images = jnp.asarray(np.asarray(images_chw).transpose(0, 2, 3, 1))

    @jax.jit
    def step(params, opt_state, key):
        k_crop, k_enc = jax.random.split(key)
        crops = random_square_crops(k_crop, images, crop, batch)
        x = crops * 2.0 - 1.0

        def loss_fn(p):
            mean, logvar = vae.apply(p, x, method=vae.encode_moments)
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                k_enc, mean.shape)
            rec = vae.apply(p, z, method=vae.decode)
            kl = 0.5 * jnp.mean(mean ** 2 + jnp.exp(logvar) - 1.0 - logvar)
            return jnp.mean((rec - x) ** 2) + 1e-4 * kl

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.key(seed)
    first = last = None
    for i in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        if i == 0:
            first = float(loss)
    last = float(loss)
    print(f"  vae pretrain: recon {first:.4f} -> {last:.4f} ({steps} steps)",
          flush=True)
    return models._replace(vae_params=params), (first, last)


def run_arm(label, tr, iters, aug_cams=None, t0=None):
    t0 = t0 or time.time()
    trend = []

    def snap(it):
        e = tr.evaluate(with_boxes=True, with_ssim=True)
        n = int(tr.state.field.num_active())
        row = [it, e["psnr"], e["ssim"], n]
        if aug_cams is not None:
            ea = tr.evaluate(cameras=aug_cams, with_boxes=True,
                             with_ssim=True)
            row += [ea["psnr"]]
        trend.append(row)
        print(f"[{label}] it {it}: test {e['psnr']:.2f}/{e['ssim']:.3f} "
              f"n={n}" + (f" aug {row[4]:.2f}" if aug_cams else "")
              + f" ({time.time()-t0:.0f}s)", flush=True)

    snap(0)
    for it in range(1, iters + 1):
        tr.train_iteration(it)
        if it % EVAL_EVERY == 0 or it == iters:
            snap(it)
    return trend


REPORT_STATE = {"arms": {}, "branch": None, "pre": None}


def write_report():
    lines = [
        "# QUALITY_FULL_r05 — component decomposition + guidance ablation",
        "",
        f"Ray-traced street oracle, {H}x{W}, {N_CAMS} cams (idx%8 split),",
        f"{ITERS} iters, densify [100, {DENSIFY_UNTIL}] every 100 at the",
        "reference grad threshold 0.0002"
        " (/root/reference/arguments/__init__.py:93), capacity free",
        "(k_cap auto-adapts). Arms A-C run WITHOUT the mover (comparable to",
        "QUALITY_r02's static oracle); D-E include the moving box (its",
        "pixels are unfittable for A-C, newly fittable for D).",
        "",
        "| arm | config | final test PSNR (dB) | SSIM | Gaussians |",
        "|---|---|---|---|---|",
    ]
    names = {
        "A": "static-only", "B": "+ normal-prior init",
        "C": "+ normal-guidance loss", "D": "+ boxes (mover scene)",
        "E": "full (D + perceptual; trunk)"}
    for a in "ABCDE":
        if a in REPORT_STATE["arms"]:
            tr_ = REPORT_STATE["arms"][a]
            it, p, s, n = tr_[-1][:4]
            lines.append(f"| {a} | {names[a]} | {p:.2f} | {s:.3f} | {n} |")
    lines += ["", "## Trends", ""]
    for a in "ABCDE":
        if a in REPORT_STATE["arms"]:
            lines.append(f"**{a} ({names[a]})**: " + ", ".join(
                f"it{r[0]}={r[1]:.2f}" for r in REPORT_STATE["arms"][a]))
            lines.append("")
    if REPORT_STATE["pre"]:
        u, v = REPORT_STATE["pre"]
        lines += [f"Tiny-SD per-scene pretraining: UNet eps-MSE "
                  f"{u[0]:.3f} -> {u[-1]:.3f}; VAE recon {v[0]:.4f} -> "
                  f"{v[1]:.4f}.", ""]
    if REPORT_STATE["branch"]:
        b = REPORT_STATE["branch"]
        lines += [
            "## Guidance trunk-and-branch (arm E, branches differ ONLY in "
            "the guidance term; tiny UNet AND VAE pretrained on the scene)",
            "",
            "| branch | test PSNR | aug (extrapolated) PSNR |",
            "|---|---|---|",
            f"| guided | {b['g_test']:.2f} | {b['g_aug']:.2f} |",
            f"| unguided | {b['u_test']:.2f} | {b['u_aug']:.2f} |",
            "",
            f"Guidance effect on extrapolated views: "
            f"**{b['g_aug'] - b['u_aug']:+.2f} dB** "
            f"(held-out: {b['g_test'] - b['u_test']:+.2f} dB); "
            f"guided iterations: {b['guided_iters']}.",
            "",
        ]
    lines += ["", f"Wall-clock so far: {REPORT_STATE.get('wall', 0):.0f} s "
              f"({qf.BACKEND} backend).",
              "Reproduce: `python perf/quality_full_r05.py`"]
    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {OUT}", flush=True)


def main():
    import jax
    from vegs_tpu.diffusion.pipeline import DiffusionModels
    from vegs_tpu.losses.sd_guidance import SDGuidance

    t_all = time.time()
    rng = np.random.default_rng(7)
    info, true_b2w, noisy_b2w = qf.build_scene_info(rng, h=H, w=W,
                                                    n_cams=N_CAMS)
    info_static = strip_boxes(info)

    arm_specs = {
        "A": (info_static, dict(norminit=False, lam_dnormal=0.0,
                                perceptual=False)),
        "B": (info_static, dict(norminit=True, lam_dnormal=0.0,
                                perceptual=False)),
        "C": (info_static, dict(norminit=True, lam_dnormal=1e-3,
                                perceptual=False)),
        "D": (info, dict(norminit=True, lam_dnormal=1e-3, perceptual=False)),
        "E": (info, dict(norminit=True, lam_dnormal=1e-3, perceptual=True)),
    }

    for a in ARMS:
        inf, kw = arm_specs[a]
        tr = build_trainer(inf, tag=a, **kw)
        if a != "E":
            REPORT_STATE["arms"][a] = run_arm(a, tr, ITERS)
            REPORT_STATE["wall"] = time.time() - t_all
            write_report()
            continue

        # ---- arm E: trunk to GUIDE_FROM, then guided/unguided branches ---
        train_imgs = np.stack(
            [np.asarray(c.image) for c in inf.train_cameras])
        models = DiffusionModels.tiny(jax.random.key(0), image_size=32)
        models, unet_losses = qf4.pretrain_unet(
            models, train_imgs, steps=PRETRAIN_STEPS)
        models, vae_losses = pretrain_vae(models, train_imgs)
        REPORT_STATE["pre"] = (unet_losses, vae_losses)

        aug_cams = qf4.make_aug_cameras(
            [c for c in tr.scene.getTestCameras()])
        trend = run_arm("E-trunk", tr, GUIDE_FROM, aug_cams=aug_cams,
                        t0=t_all)
        snap = qf4.snapshot_trainer(tr)

        # guided branch
        tr.sd_guidance = SDGuidance(models, guidance_mode="score-matching",
                                    start_iter=GUIDE_FROM, max_iters=ITERS,
                                    max_step=50)
        tr.cfg.sd.start_guiding_from_iter = GUIDE_FROM
        tr.cfg.sd.end_guiding_at_iter = ITERS
        guided_iters = 0
        for it in range(GUIDE_FROM + 1, ITERS + 1):
            m = tr.train_iteration(it)
            guided_iters += 1 if "guidance_loss" in m else 0
        eg = tr.evaluate(with_boxes=True, with_ssim=True)
        ega = tr.evaluate(cameras=aug_cams, with_boxes=True, with_ssim=True)
        print(f"[E-guided] test {eg['psnr']:.2f} aug {ega['psnr']:.2f} "
              f"({guided_iters} guided iters)", flush=True)

        # unguided branch from the same snapshot
        qf4.restore_trainer(tr, snap)
        tr.sd_guidance = None
        tr.cfg.sd.start_guiding_from_iter = 10 ** 9
        tr.cfg.sd.end_guiding_at_iter = 10 ** 9
        for it in range(GUIDE_FROM + 1, ITERS + 1):
            tr.train_iteration(it)
        eu = tr.evaluate(with_boxes=True, with_ssim=True)
        eua = tr.evaluate(cameras=aug_cams, with_boxes=True, with_ssim=True)
        print(f"[E-unguided] test {eu['psnr']:.2f} aug {eua['psnr']:.2f}",
              flush=True)

        trend.append([ITERS, eu["psnr"], eu["ssim"],
                      int(tr.state.field.num_active()), eua["psnr"]])
        REPORT_STATE["arms"]["E"] = trend
        REPORT_STATE["branch"] = dict(
            g_test=eg["psnr"], g_aug=ega["psnr"],
            u_test=eu["psnr"], u_aug=eua["psnr"], guided_iters=guided_iters)
        REPORT_STATE["wall"] = time.time() - t_all
        write_report()

    REPORT_STATE["wall"] = time.time() - t_all
    write_report()


if __name__ == "__main__":
    main()
