"""Debug probe: why does static training at 128x256 plateau at ~6.5 dB
(flat from init) while 64x128 reached 21.3 dB in round 2?

Runs the arm-A (static, plain init) configuration at BOTH resolutions for
a few hundred iterations, printing the TRAINING loss, eval PSNR, and
render statistics (alpha coverage, rgb mean/max vs gt) every 50 iters.
Separates "training broken" (loss stuck) from "eval broken" (loss falls,
renders empty at eval).

Run (TPU): python perf/r12_quality_debug.py
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
import quality_full_r05 as qf5


def probe(h, w, iters=300):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    info, _, _ = qf.build_scene_info(rng, h=h, w=w, n_cams=17)
    info_s = qf5.strip_boxes(info)
    tr = qf5.build_trainer(info_s, norminit=False, lam_dnormal=0.0,
                           perceptual=False, tag=f"dbg{h}")
    gt0 = np.asarray(info_s.test_cameras[0].image)
    print(f"[{h}x{w}] gt stats: mean {gt0.mean():.3f} max {gt0.max():.3f}",
          flush=True)

    def render_stats(label):
        cam = tr.scene.getTestCameras()[0]
        from vegs_tpu.render import render

        out = render(cam.device_params(), tr.state.field,
                     bg=tr.bg, config=tr.raster_cfg)
        rgb = np.asarray(out.rgb)
        alpha = np.asarray(out.alpha)
        gt = np.asarray(cam.original_image)
        mse = float(((rgb - gt) ** 2).mean())
        print(f"  [{label}] render mean {rgb.mean():.3f} max {rgb.max():.3f}"
              f" alpha-cov {float((alpha > 0.5).mean()):.3f}"
              f" dropped {int(out.num_dropped)}"
              f" needed {int(out.num_needed)}/{tr.raster_cfg.k_pad or tr.raster_cfg.k_cap}"
              f" raw {int(out.num_needed_raw)}/{tr.raster_cfg.k_cap}"
              f" psnr1 {-10 * np.log10(mse + 1e-12):.2f}", flush=True)

    render_stats("init")
    t0 = time.time()
    for it in range(1, iters + 1):
        m = tr.train_iteration(it)
        if it <= 3 or it % 50 == 0:
            e = tr.evaluate(with_boxes=True, with_ssim=True)
            print(f"[{h}x{w}] it {it}: loss {float(m['loss']):.4f} "
                  f"l1 {float(m['l1']):.4f} "
                  f"ndrop {int(m.get('num_dropped', 0))} "
                  f"psnr {e['psnr']:.2f} ssim {e['ssim']:.3f} "
                  f"n={int(tr.state.field.num_active())} "
                  f"k_cap={tr.raster_cfg.k_cap} k_pad={tr.raster_cfg.k_pad} "
                  f"({time.time()-t0:.0f}s)", flush=True)
            if it % 100 == 0:
                render_stats(f"it{it}")


if __name__ == "__main__":
    probe(64, 128, iters=200)
    probe(128, 256, iters=300)
