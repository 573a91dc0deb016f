"""Follow-up probe: per-parameter-group gradient norms + image quadrant
stats at 64x128 vs 128x256 (same scene, same init) — localizes the
resolution-dependent training stall seen in r12_quality_debug.

Run (TPU): python perf/r12b_grads.py
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import quality_full as qf
import quality_full_r05 as qf5


def probe(h, w):
    import jax
    import jax.numpy as jnp
    from vegs_tpu.losses import l1_loss, ssim
    from vegs_tpu.render import render

    rng = np.random.default_rng(7)
    info, _, _ = qf.build_scene_info(rng, h=h, w=w, n_cams=17)
    info_s = qf5.strip_boxes(info)
    tr = qf5.build_trainer(info_s, norminit=False, lam_dnormal=0.0,
                           perceptual=False, tag=f"dbg2_{h}")
    cam = tr.scene.getTrainCameras()[0]
    gt = jnp.asarray(cam.original_image)
    field = tr.state.field

    def loss_fn(means, sh_dc, logit_op, log_scales):
        f = field.replace(means=means, sh_dc=sh_dc, opacity_logit=logit_op,
                          log_scales=log_scales)
        out = render(cam.device_params(), f, bg=tr.bg, config=tr.raster_cfg)
        ll1 = l1_loss(out.rgb, gt)
        return 0.8 * ll1 + 0.2 * (1.0 - ssim(out.rgb, gt)), out.rgb

    (loss, rgb), grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3),
                                            has_aux=True)(
        field.means, field.sh_dc, field.opacity_logit, field.log_scales)
    names = ("means", "sh_dc", "logit_op", "log_scales")
    print(f"[{h}x{w}] loss {float(loss):.4f}")
    for nm, g in zip(names, grads):
        g = np.asarray(g)
        print(f"  grad {nm}: rms {np.sqrt((g**2).mean()):.3e} "
              f"max {np.abs(g).max():.3e} nonzero "
              f"{float((np.abs(g) > 0).mean()):.3f}")
    rgb = np.asarray(rgb)
    gtn = np.asarray(gt)
    hh, ww = rgb.shape[1] // 2, rgb.shape[2] // 2
    for qy in (0, 1):
        for qx in (0, 1):
            r = rgb[:, qy * hh:(qy + 1) * hh, qx * ww:(qx + 1) * ww]
            g2 = gtn[:, qy * hh:(qy + 1) * hh, qx * ww:(qx + 1) * ww]
            print(f"  quad({qy},{qx}): render {r.mean():.3f} "
                  f"gt {g2.mean():.3f}")


if __name__ == "__main__":
    probe(64, 128)
    probe(128, 256)
