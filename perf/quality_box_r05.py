"""Box-delta pose recovery with STEREO supervision (round-4 verdict item 5).

Round 4 reached 30% recovery of injected box-pose noise with MONOCULAR
frames and diagnosed the plateau as single-view depth ambiguity — while the
reference's canonical KITTI-360 data is stereo
(/root/reference/scene/dataset_readers.py:218-300, image_00/image_01). This
experiment renders the oracle rig as stereo pairs (0.54 m baseline, the
KITTI rig's) so every per-frame delta is constrained by two viewpoints, and
budgets >= 350 optimizer updates per frame-delta (6 frames x 2 eyes, 2
test cameras, 1800 iterations -> each frame's delta trains from ~2/10 of
iterations ~= 360 updates).

Success = learned deltas recover >= 50% of the 0.125 m injected translation
error (reference boxmodel: /root/reference/model/boxmodel.py:30-49).
Writes QUALITY_BOX_r05.md.

Run (TPU): python perf/quality_box_r05.py
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

H, W = 128, 256
N_FRAMES = int(os.environ.get("VEGS_QB5_FRAMES", "6"))
BASELINE = 0.54            # KITTI stereo baseline (m)
NOISE_T = 0.125
ITERS = int(os.environ.get("VEGS_QB5_ITERS", "1500"))
SWEEP = [1e-3]             # reference boxmodel_lambda_reg default
BOX_LR = float(os.environ.get("VEGS_QB5_LR", "0"))  # 0 = config default
MONO_CONTROL = os.environ.get("VEGS_QB5_MONO", "1") != "0"


def run_one(lambda_reg: float, stereo: float, label: str, seed: int = 7):
    rng = np.random.default_rng(seed)
    info, true_b2w, noisy_b2w = qf.build_scene_info(
        rng, h=H, w=W, n_cams=N_FRAMES, noise_t=NOISE_T,
        stereo_baseline=stereo)
    tr = qf.build_trainer(info, tmp=f"/tmp/vegs_qbox5_{label}")
    tr.sd_guidance = None
    tr.cfg.sd.perceptual_loss = False
    tr._vgg_params = None
    tr.cfg.box.boxmodel_lambda_reg = lambda_reg
    if BOX_LR > 0:
        tr.cfg.box.boxmodel_lr = BOX_LR
        label = f"{label}_lr{BOX_LR:g}"

    t0 = time.time()
    trend = []
    err_adj0, err_raw = qf.box_pose_errors(tr, true_b2w)
    trend.append((0, err_adj0))
    for it in range(1, ITERS + 1):
        tr.train_iteration(it)
        if it % 200 == 0:
            err_adj, _ = qf.box_pose_errors(tr, true_b2w)
            trend.append((it, err_adj))
            e = tr.evaluate(with_boxes=True)
            print(f"  [{label}] it {it}: box-err {err_adj:.4f} m "
                  f"(raw {err_raw:.4f}) psnr {e['psnr']:.2f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    final_err = trend[-1][1]
    recovery = 1.0 - final_err / err_raw
    return dict(label=label, lambda_reg=lambda_reg, stereo=stereo,
                err_raw=err_raw, trend=trend, final_err=final_err,
                recovery=recovery, wall=time.time() - t0)


def main():
    runs = []
    for lam in SWEEP:
        runs.append(run_one(lam, BASELINE, f"stereo_lam{lam:g}"))
        if MONO_CONTROL:
            runs.append(run_one(lam, 0.0, f"mono_lam{lam:g}"))

    lines = [
        "# QUALITY_BOX_r05 — box-delta pose recovery with stereo",
        "",
        "Round-4 reached 30% recovery with monocular frames; the diagnosed",
        "plateau was single-view depth ambiguity, and the reference's",
        "canonical KITTI-360 data is STEREO",
        "(/root/reference/scene/dataset_readers.py:218-300). Setup:",
        f"ray-traced street oracle, one mover, {H}x{W}, {N_FRAMES} frames"
        f" x 2 eyes ({BASELINE} m baseline), {NOISE_T} m injected",
        f"translation noise, {ITERS} iterations (~{2 * ITERS // 8} updates per",
        "frame-delta), boxmodel_lr 5e-3, no guidance/perceptual. A",
        "monocular control arm isolates the stereo effect.",
        "",
        "| arm | lambda_reg | raw err (m) | final err (m) | recovered |"
        " wall (s) |",
        "|---|---|---|---|---|---|",
    ]
    for r in runs:
        lines.append(
            f"| {r['label']} | {r['lambda_reg']:g} | {r['err_raw']:.4f} | "
            f"{r['final_err']:.4f} | {100*r['recovery']:.0f}% | "
            f"{r['wall']:.0f} |")
    lines += ["", "Trend (mean train-frame translation error, m):", ""]
    for r in runs:
        lines.append(f"**{r['label']}**: " + ", ".join(
            f"it{it}={e:.4f}" for it, e in r["trend"]))
        lines.append("")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))),
        os.environ.get("VEGS_QB5_OUT", "QUALITY_BOX_r05.md"))
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
