"""Box-delta POSE RECOVERY evidence (round-3 verdict item 3).

The reference's core dynamic-object claim is that the learned SE(3)+scale
residuals CORRECT noisy box annotations (/root/reference/model/boxmodel.py:30-49,
optimized at train.py:274-278). QUALITY_FULL_r03 could not show it: the
deltas were frozen at identity by the norm-at-zero NaN bug fixed this round
(boxmodel.safe_norm), and at 64x128 the mover subtends few pixels anyway.

This experiment isolates the capability at 128x256 with the verdict's
recipe: >=0.1 m injected translation noise, a lambda_reg sweep, >=1k
iterations, fewer cameras so each per-frame delta gets more optimizer
updates. Success = learned deltas recover >=50% of the injected translation
error on train frames. Writes QUALITY_BOX_r04.md.

Run (TPU): python perf/quality_box.py
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
N_CAMS = 9                 # idx%8 split -> 7 train frames; ITERS/7 delta
#                            updates per frame (vs ITERS/15 at 17 cams)
NOISE_T = 0.125            # injected annotation translation noise (m)
ITERS = int(os.environ.get("VEGS_QB_ITERS", "1200"))
SWEEP = [1e-3, 1e-4]       # boxmodel_lambda_reg (1e-3 = reference default)


def run_one(lambda_reg: float, seed: int = 7):
    import jax

    rng = np.random.default_rng(seed)
    info, true_b2w, noisy_b2w = qf.build_scene_info(
        rng, h=H, w=W, n_cams=N_CAMS, noise_t=NOISE_T)
    tr = qf.build_trainer(info, tmp=f"/tmp/vegs_quality_box_{lambda_reg:g}")
    # recovery-focused: no guidance window, no perceptual term
    tr.sd_guidance = None
    tr.cfg.sd.perceptual_loss = False
    tr._vgg_params = None
    # step fns are built lazily per (slots, caps, ...) key on the first
    # iteration, so setting the reg weight here is enough
    tr.cfg.box.boxmodel_lambda_reg = lambda_reg

    t0 = time.time()
    trend = []
    err_adj0, err_raw = qf.box_pose_errors(tr, true_b2w)
    trend.append((0, err_adj0))
    for it in range(1, ITERS + 1):
        tr.train_iteration(it)
        if it % 100 == 0:
            err_adj, _ = qf.box_pose_errors(tr, true_b2w)
            trend.append((it, err_adj))
            e = tr.evaluate(with_boxes=True)
            print(f"  lam={lambda_reg:g} it {it}: box-err {err_adj:.4f} m "
                  f"(raw {err_raw:.4f}) psnr {e['psnr']:.2f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    final_err = trend[-1][1]
    recovery = 1.0 - final_err / err_raw
    return dict(lambda_reg=lambda_reg, err_raw=err_raw, trend=trend,
                final_err=final_err, recovery=recovery,
                wall=time.time() - t0)


def main():
    import jax

    results = [run_one(lam) for lam in SWEEP]
    lines = [
        "# QUALITY_BOX_r04 — box-delta pose recovery",
        "",
        "Round-3 verdict item 3: do the learned per-frame SE(3)+scale",
        "residuals (reference model/boxmodel.py:30-49) actually RECOVER",
        "corrupted box poses? Setup: ray-traced street oracle, one mover,",
        f"{H}x{W}, {N_CAMS} cameras (idx%8 split), {NOISE_T} m translation",
        f"noise injected into every annotation, {ITERS} iterations,",
        "boxmodel_lr 5e-3 (reference default), no guidance/perceptual (the",
        "photometric + normal losses are the recovery signal). Enabled by",
        "this round's safe_norm fix — with the norm-at-zero NaN the deltas",
        "never left identity (QUALITY_FULL_r03's frozen 0.123 column).",
        "",
        "| lambda_reg | raw err (m) | final err (m) | recovered | wall (s) |",
        "|---|---|---|---|---|",
    ]
    for r in results:
        lines.append(
            f"| {r['lambda_reg']:g} | {r['err_raw']:.4f} | "
            f"{r['final_err']:.4f} | {100*r['recovery']:.0f}% | "
            f"{r['wall']:.0f} |")
    lines += ["", "Per-iteration trend (mean train-frame translation error, m):",
              ""]
    hdr = "| iteration | " + " | ".join(
        f"lam={r['lambda_reg']:g}" for r in results) + " |"
    lines += [hdr, "|" + "---|" * (len(results) + 1)]
    for i in range(len(results[0]["trend"])):
        it = results[0]["trend"][i][0]
        row = " | ".join(f"{r['trend'][i][1]:.4f}" for r in results)
        lines.append(f"| {it} | {row} |")
    ok = max(r["recovery"] for r in results) >= 0.5
    lines += [
        "",
        f"Verdict target (>=50% of injected error recovered): "
        f"{'MET' if ok else 'NOT MET'} "
        f"(best {100*max(r['recovery'] for r in results):.0f}%).",
        f"Backend: {qf.BACKEND} on {jax.devices()[0].platform}.",
        "Reproduce: `python perf/quality_box.py`.",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "QUALITY_BOX_r04.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
