"""Offline evaluation over saved renders (reference /root/reference/metrics.py).

Walks {model_path}/test/{method}/renders vs gt, computes SSIM/PSNR (and LPIPS
when VGG+LPIPS weights are available — see vegs_tpu.losses.lpips), writes
results.json and per_view.json in the reference's format (metrics.py:36-93).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from .losses import psnr as psnr_fn, ssim as ssim_fn
from .losses import lpips as lpips_mod


def _read_image(path) -> np.ndarray:
    from PIL import Image

    img = np.asarray(Image.open(path), np.float32) / 255.0
    return img[..., :3].transpose(2, 0, 1)


def evaluate_dirs(renders_dir, gt_dir, use_lpips: bool | None = None) -> dict:
    """Per-view and mean SSIM/PSNR(/LPIPS) for two directories of images."""
    render_files = sorted(os.listdir(renders_dir))
    use_lpips = lpips_mod.lpips_available() if use_lpips is None else use_lpips
    lp_params = lp_lins = None
    if use_lpips:
        lp_params, lp_lins = lpips_mod.load_default()

    per_view = {"SSIM": {}, "PSNR": {}, "LPIPS": {}}
    for fname in render_files:
        r = jnp.asarray(_read_image(Path(renders_dir) / fname))
        g = jnp.asarray(_read_image(Path(gt_dir) / fname))
        per_view["SSIM"][fname] = float(ssim_fn(r, g))
        per_view["PSNR"][fname] = float(psnr_fn(r, g))
        if use_lpips:
            per_view["LPIPS"][fname] = float(
                lpips_mod.lpips(lp_params, lp_lins, r, g))

    means = {
        k: float(np.mean(list(v.values()))) for k, v in per_view.items() if v
    }
    return {"means": means, "per_view": per_view}


def evaluate(model_paths: list[str]) -> dict:
    """Reference-compatible driver: walks {model}/test/{method}/ and writes
    results.json / per_view.json beside them."""
    full_results = {}
    for model_path in model_paths:
        test_dir = Path(model_path) / "test"
        full = {}
        per_view_out = {}
        for method in sorted(os.listdir(test_dir)) if test_dir.exists() else []:
            mdir = test_dir / method
            res = evaluate_dirs(mdir / "renders", mdir / "gt")
            full[method] = res["means"]
            per_view_out[method] = res["per_view"]
        with open(Path(model_path) / "results.json", "w") as f:
            json.dump(full, f, indent=True)
        with open(Path(model_path) / "per_view.json", "w") as f:
            json.dump(per_view_out, f, indent=True)
        full_results[model_path] = full
    return full_results


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--model_paths", "-m", nargs="+", required=True)
    args = ap.parse_args()
    print(json.dumps(evaluate(args.model_paths), indent=2))
