"""Monocular surface-normal estimation over KITTI-360 sequences.

Capability parity with /root/reference/omnidata/estimate_normal.py:121-183:
per image, square-crop sliding-window inference (or one full-resize pass)
through the DPT normal model, renormalize and flip x/y into the repo's
convention (x-left, y-up, z-backward; reference lines 153-160), save
`{frame}_norm.npy` plus a visualization PNG under
`data_2d_normal_omnidata_{mode}/`, walking all requested sequences.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from ..priors.dpt import DPTConfig, DPTNormal, init_dpt


class NormalEstimator:
    def __init__(self, cfg: DPTConfig = DPTConfig(), params=None,
                 checkpoint: str | None = None):
        import jax

        self.cfg = cfg
        self.model = DPTNormal(cfg)
        if params is not None:
            self.params = params
        elif checkpoint:
            from ..priors.dpt import load_omnidata_checkpoint

            self.params, unmapped = load_omnidata_checkpoint(checkpoint, cfg)
            if unmapped:
                print(f"[estimate_normal] {len(unmapped)} unmapped checkpoint"
                      " tensors (random init retained for those leaves)")
        else:
            self.params = init_dpt(jax.random.key(0), cfg)
        import jax.numpy as jnp

        self._apply = jax.jit(
            lambda p, x: self.model.apply(p, x))

    def infer_square(self, img_rgb01: np.ndarray) -> np.ndarray:
        """[H, W, 3] -> [H, W, 3] normals for one square crop (resized
        through the model's native resolution)."""
        import jax.numpy as jnp
        import cv2

        h, w, _ = img_rgb01.shape
        s = self.cfg.image_size
        x = cv2.resize(img_rgb01, (s, s), interpolation=cv2.INTER_AREA)
        x = (x - 0.5) / 0.5
        n = np.asarray(self._apply(self.params, jnp.asarray(x[None])))[0]
        return cv2.resize(n, (w, h), interpolation=cv2.INTER_LINEAR)

    def infer_sliding(self, img_rgb01: np.ndarray, overlap: float = 0.5
                      ) -> np.ndarray:
        """Wide image -> sliding square crops blended by Hann weights
        (reference's square-crop sliding mode, lines 127-148)."""
        h, w, _ = img_rgb01.shape
        side = h
        step = max(int(side * (1 - overlap)), 1)
        acc = np.zeros((h, w, 3), np.float64)
        wsum = np.zeros((h, w, 1), np.float64)
        win = np.hanning(side)[None, :, None] + 1e-3
        xs = list(range(0, max(w - side, 0) + 1, step))
        if xs and xs[-1] != w - side:
            xs.append(w - side)
        for x0 in xs or [0]:
            crop = img_rgb01[:, x0:x0 + side]
            n = self.infer_square(crop)
            acc[:, x0:x0 + side] += n * win[:, :n.shape[1]]
            wsum[:, x0:x0 + side] += win[:, :n.shape[1]]
        n = acc / np.maximum(wsum, 1e-8)
        norm = np.linalg.norm(n, axis=-1, keepdims=True)
        return (n / np.maximum(norm, 1e-8)).astype(np.float32)

    def to_repo_convention(self, n: np.ndarray) -> np.ndarray:
        """Flip x/y into 'x-left, y-up, z-backward' (reference lines 153-160)."""
        out = n.copy()
        out[..., 0] *= -1
        out[..., 1] *= -1
        return out


def estimate_sequence(kitti_root, seq, estimator: NormalEstimator,
                      cam_ids=(0, 1), mode: str = "all",
                      sliding: bool = True, limit: int | None = None) -> int:
    """Walk a sequence writing `{frame}_norm.npy` + viz PNGs; returns count."""
    from PIL import Image

    count = 0
    for cam_id in cam_ids:
        img_dir = (Path(kitti_root) / "data_2d_raw" / seq /
                   f"image_{cam_id:02d}" / "data_rect")
        out_dir = (Path(kitti_root) / f"data_2d_normal_omnidata_{mode}" / seq /
                   f"image_{cam_id:02d}")
        os.makedirs(out_dir, exist_ok=True)
        files = sorted(img_dir.glob("*.png"))
        if limit:
            files = files[:limit]
        for f in files:
            img = np.asarray(Image.open(f), np.float32) / 255.0
            n = (estimator.infer_sliding(img) if sliding
                 else estimator.infer_square(img))
            n = estimator.to_repo_convention(n)
            stem = f.stem
            np.save(out_dir / f"{stem}_norm.npy", n.transpose(2, 0, 1))
            viz = ((n * 0.5 + 0.5) * 255).astype(np.uint8)
            Image.fromarray(viz).save(out_dir / f"{stem}_norm_viz.png")
            count += 1
    return count


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser("estimate_normal")
    ap.add_argument("--kitti_root", required=True)
    ap.add_argument("--seqs", nargs="+", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--mode", default="all")
    args = ap.parse_args()
    est = NormalEstimator(checkpoint=args.checkpoint)
    for seq in args.seqs:
        n = estimate_sequence(args.kitti_root, seq, est, mode=args.mode)
        print(f"{seq}: {n} images")
