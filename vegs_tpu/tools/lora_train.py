"""Per-segment LoRA fine-tuning driver.

Parity with the reference's segment loop
(/root/reference/lora/scripts/train_text_to_image_lora_kitti360.py:846-864 +
bash_scripts/lora_train_kitti360.sh): walk every (seq, start, end) segment —
from a metadata txt in the reference's format or explicit flags — fine-tune
one LoRA on that segment's preprocessed crops (300 steps, bs 1 x grad-accum
4, lr 1e-4 cosine), and save `lora_weights.pkl` into
`{out_dir}/{seq}/{start}_{end}/`, the layout `train.main` resolves for the
guidance window (vegs_tpu/train.py lora_model_dir lookup).

TPU-first: the SD base weights load once; each segment restarts from fresh
LoRA leaves (the reference retrains from scratch per segment too).
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path

import numpy as np


def parse_segments_file(path: str) -> list[tuple[str, str, str]]:
    """Parse the reference's `*_num_vehicles.txt` line format
    `.../{seq}/{start}_{end}.{ext}` into (seq, start10, end10) tuples
    (reference train_text_to_image_lora_kitti360.py:847-856; the reference
    indexes seq at [-3], implying an extra trailing path component in its
    unshipped data file — here seq is the directory holding the frames
    token, which covers both layouts)."""
    segments = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            parts = line.split(".")[0].split("/")
            frames = parts[-1]
            start, end = frames.split("_")
            segments.append((parts[-2], str(int(start)).zfill(10),
                             str(int(end)).zfill(10)))
    return segments


def load_segment_images(data_dir: str, size: int = 512) -> np.ndarray:
    """Load the preprocessed square crops of one segment (the output of
    tools/lora_preprocess.preprocess_segment) as [B, 3, H, W] in [0, 1]."""
    from PIL import Image

    d = Path(data_dir)
    metas = d / "metadata.jsonl"
    files: list[Path]
    if metas.exists():
        with open(metas) as f:
            files = [d / json.loads(line)["file_name"] for line in f]
    else:
        files = sorted(d.glob("*.png")) + sorted(d.glob("*.jpg"))
    if not files:
        raise FileNotFoundError(f"no training crops in {data_dir}")
    imgs = []
    for p in files:
        img = Image.open(p).convert("RGB")
        if img.size != (size, size):
            img = img.resize((size, size))
        imgs.append(np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0)
    return np.stack(imgs)


def train_segment(models, images, out_dir: str, *, steps: int, seed: int,
                  batch_size: int = 1, grad_accum: int = 4,
                  lr: float = 1e-4) -> list[float]:
    from ..diffusion.lora import save_lora_weights, train_lora

    params, losses = train_lora(
        models, images, steps=steps, batch_size=batch_size,
        grad_accum=grad_accum, lr=lr, seed=seed)
    save_lora_weights(params, os.path.join(out_dir, "lora_weights.pkl"))
    return losses


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Train one LoRA per KITTI-360 segment")
    ap.add_argument("--checkpoint_dir", required=True,
                    help="local SD-2.1 diffusers checkpoint tree")
    ap.add_argument("--data_root", required=True,
                    help="preprocessed crops root: {data_root}/{seq}/{start}_{end}/")
    ap.add_argument("--out_dir", default="lora/models/kitti360")
    ap.add_argument("--segments_file", default=None,
                    help="reference-format segment list (*_num_vehicles.txt)")
    ap.add_argument("--seq", default=None)
    ap.add_argument("--start_frame", type=int, default=None)
    ap.add_argument("--end_frame", type=int, default=None)
    ap.add_argument("--prompt", default="a photography of a suburban street")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--grad_accum", type=int, default=4)
    ap.add_argument("--learning_rate", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=1337)
    args = ap.parse_args(argv)

    if args.segments_file:
        segments = parse_segments_file(args.segments_file)
    else:
        assert args.seq and args.start_frame is not None, (
            "need --segments_file or --seq/--start_frame/--end_frame")
        segments = [(args.seq, str(args.start_frame).zfill(10),
                     str(args.end_frame).zfill(10))]

    from ..diffusion import weights
    import jax

    # Base weights load once; fresh LoRA leaves per segment ("init").
    models = weights.load_sd_checkpoint(
        args.checkpoint_dir, prompt=args.prompt, lora_dir="init")
    base_params = models.unet_params

    for seq, start, end in segments:
        seg = f"{start}_{end}"
        data_dir = os.path.join(args.data_root, seq, seg)
        out_dir = os.path.join(args.out_dir, seq, seg)
        # train.main resolves f"{start_frame}_{end_frame}" with plain ints;
        # write that alias too so both layouts resolve.
        alias = os.path.join(args.out_dir, seq,
                             f"{int(start)}_{int(end)}")
        print(f"[lora] segment {seq}/{seg} <- {data_dir}")
        images = load_segment_images(data_dir)
        models = models.replace(unet_params=base_params) if hasattr(
            models, "replace") else models._replace(unet_params=base_params)
        losses = train_segment(
            models, images, out_dir, steps=args.steps, seed=args.seed,
            batch_size=args.batch_size, grad_accum=args.grad_accum,
            lr=args.learning_rate)
        if os.path.abspath(alias) != os.path.abspath(out_dir):
            os.makedirs(alias, exist_ok=True)
            import shutil

            shutil.copyfile(os.path.join(out_dir, "lora_weights.pkl"),
                            os.path.join(alias, "lora_weights.pkl"))
        print(f"[lora] {seq}/{seg}: loss {losses[0]:.4f} -> {losses[-1]:.4f} "
              f"saved to {out_dir}")
        del images
        jax.clear_caches()


if __name__ == "__main__":
    main()
