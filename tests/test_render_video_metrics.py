"""Video rendering interpolation + offline metrics driver."""

import numpy as np
import jax.numpy as jnp

from vegs_tpu import geometry
from vegs_tpu.render_video import (interpolate_bboxes, interpolate_box2world,
                                   interpolate_cameras, render_set)
from vegs_tpu.scene import Scene, dataset_readers
from vegs_tpu.config import ModelParams
from vegs_tpu.ops.rasterize import RasterizeConfig
from vegs_tpu.metrics import evaluate_dirs


def _toy_scene(tmp_path, rng, n=80):
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    pcd = dataset_readers.BasicPointCloud(pts, cols)
    cams = dataset_readers.generateRandomCameras(3, camera_distance=4.0,
                                                 width=64, height=48)
    info = dataset_readers.SceneInfo(
        point_cloud=pcd, train_cameras=cams, test_cameras=[],
        nerf_normalization=dataset_readers.getNerfppNorm(cams, pcd),
        ply_path="")
    return Scene(ModelParams(model_path=str(tmp_path / "m")),
                 scene_info=info, shuffle=False)


def test_interpolate_cameras(tmp_path, rng):
    scene = _toy_scene(tmp_path, rng)
    cams = scene.getTrainCameras()
    interp = interpolate_cameras(cams, n_interp=4)
    assert len(interp) == (len(cams) - 1) * 4 + 1
    # endpoints match
    np.testing.assert_allclose(interp[0].camera_center,
                               cams[0].camera_center, atol=1e-5)
    # rotations stay orthonormal
    for c in interp[:5]:
        np.testing.assert_allclose(c.R @ c.R.T, np.eye(3), atol=1e-5)


def test_interpolate_box2world():
    a = np.eye(4); a[:3, 3] = [0, 0, 0]
    b = np.eye(4); b[:3, 3] = [2, 0, 0]
    b[:3, :3] = np.asarray(geometry.quat_to_rotmat(
        jnp.asarray([np.cos(0.5), 0, 0, np.sin(0.5)]))) * 2.0  # rot*scale
    m = interpolate_box2world(a, b, 0.5)
    np.testing.assert_allclose(m[:3, 3], [1, 0, 0], atol=1e-6)
    _, S, _ = geometry.decompose_T_to_RS(jnp.asarray(m))
    np.testing.assert_allclose(np.asarray(S), 1.5, atol=1e-5)
    # t=0 / t=1 endpoints
    np.testing.assert_allclose(interpolate_box2world(a, b, 0.0), a, atol=1e-6)
    np.testing.assert_allclose(interpolate_box2world(a, b, 1.0), b, atol=1e-5)


def test_interpolate_bboxes_timeline():
    class Box:
        def __init__(self, m):
            self.box2world = m

    m0 = np.eye(4)
    m1 = np.eye(4); m1[:3, 3] = [4, 0, 0]
    bboxes = {0: {7: Box(m0)}, 1: {7: Box(m1)}}
    tl = interpolate_bboxes(bboxes, [0, 1], n_interp=4)
    assert len(tl) == 5
    np.testing.assert_allclose(tl[2][7][:3, 3], [2, 0, 0], atol=1e-6)


def test_render_set_writes_videos(tmp_path, rng):
    scene = _toy_scene(tmp_path, rng)
    out = render_set(scene, tmp_path / "videos", n_interp=2, fps=2,
                     raster_cfg=RasterizeConfig(backend="dense", k_cap=1 << 12),
                     aug_params=({"add_zrot_val": 0.0, "add_xrot_val": 0.0,
                                  "add_tz": 0.0},),
                     max_frames=3)
    assert len(out) == 1
    import os
    for p in out.values():
        assert os.path.exists(p) and os.path.getsize(p) > 0


def test_rotaxis_render(tmp_path, rng):
    """Covariance-axis visualization (reference train.py:355-411): flattened
    Gaussians with identity rotation -> the min-scale axis is world x; the
    rendered pseudo-normal at a well-covered pixel equals (1 - R_w2c @ x)/2."""
    from vegs_tpu.render import render
    from vegs_tpu.render_video import render_novelview_rotaxis

    scene = _toy_scene(tmp_path, rng)
    f = scene.gaussians
    # identity rotations, flatten along x, opaque
    quats = np.zeros((f.capacity, 4), np.float32); quats[:, 0] = 1.0
    log_scales = np.tile(np.log([1e-4, 0.15, 0.15]).astype(np.float32),
                         (f.capacity, 1))
    f = f.replace(quats=jnp.asarray(quats),
                  log_scales=jnp.asarray(log_scales),
                  opacity_logit=jnp.full((f.capacity, 1), 8.0))
    scene.gaussians = f
    cfg = RasterizeConfig(backend="dense", k_cap=1 << 12)
    aug = {"add_zrot_val": 0.0, "add_xrot_val": 0.0, "add_tz": 0.0}
    cam = scene.getTrainCameras()[0]
    img = render_novelview_rotaxis(scene, cam, {}, cfg, jnp.zeros(3), aug)
    assert img.shape == (cam.image_height, cam.image_width, 3)
    assert img.dtype == np.uint8
    out = render(cam, f, bg=jnp.zeros(3), config=cfg)
    alpha = np.asarray(out.alpha[0])
    yy, xx = np.unravel_index(np.argmax(alpha), alpha.shape)
    expected = (1.0 - cam.R.T @ np.array([1.0, 0, 0])) / 2 * 255
    np.testing.assert_allclose(img[yy, xx].astype(float), expected, atol=40)
    # gt_like mode runs and returns the same shape
    ngt = np.zeros((3, cam.image_height, cam.image_width), np.float32)
    ngt[0] = 1.0
    img2 = render_novelview_rotaxis(scene, cam, {}, cfg, jnp.zeros(3), aug,
                                    idx_best="gt_like", normal_gt=ngt)
    assert img2.shape == img.shape


def test_evaluate_dirs(tmp_path, rng):
    from PIL import Image

    rdir = tmp_path / "renders"; gdir = tmp_path / "gt"
    rdir.mkdir(); gdir.mkdir()
    for i in range(2):
        img = (rng.uniform(0, 1, (32, 32, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(rdir / f"{i}.png")
        Image.fromarray(img).save(gdir / f"{i}.png")
    res = evaluate_dirs(rdir, gdir, use_lpips=False)
    assert res["means"]["PSNR"] > 40
    assert res["means"]["SSIM"] > 0.99
    assert len(res["per_view"]["PSNR"]) == 2
