"""Scene layer: PLY I/O, COLMAP parsers, KITTI-360 parsers, cameras, Scene."""

import io
import os

import numpy as np
import pytest

from vegs_tpu import gaussians
from vegs_tpu.scene import (Scene, dataset_readers, kitti360_loader,
                            load_gaussian_ply, ply_io, save_gaussian_ply)
from vegs_tpu.scene.cameras import (Camera, augment_camera,
                                    make_camera_like_input_camera)
from vegs_tpu.config import ModelParams, SDRegularizationParams


def test_ply_roundtrip(tmp_path, rng):
    n = 100
    vertex = ply_io.make_vertex_array({
        "x": rng.normal(size=n).astype(np.float32),
        "y": rng.normal(size=n).astype(np.float32),
        "z": rng.normal(size=n).astype(np.float32),
        "red": rng.integers(0, 255, n).astype(np.uint8),
        "instance": rng.integers(0, 99, n).astype(np.int32),
    })
    p = tmp_path / "test.ply"
    ply_io.write_ply(p, vertex)
    back = ply_io.read_ply(p)["vertex"]
    for name in vertex.dtype.names:
        np.testing.assert_array_equal(back[name], vertex[name])


def test_ply_ascii_read(tmp_path):
    text = (
        "ply\nformat ascii 1.0\nelement vertex 2\n"
        "property float x\nproperty float y\nproperty float z\n"
        "end_header\n1 2 3\n4 5 6\n"
    )
    data = ply_io.read_ply(io.BytesIO(text.encode()))
    v = data["vertex"]
    np.testing.assert_allclose([v["x"][1], v["z"][0]], [4.0, 3.0])


def test_gaussian_ply_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (50, 3)).astype(np.float32)
    f = gaussians.create_from_points(pts, cols, capacity=64)
    p = tmp_path / "gauss.ply"
    save_gaussian_ply(p, f)
    f2 = load_gaussian_ply(p)
    assert int(f2.num_active()) == 50
    np.testing.assert_allclose(np.asarray(f2.means)[:50], pts, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(f2.sh_dc)[:50], np.asarray(f.sh_dc)[:50], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(f2.log_scales)[:50], np.asarray(f.log_scales)[:50], atol=1e-6)


def test_colmap_text_roundtrip(tmp_path):
    from vegs_tpu.scene import colmap_loader as cl

    cams = {1: cl.ColmapCamera(1, "PINHOLE", 640, 480,
                               np.array([500.0, 500.0, 320.0, 240.0]))}
    imgs = {
        1: cl.ColmapImage(1, np.array([1.0, 0, 0, 0]), np.array([0.0, 0, 1]),
                          1, "img1.png", np.zeros((0, 2)), np.zeros(0, np.int64)),
    }
    cl.write_cameras_text(cams, tmp_path / "cameras.txt")
    cl.write_images_text(imgs, tmp_path / "images.txt")
    cams2 = cl.read_cameras_text(tmp_path / "cameras.txt")
    imgs2 = cl.read_images_text(tmp_path / "images.txt")
    assert cams2[1].model == "PINHOLE" and cams2[1].width == 640
    np.testing.assert_allclose(cams2[1].params, cams[1].params)
    np.testing.assert_allclose(imgs2[1].qvec, [1, 0, 0, 0])
    assert imgs2[1].name == "img1.png"
    R = cl.qvec2rotmat(np.array([1.0, 0, 0, 0]))
    np.testing.assert_allclose(R, np.eye(3))
    q = cl.rotmat2qvec(np.eye(3))
    np.testing.assert_allclose(q, [1, 0, 0, 0], atol=1e-6)


@pytest.fixture
def kitti360_root(tmp_path):
    """Synthetic KITTI-360 directory with calibration, poses, and bboxes."""
    root = tmp_path / "kitti360"
    calib = root / "calibration"
    calib.mkdir(parents=True)
    fx, fy, cx, cy = 552.55, 552.55, 682.05, 238.77
    (calib / "perspective.txt").write_text(
        f"P_rect_00: {fx} 0 {cx} 0 0 {fy} {cy} 0 0 0 1 0\n"
        "R_rect_00: 1 0 0 0 1 0 0 0 1\n"
        "S_rect_00: 1408 376\n"
        f"P_rect_01: {fx} 0 {cx} 0 0 {fy} {cy} 0 0 0 1 0\n"
        "R_rect_01: 1 0 0 0 1 0 0 0 1\n"
        "S_rect_01: 1408 376\n"
    )
    (calib / "calib_cam_to_pose.txt").write_text(
        "image_00: 1 0 0 0.5 0 1 0 0 0 0 1 0\n"
        "image_01: 1 0 0 -0.5 0 1 0 0 0 0 1 0\n"
    )
    seq = "2013_05_28_drive_0000_sync"
    poses_dir = root / "data_poses" / seq
    poses_dir.mkdir(parents=True)
    lines = []
    for f in range(10, 14):
        t = f * 1.0
        lines.append(f"{f} 1 0 0 {t} 0 1 0 0 0 0 1 0")
    (poses_dir / "poses.txt").write_text("\n".join(lines) + "\n")

    bbox_dir = root / "data_3d_bboxes" / "train"
    bbox_dir.mkdir(parents=True)
    # one car (semantic 26) at timestamp 11, one static (timestamp -1)
    def obj_xml(name, sem, inst, ts, tx):
        return f"""
  <{name}>
    <semanticId>{sem}</semanticId>
    <instanceId>{inst}</instanceId>
    <timestamp>{ts}</timestamp>
    <label>car</label>
    <transform type_id="opencv-matrix">
      <rows>4</rows><cols>4</cols><dt>f</dt>
      <data>2. 0 0 {tx}  0 1. 0 0  0 0 1.5 0  0 0 0 1</data>
    </transform>
  </{name}>"""
    xml = ("<?xml version=\"1.0\"?>\n<opencv_storage>"
           + obj_xml("object_0", 26, 1, 11, 5.0)
           + obj_xml("object_1", 26, 1, 12, 6.0)
           + obj_xml("object_2", 26, 2, -1, 0.0)
           + obj_xml("object_3", 41, 3, 11, 0.0)  # non-vehicle
           + "\n</opencv_storage>")
    (bbox_dir / f"{seq}.xml").write_text(xml)
    return root, seq


def test_kitti360_camera_perspective(kitti360_root):
    root, seq = kitti360_root
    cam = kitti360_loader.CameraPerspective(str(root), seq, cam_id=0)
    assert cam.width == 1408 and cam.height == 376
    assert cam.K[0, 0] == pytest.approx(552.55)
    assert list(cam.frames) == [10, 11, 12, 13]
    c2w = cam.cam2world[12]
    # pose translation x=12 plus cam offset 0.5
    np.testing.assert_allclose(c2w[:3, 3], [12.5, 0, 0], atol=1e-8)


def test_kitti360_annotations(kitti360_root):
    root, seq = kitti360_root
    bboxes, insts = kitti360_loader.read_kitti360_3d_annotations(
        str(root), seq, start_frame=10, end_frame=14)
    # semantic 41 excluded; static ts=-1 pruned by frame range
    assert insts == [kitti360_loader.local2global(26, 1)]
    assert sorted(bboxes.keys()) == [11, 12]
    box = bboxes[11][26001]
    np.testing.assert_allclose(box.T, [5.0, 0, 0])
    np.testing.assert_allclose(np.diag(box.R), [2.0, 1.0, 1.5])


def test_kitti360_cameras_reader(kitti360_root):
    root, seq = kitti360_root
    infos = dataset_readers.readKITTI360Cameras(str(root), seq,
                                                start_frame=11, end_frame=13)
    assert len(infos) == 4  # 2 frames x stereo
    assert infos[0].frame == 11 and infos[0].cam_idx == 0
    assert infos[1].cam_idx == 1
    assert infos[0].width == 1408


def test_camera_augmentation(rng):
    cam = Camera(
        colmap_id=0, R=np.eye(3), T=np.zeros(3), FoVx=1.0, FoVy=0.5,
        K=np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]]),
        image_width=640, image_height=480,
        image=np.zeros((3, 480, 640), np.float32),
    )
    cfg = SDRegularizationParams()
    aug, yaw, pitch, tz, ydir = augment_camera(cam, cfg, rng)
    assert cfg.yaw_start <= abs(yaw) <= cfg.yaw_end
    assert aug.image_height == cfg.sd_image_size
    assert 0 <= tz <= cfg.trans_z_range
    # camera rose along world z
    c_orig = cam.camera_center
    c_aug = aug.camera_center
    assert c_aug[2] == pytest.approx(c_orig[2] + tz, abs=1e-5)

    det = make_camera_like_input_camera(cam, add_zrot_val=30.0, add_tz=0.3)
    assert det.camera_center[2] == pytest.approx(cam.camera_center[2] + 0.3, abs=1e-5)
    # rotation preserved orthonormality
    np.testing.assert_allclose(det.R @ det.R.T, np.eye(3), atol=1e-8)


def test_scene_from_synthetic_info(tmp_path, rng):
    # Build a SceneInfo in memory: points + 3 cameras + 1 dynamic instance.
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (200, 3)).astype(np.float32)
    pcd = dataset_readers.BasicPointCloud(pts, cols)
    cams = dataset_readers.generateRandomCameras(3, camera_distance=5.0)
    box2world = np.eye(4)
    box2world[0, 0] = 2.0

    class Box:
        def __init__(self, m):
            self.box2world = m

    dyn_pts = rng.uniform(-0.4, 0.4, (64, 3)).astype(np.float32)
    dyn_world = dyn_pts * np.array([2.0, 1, 1])
    dyn = dataset_readers.DynamicPointCloud(
        points=dyn_world, colors=np.full((64, 3), 0.5, np.float32),
        instances=np.full(64, 26001), timestamps=np.full(64, 7),
    )
    info = dataset_readers.SceneInfo(
        point_cloud=pcd, train_cameras=cams[:2], test_cameras=cams[2:],
        nerf_normalization=dataset_readers.getNerfppNorm(cams, pcd),
        ply_path="", dyn_point_cloud=dyn,
        train_bboxes={7: {26001: Box(box2world)}},
        instances_info=[26001],
    )
    cfg_model = ModelParams(model_path=str(tmp_path / "model"))
    scene = Scene(cfg_model, scene_info=info, shuffle=False)
    assert int(scene.gaussians.num_active()) == 200
    assert 26001 in scene.box_gaussians
    bg = scene.box_gaussians[26001]
    assert int(bg.num_active()) == 64
    # canonical points are inside the unit box
    m = np.asarray(bg.means)[np.asarray(bg.valid)]
    assert np.abs(m).max() <= 0.5 + 1e-4

    scene.save(10)
    f2 = load_gaussian_ply(
        tmp_path / "model" / "point_cloud" / "iteration_10" / "point_cloud.ply")
    assert int(f2.num_active()) == 200

    scene2 = Scene(cfg_model, scene_info=info, shuffle=False, load_iteration=-1)
    assert scene2.loaded_iter == 10
    assert int(scene2.gaussians.num_active()) == 200


def test_resolution_policy(rng):
    """Reference loadCam policy (utils/camera_utils.py:20-42): >1600 px
    images auto-downscale at resolution=-1; divisors scale directly;
    intrinsics follow."""
    from vegs_tpu.scene.cameras import resolve_resolution
    from vegs_tpu.scene import dataset_readers as dr

    assert resolve_resolution(2000, 1000, -1) == (1600, 800)
    assert resolve_resolution(1408, 376, -1) == (1408, 376)
    assert resolve_resolution(1408, 376, 2) == (704, 188)
    assert resolve_resolution(2000, 1000, 1000) == (1000, 500)
    assert resolve_resolution(1408, 376, 1, resolution_scale=2.0) == (704, 188)

    img = rng.uniform(0, 1, (3, 1000, 2000)).astype(np.float32)
    info = dr.CameraInfo(
        uid=0, R=np.eye(3), T=np.zeros(3), FovX=1.2, FovY=0.7, K=None,
        image=img, image_path="", image_name="x", normal=None,
        normal_path="", width=2000, height=1000, frame=0)
    cam = dr.camera_from_info(info, resolution=-1)
    assert (cam.image_width, cam.image_height) == (1600, 800)
    assert cam.image.shape == (3, 800, 1600)
    # fx scaled by 1600/2000
    fx_orig = dr.fov2focal(1.2, 2000)
    np.testing.assert_allclose(cam.K[0, 0], fx_orig * 0.8, rtol=1e-6)

    cam1 = dr.camera_from_info(info, resolution=1)
    assert (cam1.image_width, cam1.image_height) == (2000, 1000)


def test_synthetic_moving_box_and_normals():
    """Dynamic-object oracle extensions (vegs_tpu/utils/synthetic.py): the
    mover changes the GT across frames, normal maps are camera-space unit
    vectors, and Camera.world_normal recovers the world ground normal."""
    from vegs_tpu.utils import synthetic as syn

    n = 5
    infos = syn.street_camera_infos(n, 32, 64, moving_box=True,
                                    render_normal=True)
    static = syn.street_camera_infos(n, 32, 64, moving_box=False)
    # the mover shows up (frame 2 looks straight down the street)
    assert np.abs(infos[2].image - static[2].image).max() > 0.05
    # ... at a DIFFERENT set of pixels per frame (it moves)
    d1 = np.abs(infos[1].image - static[1].image).sum(0) > 0.05
    d3 = np.abs(infos[3].image - static[3].image).sum(0) > 0.05
    assert (d1 != d3).any() and d1.any() and d3.any()

    nrm = infos[2].normal
    assert nrm.shape == (3, 32, 64)
    np.testing.assert_allclose(
        np.linalg.norm(nrm, axis=0), 1.0, atol=1e-5)
    cam = dataset_readers.camera_from_info(infos[2], preload=True)
    wn = cam.world_normal()
    # bottom rows look at the ground: world normal ~ [0, -1, 0] (y is down)
    ground = wn[:, -4:, :].reshape(3, -1).mean(axis=1)
    np.testing.assert_allclose(ground, [0.0, -1.0, 0.0], atol=0.05)

    # box2world maps the canonical cube onto the mover's world AABB
    m = syn.mover_box2world(2, n)
    corners = np.array([[x, y, z] for x in (-0.5, 0.5)
                        for y in (-0.5, 0.5) for z in (-0.5, 0.5)])
    w = (np.concatenate([corners, np.ones((8, 1))], 1) @ m.T)[:, :3]
    (cx, _, cz) = syn.mover_center(2, n)
    sx, sy, sz = syn.MOVER_SIZE
    np.testing.assert_allclose(w[:, 0].max() - w[:, 0].min(), sx, atol=1e-5)
    np.testing.assert_allclose(w[:, 1].max(), 1.5, atol=1e-5)  # on the ground
    np.testing.assert_allclose(w[:, 0].mean(), cx, atol=1e-5)
    np.testing.assert_allclose(w[:, 2].mean(), cz, atol=1e-5)
