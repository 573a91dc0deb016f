"""KITTI tracking loader with synthetic fixtures."""

import numpy as np
import pytest

from vegs_tpu.scene import kitti_loader as kl


@pytest.fixture
def tracking_root(tmp_path):
    seq = "0001"
    basedir = tmp_path / "training"
    (basedir / "calib").mkdir(parents=True)
    (basedir / "oxts").mkdir()
    (basedir / "label_02").mkdir()

    P = "7.2e+02 0 6.0e+02 0 0 7.2e+02 1.8e+02 0 0 0 1.0e+00 0"
    (basedir / "calib" / f"{seq}.txt").write_text(
        f"P0: {P}\nP1: {P}\nP2: {P}\nP3: {P}\n"
        "R_rect: 1 0 0 0 1 0 0 0 1\n"
        "Tr_velo_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0\n"
        "Tr_imu_velo: 1 0 0 0 0 1 0 0 0 0 1 0\n"
    )
    # 4 oxts frames moving east; fields: lat lon alt roll pitch yaw ...
    lines = []
    for i in range(4):
        lines.append(f"49.0 {8.0 + i * 1e-5} 110.0 0 0 0 " + "0 " * 24)
    (basedir / "oxts" / f"{seq}.txt").write_text("\n".join(lines) + "\n")

    # tracklets: frame track_id type trunc occ alpha bbox(4) h w l x y z rot_y
    rows = []
    for f in range(4):
        rows.append(
            f"{f} 1 Car 0 0 0 0 0 50 50 1.5 1.7 4.0 {1.0 + f * 2.0} 1.0 8.0 0.1")
    rows.append("0 2 Car 0 0 0 0 0 50 50 1.5 1.7 4.0 2.0 1.0 6.0 0.0")
    rows.append("3 2 Car 0 0 0 0 0 50 50 1.5 1.7 4.0 2.1 1.0 6.0 0.0")
    rows.append("1 -1 DontCare 0 0 0 0 0 1 1 0 0 0 0 0 0 0")
    (basedir / "label_02" / f"{seq}.txt").write_text("\n".join(rows) + "\n")
    return tmp_path, seq


def test_calib_and_poses(tracking_root):
    root, seq = tracking_root
    calib = kl.tracking_calib_from_txt(root / "training" / "calib" / f"{seq}.txt")
    assert calib["P2"].shape == (3, 4)
    assert calib["P2"][0, 0] == pytest.approx(720.0)
    poses, _, _ = kl.get_poses_calibration(
        str(root / "training"), str(root / "training" / "oxts" / f"{seq}.txt"))
    assert poses.shape == (4, 4, 4)
    np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-9)
    # motion is monotonic in x (mercator east)
    assert np.all(np.diff(poses[:, 0, 3]) > 0)


def test_obj_pose_tracking_static_removal(tracking_root):
    root, seq = tracking_root
    calib = kl.tracking_calib_from_txt(root / "training" / "calib" / f"{seq}.txt")
    # stationary ego so "static in camera frame" == "static in world"
    (root / "training" / "oxts" / f"{seq}.txt").write_text(
        ("49.0 8.0 110.0 0 0 0 " + "0 " * 24 + "\n") * 4)
    poses, _, _ = kl.get_poses_calibration(
        str(root / "training"), str(root / "training" / "oxts" / f"{seq}.txt"))
    vis, meta, b2w = kl.get_obj_pose_tracking(
        str(root / "training" / "label_02" / f"{seq}.txt"), poses, calib)
    # moving car kept, static car (0.1 m) removed, DontCare ignored
    assert 1 in meta and 2 not in meta
    assert b2w.shape[0] == 4
    # box2world differs across frames for the mover
    m0 = b2w[0, 0]
    m3 = b2w[3, 0]
    assert not np.allclose(m0, m3)


def test_box_geometry_helpers(rng):
    boxes = np.array([[0.0, 0, 0, 2, 4, 1.5, 0.3]])
    corners = kl.boxes_to_corners_3d(boxes)
    assert corners.shape == (1, 8, 3)
    # centroid at box center
    np.testing.assert_allclose(corners.mean(axis=1)[0], [0, 0, 0], atol=1e-6)
    inside = kl.is_within_3d_box(np.array([[0.0, 0, 0], [10.0, 0, 0]]), corners)
    assert inside[0].tolist() == [True, False]
    pts = rng.uniform(-0.5, 0.5, (32, 3)) * np.array([2, 4, 1.5])
    canon, box_c = kl.points_to_canonical(pts, boxes[0])
    assert np.abs(canon).max() <= 0.51
    np.testing.assert_allclose(box_c[:3], 0)
