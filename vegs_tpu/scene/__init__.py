"""Scene orchestration: dataset -> cameras + Gaussian fields (+ box models).

Capability parity with /root/reference/scene/__init__.py:27-168: loader
dispatch by data type, camera list construction, nerf++ extent, static field
init from the fused point cloud, one canonical-space Gaussian field per
dynamic instance (GaussianBoxModel.initialize, gaussian_model.py:462-530),
and weights-only PLY snapshots (save, scene/__init__.py:151-157).
"""

from __future__ import annotations

import os
import random
from pathlib import Path
from typing import Optional

import numpy as np

from .. import gaussians
from ..gaussians import GaussianField
from . import dataset_readers, ply_io
from .cameras import Camera
from .dataset_readers import SceneInfo, camera_from_info, sceneLoadTypeCallbacks

GAUSSIAN_PLY_COMMENT = "vegs_tpu gaussian field"


def save_gaussian_ply(path, field: GaussianField) -> None:
    """Write the reference's Gaussian PLY attribute layout
    (gaussian_model.py:196-213) for interop with 3DGS viewers."""
    arrs = gaussians.to_ply_arrays(field)
    cols = {}
    xyz = arrs["xyz"]
    for i, name in enumerate("xyz"):
        cols[name] = xyz[:, i]
    for i, name in enumerate(["nx", "ny", "nz"]):
        cols[name] = arrs["normals"][:, i]
    for i in range(arrs["f_dc"].shape[1]):
        cols[f"f_dc_{i}"] = arrs["f_dc"][:, i]
    for i in range(arrs["f_rest"].shape[1]):
        cols[f"f_rest_{i}"] = arrs["f_rest"][:, i]
    cols["opacity"] = arrs["opacities"][:, 0]
    for i in range(3):
        cols[f"scale_{i}"] = arrs["scale"][:, i]
    for i in range(4):
        cols[f"rot_{i}"] = arrs["rotation"][:, i]
    os.makedirs(os.path.dirname(str(path)) or ".", exist_ok=True)
    ply_io.write_ply(path, ply_io.make_vertex_array(cols),
                     comments=(GAUSSIAN_PLY_COMMENT,))


def load_gaussian_ply(path, capacity: Optional[int] = None) -> GaussianField:
    v = ply_io.read_ply(path)["vertex"]
    names = v.dtype.names
    n_rest = len([n for n in names if n.startswith("f_rest_")])
    xyz = np.vstack([v["x"], v["y"], v["z"]]).T
    f_dc = np.vstack([v[f"f_dc_{i}"] for i in range(3)]).T
    f_rest = (
        np.vstack([v[f"f_rest_{i}"] for i in range(n_rest)]).T
        if n_rest else np.zeros((len(xyz), 45), np.float32)
    )
    opac = np.asarray(v["opacity"])
    scale = np.vstack([v[f"scale_{i}"] for i in range(3)]).T
    rot = np.vstack([v[f"rot_{i}"] for i in range(4)]).T
    return gaussians.from_ply_arrays(xyz, f_dc, f_rest, opac, scale, rot,
                                     capacity=capacity)


def initialize_box_field(
    dyn_pcd,
    instance_id: int,
    bboxes: dict,
    init_opacity: float = 0.1,
    fallback_points: int = 8196,
    rng: Optional[np.random.Generator] = None,
) -> GaussianField:
    """Canonical-space Gaussian field for one dynamic instance.

    Maps each frame's instance points into the canonical box via
    world2box = inv(box2world) (reference gaussian_model.py:485-492); falls
    back to `fallback_points` random points in [-0.5, 0.5]^3 for untracked
    instances (470-472); scale clamp [1e-7, 1e-4] (517)."""
    rng = rng or np.random.default_rng(0)
    pts_all, col_all = [], []
    if dyn_pcd is not None:
        sel = np.asarray(dyn_pcd.instances) == instance_id
        pts = np.asarray(dyn_pcd.points)[sel]
        cols = np.asarray(dyn_pcd.colors)[sel]
        ts = np.asarray(dyn_pcd.timestamps)[sel]
        for frame, inst_boxes in bboxes.items():
            if instance_id not in inst_boxes:
                continue
            frame_sel = ts == frame
            if not frame_sel.any():
                continue
            box2world = np.asarray(inst_boxes[instance_id].box2world
                                   if hasattr(inst_boxes[instance_id], "box2world")
                                   else inst_boxes[instance_id])
            world2box = np.linalg.inv(box2world)
            p = pts[frame_sel]
            canon = (np.concatenate([p, np.ones((len(p), 1))], 1) @ world2box.T)[:, :3]
            inside = np.all(np.abs(canon) <= 0.5 + 1e-3, axis=1)
            pts_all.append(canon[inside])
            col_all.append(cols[frame_sel][inside])
    if pts_all and sum(len(p) for p in pts_all) > 16:
        points = np.concatenate(pts_all, 0)
        colors = np.concatenate(col_all, 0)
    else:
        points = rng.uniform(-0.5, 0.5, (fallback_points, 3)).astype(np.float32)
        colors = np.full((fallback_points, 3), 0.5, np.float32)
    return gaussians.create_from_points(
        points, colors, init_opacity=init_opacity,
        scale_clip=(1e-7, 1e-4),
    )


class Scene:
    """Holds cameras + static field + per-instance box fields."""

    def __init__(
        self,
        cfg_model,
        cfg_data=None,
        cfg_box=None,
        load_iteration: Optional[int] = None,
        shuffle: bool = True,
        scene_info: Optional[SceneInfo] = None,
        preload_image: Optional[bool] = None,
    ):
        self.model_path = cfg_model.model_path
        self.loaded_iter = None
        preload = cfg_model.preload_image if preload_image is None else preload_image

        if scene_info is None:
            dt = cfg_model.data_type
            if dt == "kitti360":
                scene_info = sceneLoadTypeCallbacks["KITTI360"](
                    cfg_model.source_path, eval=cfg_model.eval,
                    seq=cfg_data.seq, start_frame=cfg_data.start_frame,
                    end_frame=cfg_data.end_frame,
                    preload_image=preload,
                    exclude_lidar=cfg_data.exclude_lidar,
                    exclude_colmap=cfg_data.exclude_colmap,
                    colmap_data_type=cfg_data.colmap_data_type,
                    cache_dir=cfg_model.cache_dir,
                )
            elif dt == "colmap":
                scene_info = sceneLoadTypeCallbacks["Colmap"](
                    cfg_model.source_path, cfg_model.images, cfg_model.eval)
            elif dt == "blender":
                scene_info = sceneLoadTypeCallbacks["Blender"](
                    cfg_model.source_path, cfg_model.white_background,
                    cfg_model.eval)
            else:
                raise ValueError(f"unknown data_type {dt}")
        self.scene_info = scene_info

        if shuffle:
            random.shuffle(scene_info.train_cameras)

        self.cameras_extent = scene_info.nerf_normalization["radius"]
        res = getattr(cfg_model, "resolution", -1)
        self.train_cameras = [
            camera_from_info(c, preload=preload, resolution=res)
            for c in scene_info.train_cameras
        ]
        self.test_cameras = [
            camera_from_info(c, preload=preload, resolution=res)
            for c in scene_info.test_cameras
        ]
        self.train_bboxes = scene_info.train_bboxes
        self.test_bboxes = scene_info.test_bboxes
        self.instances_info = list(scene_info.instances_info)

        # -- Gaussian fields ----------------------------------------------
        if load_iteration is not None:
            self.loaded_iter = self._resolve_iteration(load_iteration)
            self.gaussians = load_gaussian_ply(
                Path(self.model_path) / "point_cloud"
                / f"iteration_{self.loaded_iter}" / "point_cloud.ply")
            self.box_gaussians = {}
            for inst in self.instances_info:
                p = (Path(self.model_path) / f"instance_{inst}" / "point_cloud"
                     / f"iteration_{self.loaded_iter}" / "point_cloud.ply")
                if p.exists():
                    self.box_gaussians[inst] = load_gaussian_ply(p)
        else:
            pcd = scene_info.point_cloud
            self.gaussians = gaussians.create_from_points(
                pcd.points, pcd.colors)
            init_op = cfg_box.gaussian_box_model_init_opacity if cfg_box else 0.1
            all_bboxes = dict(self.train_bboxes)
            for f, d in self.test_bboxes.items():
                all_bboxes.setdefault(f, {}).update(d)
            self.box_gaussians = {
                inst: initialize_box_field(
                    scene_info.dyn_point_cloud, inst, all_bboxes,
                    init_opacity=init_op,
                )
                for inst in self.instances_info
            }

    def _resolve_iteration(self, load_iteration: int) -> int:
        if load_iteration != -1:
            return load_iteration
        pc_dir = Path(self.model_path) / "point_cloud"
        iters = [
            int(p.name.split("_")[-1]) for p in pc_dir.glob("iteration_*")
        ]
        return max(iters)

    def save(self, iteration: int) -> None:
        base = Path(self.model_path)
        save_gaussian_ply(
            base / "point_cloud" / f"iteration_{iteration}" / "point_cloud.ply",
            self.gaussians,
        )
        for inst, field in self.box_gaussians.items():
            save_gaussian_ply(
                base / f"instance_{inst}" / "point_cloud"
                / f"iteration_{iteration}" / "point_cloud.ply",
                field,
            )

    def getTrainCameras(self) -> list[Camera]:
        return self.train_cameras

    def getTestCameras(self) -> list[Camera]:
        return self.test_cameras
