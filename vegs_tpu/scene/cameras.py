"""Host-side camera objects + view augmentation.

Capability parity with /root/reference/scene/cameras.py: `Camera` (lazy image/
normal loading, principal-point projection from K, transposed matrix storage),
`MiniCam`, `augment_camera` (random yaw/pitch/z-translation used for diffusion
guidance, cameras.py:126-176) and `make_camera_like_input_camera`
(deterministic eval/video augmentation, cameras.py:178-227).

TPU-first split: all pose math lives here in NumPy on host; `device_params()`
produces the static-shape CameraParams tuple the jitted render consumes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from .. import geometry
from ..ops.projection import CameraParams

ZFAR = 100.0
ZNEAR = 0.01


def _load_image(path: str, size_wh=None) -> np.ndarray:
    from PIL import Image

    img = Image.open(path)
    if size_wh is not None and img.size != tuple(size_wh):
        img = img.resize(tuple(size_wh), Image.LANCZOS)
    img = np.asarray(img, dtype=np.float32) / 255.0
    if img.ndim == 2:
        img = img[..., None].repeat(3, -1)
    return np.clip(img[..., :3].transpose(2, 0, 1), 0.0, 1.0)  # [3, H, W]


_RESOLUTION_WARNED = False


def resolve_resolution(orig_w: int, orig_h: int, resolution: int = -1,
                       resolution_scale: float = 1.0) -> tuple[int, int]:
    """The reference's loadCam resolution policy
    (/root/reference/utils/camera_utils.py:20-42): divisors 1/2/4/8 scale
    directly; -1 auto-downscales >1600 px-wide images to 1600 (warning
    once); any other positive value is a target width."""
    global _RESOLUTION_WARNED
    if resolution in (1, 2, 4, 8):
        return (round(orig_w / (resolution_scale * resolution)),
                round(orig_h / (resolution_scale * resolution)))
    if resolution == -1:
        if orig_w > 1600:
            if not _RESOLUTION_WARNED:
                print("[ INFO ] Encountered quite large input images "
                      "(>1.6K pixels width), rescaling to 1.6K. "
                      "If this is not desired, specify --resolution as 1")
                _RESOLUTION_WARNED = True
            global_down = orig_w / 1600
        else:
            global_down = 1.0
    else:
        global_down = orig_w / resolution
    scale = float(global_down) * float(resolution_scale)
    return int(orig_w / scale), int(orig_h / scale)


def _load_normal(path: str, size_wh) -> np.ndarray:
    """Load a *_norm.npy omnidata normal map, resized to (W, H); channels
    stay in the repo's world convention after the estimator's flip."""
    import cv2

    n = np.load(path).astype(np.float32)  # [3, h, w] or [h, w, 3]
    if n.shape[0] == 3:
        n = n.transpose(1, 2, 0)
    w, h = size_wh
    if (n.shape[1], n.shape[0]) != (w, h):
        n = cv2.resize(n, (w, h), interpolation=cv2.INTER_LINEAR)
    return n.transpose(2, 0, 1)


@dataclasses.dataclass
class Camera:
    """One training/eval view. `R` is the transposed world-to-camera rotation
    (3DGS convention); `T` the w2c translation."""

    colmap_id: int
    R: np.ndarray            # [3, 3]
    T: np.ndarray            # [3]
    FoVx: float
    FoVy: float
    K: np.ndarray            # [3, 3] intrinsics (pixels)
    image_name: str = ""
    image_path: str = ""
    normal_path: str = ""
    uid: int = 0
    frame: int = 0
    image_width: int = 0
    image_height: int = 0
    image: Optional[np.ndarray] = None    # [3, H, W] in [0,1], preloaded
    normal: Optional[np.ndarray] = None   # [3, H, W]
    trans: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float32))
    scale: float = 1.0
    znear: float = ZNEAR
    zfar: float = ZFAR

    def __post_init__(self):
        if self.image is not None:
            self.image = np.clip(self.image, 0.0, 1.0)
            self.image_height, self.image_width = self.image.shape[-2:]
        assert self.image_width and self.image_height, "need image dims"
        self._recompute()

    def _recompute(self):
        self.world_view_transform = geometry.world_to_view(
            self.R, self.T, self.trans, self.scale
        ).T  # stored transposed, reference cameras.py:76
        self.projection_matrix = geometry.projection_matrix_from_K(
            self.znear, self.zfar, self.FoVx, self.FoVy,
            self.K[0, 0], self.K[1, 1], self.K[0, 2], self.K[1, 2],
            self.image_width, self.image_height,
        ).T
        self.full_proj_transform = self.world_view_transform @ self.projection_matrix
        self.camera_center = np.linalg.inv(self.world_view_transform)[3, :3]

    # -- lazy pixel data ---------------------------------------------------
    @property
    def original_image(self) -> np.ndarray:
        if self.image is not None:
            return self.image
        # Lazy load honors the camera's (possibly policy-downscaled) dims.
        return _load_image(self.image_path,
                           (self.image_width, self.image_height))

    @property
    def original_normal(self) -> Optional[np.ndarray]:
        if self.normal is not None:
            return self.normal
        if not self.normal_path:
            return None
        return _load_normal(self.normal_path, (self.image_width, self.image_height))

    def world_normal(self) -> Optional[np.ndarray]:
        """Camera-space prior normals rotated to world (graphics_utils.py:362)."""
        n = self.original_normal
        if n is None:
            return None
        flat = n.reshape(3, -1).T @ self.R.T
        return flat.T.reshape(n.shape)

    # -- device interface --------------------------------------------------
    def device_params(self) -> CameraParams:
        import jax.numpy as jnp

        return CameraParams(
            viewmatrix=jnp.asarray(self.world_view_transform, jnp.float32),
            projmatrix=jnp.asarray(self.full_proj_transform, jnp.float32),
            campos=jnp.asarray(self.camera_center, jnp.float32),
            tan_fovx=jnp.float32(np.tan(self.FoVx * 0.5)),
            tan_fovy=jnp.float32(np.tan(self.FoVy * 0.5)),
            height=int(self.image_height),
            width=int(self.image_width),
        )

    def resized(self, image_size: int) -> "Camera":
        """Scale so height == image_size (the aug_image_size path,
        reference cameras.py:63-67)."""
        r = image_size / self.image_height
        return dataclasses.replace(
            self,
            K=self.K * r,
            image=None,
            normal=None,
            image_height=int(image_size),
            image_width=int(r * self.image_width),
        )


@dataclasses.dataclass
class MiniCam:
    """Viewer camera (reference cameras.py:111-122)."""

    image_width: int
    image_height: int
    FoVy: float
    FoVx: float
    znear: float
    zfar: float
    world_view_transform: np.ndarray
    full_proj_transform: np.ndarray

    def __post_init__(self):
        self.camera_center = np.linalg.inv(self.world_view_transform)[3, :3]


def _c2w(cam: Camera) -> np.ndarray:
    w2c = np.eye(4)
    w2c[:3, :3] = cam.R.T
    w2c[:3, 3] = np.ravel(cam.T)
    return np.linalg.inv(w2c)


def _rebuild(cam: Camera, c2w: np.ndarray, **overrides) -> Camera:
    w2c = np.linalg.inv(c2w)
    return dataclasses.replace(
        cam, R=w2c[:3, :3].T.copy(), T=w2c[:3, 3].copy(), **overrides
    )


def _rot_x(deg: float) -> np.ndarray:
    p = np.deg2rad(deg)
    return np.array([[1, 0, 0],
                     [0, np.cos(p), -np.sin(p)],
                     [0, np.sin(p), np.cos(p)]])


def _rot_z(deg: float) -> np.ndarray:
    p = np.deg2rad(deg)
    return np.array([[np.cos(p), -np.sin(p), 0],
                     [np.sin(p), np.cos(p), 0],
                     [0, 0, 1]])


def augment_camera(cam: Camera, cfg_sd, rng: np.random.Generator,
                   eval: bool = False):
    """Random extrapolated view for diffusion guidance: yaw about the world
    z-axis (left/right), downward pitch in camera frame, upward world-z
    translation; resized to cfg_sd.sd_image_size
    (reference cameras.py:126-176). Returns (camera, yaw_deg, pitch_deg, t_z,
    yaw_dir)."""
    c2w = _c2w(cam)
    if eval:
        yaw_deg = cfg_sd.yaw_eval
        pitch_deg = cfg_sd.pitch_eval
        t_z = cfg_sd.trans_z_eval
        yaw_dir = None
    else:
        yaw_dir = int(rng.choice([1, -1]))
        yaw_deg = yaw_dir * rng.uniform(cfg_sd.yaw_start, cfg_sd.yaw_end)
        pitch_deg = -1 * rng.uniform(cfg_sd.pitch_start, cfg_sd.pitch_end)
        t_z = rng.uniform(0, cfg_sd.trans_z_range)

    c2w = c2w.copy()
    c2w[:3, :3] = c2w[:3, :3] @ _rot_x(pitch_deg)   # pitch in camera frame
    c2w[:3, :3] = _rot_z(yaw_deg) @ c2w[:3, :3]     # yaw in world frame
    c2w[2, 3] += t_z                                # rise along world z

    aug = _rebuild(cam, c2w)
    aug = aug.resized(cfg_sd.sd_image_size)
    return aug, yaw_deg, pitch_deg, t_z, yaw_dir


def make_camera_like_input_camera(cam: Camera, add_xrot_val: float = 0,
                                  add_zrot_val: float = 0,
                                  add_tz: float = 0) -> Camera:
    """Deterministic augmentation for eval/video (reference cameras.py:178-227)."""
    c2w = _c2w(cam).copy()
    c2w[:3, :3] = c2w[:3, :3] @ _rot_x(add_xrot_val)
    c2w[:3, :3] = _rot_z(add_zrot_val) @ c2w[:3, :3]
    c2w[2, 3] += add_tz
    return _rebuild(cam, c2w)
