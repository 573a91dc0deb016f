"""Learned-prior initialization utilities (normal-guided covariance init)."""

from .norminit import (  # noqa: F401
    NormalAccumulator,
    accumulate_camera_normals,
    finalize_normal_init,
    initialize_gaussians_with_window_normals,
)
