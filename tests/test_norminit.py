"""Normal-guided covariance initialization."""

import numpy as np
import jax.numpy as jnp

from vegs_tpu import gaussians, geometry
from vegs_tpu.priors import (NormalAccumulator, accumulate_camera_normals,
                             finalize_normal_init)

from utils import make_camera


def test_norminit_aligns_first_axis(rng):
    # Gaussians on a fronto-parallel plane z=5; normals all point -z (toward
    # camera). After init, each rotation's first column should be +-n and
    # scales flattened.
    n = 40
    pts = np.stack([
        rng.uniform(-1.5, 1.5, n), rng.uniform(-0.8, 0.8, n), np.full(n, 5.0)
    ], 1).astype(np.float32)
    field = gaussians.create_from_points(pts, np.full((n, 3), 0.5), capacity=64)

    h, w = 64, 128
    cam = make_camera(height=h, width=w)
    normal = np.zeros((3, h, w), np.float32)
    normal[2] = -1.0  # facing the camera

    acc = NormalAccumulator.zeros(field.capacity)
    acc = accumulate_camera_normals(acc, field, cam, jnp.asarray(normal))
    count = np.asarray(acc.count)
    assert count[:n].sum() > 0  # most points visible
    assert count[n:].sum() == 0  # padding slots untouched

    out = finalize_normal_init(field, acc)
    R = np.asarray(geometry.quat_to_rotmat(out.quats[:n]))
    seen = count[:n] > 0
    first_axis = R[seen, :, 0]
    dots = np.abs(first_axis @ np.array([0, 0, -1.0]))
    np.testing.assert_allclose(dots, 1.0, atol=1e-4)
    s = np.exp(np.asarray(out.log_scales[:n][seen]))
    np.testing.assert_allclose(s[:, 0], 1e-5, rtol=1e-4)
    np.testing.assert_allclose(s[:, 1:], 1e-1, rtol=1e-4)


def test_norminit_consistency_vote(rng):
    # Two cameras: one sees normal +z, another sees it twice -> mean should
    # follow the majority/mean direction. With outer-product accumulation the
    # result is the chordal mean of the sampled quaternions.
    n = 4
    pts = np.stack([
        np.linspace(-0.5, 0.5, n), np.zeros(n), np.full(n, 5.0)
    ], 1).astype(np.float32)
    field = gaussians.create_from_points(pts, np.full((n, 3), 0.5), capacity=8)
    h, w = 32, 128
    cam = make_camera(height=h, width=w)

    nz = np.zeros((3, h, w), np.float32); nz[2] = -1.0
    nx = np.zeros((3, h, w), np.float32); nx[0] = 1.0

    acc = NormalAccumulator.zeros(field.capacity)
    acc = accumulate_camera_normals(acc, field, cam, jnp.asarray(nx))
    acc = accumulate_camera_normals(acc, field, cam, jnp.asarray(nz))
    acc = accumulate_camera_normals(acc, field, cam, jnp.asarray(nz))
    out = finalize_normal_init(field, acc)
    R = np.asarray(geometry.quat_to_rotmat(out.quats[:n]))
    # majority (-z) should dominate the first axis over (+x)
    dz = np.abs(R[:, 2, 0])
    dx = np.abs(R[:, 0, 0])
    assert (dz > dx).all()
