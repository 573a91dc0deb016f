"""Multi-device sharding: DP train step on the 8-device virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from vegs_tpu import gaussians, optim
from vegs_tpu.config import OptimizationParams
from vegs_tpu.gaussians import DensifyStats
from vegs_tpu.ops.rasterize import RasterizeConfig
from vegs_tpu.parallel import make_dp_train_step, make_mesh
from vegs_tpu.parallel.sharded_step import stack_camera_batch

from utils import make_camera


def _setup(rng, n_devices, h=32, w=128):
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (200, 3)).astype(np.float32)
    field = gaussians.create_from_points(pts, cols, capacity=256)
    cams = []
    for i in range(n_devices):
        th = 2 * np.pi * i / n_devices
        R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                      [-np.sin(th), 0, np.cos(th)]])
        cams.append(make_camera(height=h, width=w, R=R, t=np.array([0, 0, 4.0])))
    return field, cams, h, w


def test_dp_step_runs_and_matches_single_device(rng):
    n_dev = len(jax.devices())
    assert n_dev >= 8, "conftest should provide 8 virtual devices"
    field, cams, h, w = _setup(rng, 8)
    opt_state = optim.adam_init(field)
    stats = DensifyStats.zeros(field.capacity)
    mesh = make_mesh(8)
    raster = RasterizeConfig(backend="dense", k_cap=1 << 12)

    step = make_dp_train_step(mesh, OptimizationParams(), raster,
                              spatial_scale=4.0, height=h, width=w)
    cam_batch = stack_camera_batch(cams)
    gt = jnp.zeros((8, 3, h, w))
    normal = jnp.zeros((8, 3, h, w))
    f2, o2, s2, step2, metrics = step(field, opt_state, stats, jnp.int32(0),
                                      cam_batch, gt, normal, jnp.int32(3),
                                      jnp.zeros(3))
    assert int(step2) == 1
    assert np.isfinite(float(metrics["loss"]))
    # params actually moved
    assert float(jnp.abs(f2.sh_dc - field.sh_dc).sum()) > 0

    # single-device reference: mean of per-camera grads == psum/nd result
    def loss_one(params, cam):
        from vegs_tpu.render import field_arrays, _run
        from vegs_tpu.losses import l1_loss, ssim

        fl = optim.with_params(field, params)
        arrays = field_arrays(fl, 3)
        out = _run(cam, arrays, bg=jnp.zeros(3), scale_modifier=1.0,
                   override_color=None, sh_degree=3, config=raster,
                   means2d_offset=None)
        o = OptimizationParams()
        return ((1 - o.lambda_dssim) * l1_loss(out.rgb, jnp.zeros((3, h, w)))
                + o.lambda_dssim * (1 - ssim(out.rgb, jnp.zeros((3, h, w)))))

    params = optim.split_params(field)
    grads = [jax.grad(loss_one)(params, c) for c in cams]
    mean_grad = jax.tree.map(lambda *g: sum(g) / len(g), *grads)
    lrs = optim.field_lrs(OptimizationParams(), 4.0, jnp.int32(0))
    f_ref, _ = optim.adam_step(field, mean_grad, opt_state, lrs)
    np.testing.assert_allclose(
        np.asarray(f2.sh_dc), np.asarray(f_ref.sh_dc), atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(f2.means), np.asarray(f_ref.means), atol=2e-6)


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
