"""Pallas blend kernel vs golden dense reference: forward + gradient parity.

Runs the kernel in interpret mode on CPU; the same code compiles for TPU."""

import jax
import jax.numpy as jnp
import numpy as np

from vegs_tpu import geometry
from vegs_tpu.ops import binning, blend_pallas, blend_ref
from vegs_tpu.ops.projection import project
from vegs_tpu.ops.rasterize import RasterizeConfig, rasterize

from utils import make_camera, random_gaussians

K_CAP = 1 << 13


def _setup(rng, n=220, h=32, w=128):
    cam = make_camera(height=h, width=w)
    means, quats, scales, opac, shs = random_gaussians(rng, n)
    cov6 = geometry.strip_symmetric(
        geometry.covariance_from_scaling_rotation(scales, quats)
    )
    proj = project(means, cov6, opac, shs, cam)
    grid = binning.TileGrid.for_image(h, w)
    binned = binning.bin_gaussians(proj.means2d, proj.depths, proj.radii, grid, K_CAP)
    quat_n = geometry.quat_standardize(geometry.quat_normalize(quats))
    payload = jnp.concatenate(
        [
            proj.means2d.T, proj.conics.T, proj.opacities[None],
            proj.rgb.T, proj.depths[None], quat_n.T, scales.T,
        ],
        axis=0,
    )
    payload = jnp.pad(payload, ((0, 0), (0, 1)))
    payload_sorted = payload[:, binned.gidx]
    return cam, grid, binned, payload_sorted, (h, w)


def test_pallas_forward_matches_dense(rng):
    cam, grid, binned, payload_sorted, (h, w) = _setup(rng)
    hp, wp = grid.padded_height, grid.padded_width
    out_p = blend_pallas.blend(payload_sorted, binned.tile_starts, grid, hp, wp)
    out_d = blend_ref.blend_dense(
        payload_sorted, binned.sort_keys, binned.tile_starts, grid, hp, wp
    )
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_d), atol=3e-5, rtol=1e-4
    )
    # scene has real coverage
    assert np.asarray(out_p)[blend_ref.N_ACCUM].min() < 0.9


def test_pallas_backward_matches_dense(rng):
    cam, grid, binned, payload_sorted, (h, w) = _setup(rng, n=150)
    hp, wp = grid.padded_height, grid.padded_width

    key = jax.random.key(1)
    dout_seed = jax.random.normal(key, (blend_ref.OUT_CHANNELS, hp, wp))

    def loss_p(pay):
        out = blend_pallas.blend(pay, binned.tile_starts, grid, hp, wp)
        return jnp.sum(out * dout_seed)

    def loss_d(pay):
        out = blend_ref.blend_dense(
            pay, binned.sort_keys, binned.tile_starts, grid, hp, wp
        )
        return jnp.sum(out * dout_seed)

    gp = np.asarray(jax.grad(loss_p)(payload_sorted))
    gd = np.asarray(jax.grad(loss_d)(payload_sorted))
    assert np.isfinite(gp).all()
    scale = np.abs(gd).max() + 1e-8
    np.testing.assert_allclose(gp / scale, gd / scale, atol=2e-5)


def test_rasterize_pallas_backend_end_to_end(rng):
    h, w = 32, 128
    cam = make_camera(height=h, width=w)
    means, quats, scales, opac, shs = random_gaussians(rng, 120)
    bg = jnp.asarray([0.2, 0.1, 0.4])
    cfg_p = RasterizeConfig(backend="pallas", k_cap=K_CAP)
    cfg_d = RasterizeConfig(backend="dense", k_cap=K_CAP)
    out_p = rasterize(means, quats, scales, opac, shs, cam, bg=bg, config=cfg_p)
    out_d = rasterize(means, quats, scales, opac, shs, cam, bg=bg, config=cfg_d)
    np.testing.assert_allclose(
        np.asarray(out_p.rgb), np.asarray(out_d.rgb), atol=3e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_p.alpha), np.asarray(out_d.alpha), atol=3e-5
    )

    def loss(means, quats, scales, opac, shs, backend_cfg):
        out = rasterize(means, quats, scales, opac, shs, cam, bg=bg,
                        config=backend_cfg)
        return jnp.mean(out.rgb**2) + jnp.mean(out.depth**2)

    gp = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(means, quats, scales, opac, shs, cfg_p)
    gd = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(means, quats, scales, opac, shs, cfg_d)
    for a, b, name in zip(gp, gd, ["means", "quats", "scales", "opac", "shs"]):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(a / scale, b / scale, atol=3e-4, err_msg=name)
