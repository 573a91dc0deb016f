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


def _setup(rng, n=220, h=32, w=128, aux_dtype=jnp.float32):
    cam = make_camera(height=h, width=w)
    means, quats, scales, opac, shs = random_gaussians(rng, n)
    cov6 = geometry.strip_symmetric(
        geometry.covariance_from_scaling_rotation(scales, quats)
    )
    proj = project(means, cov6, opac, shs, cam)
    grid = binning.TileGrid.for_image(h, w)
    binned = binning.bin_gaussians(proj.means2d, proj.depths, proj.radii_xy, grid, K_CAP)
    quat_n = geometry.quat_standardize(geometry.quat_normalize(quats))
    pay_f32 = jnp.concatenate(
        [proj.means2d.T, proj.conics.T, proj.opacities[None],
         proj.depths[None], jnp.zeros((1, n))], axis=0)
    pay_aux = jnp.concatenate(
        [proj.rgb.T, quat_n.T, scales.T, jnp.zeros((6, n))], axis=0
    ).astype(aux_dtype)
    pf = jnp.pad(pay_f32, ((0, 0), (0, 1)))[:, binned.gidx]
    pa = jnp.pad(pay_aux, ((0, 0), (0, 1)))[:, binned.gidx]
    return cam, grid, binned, pf, pa, (h, w)


def _dense_payload(pf, pa):
    """Assemble the [17, K] golden layout from the split payload."""
    pa_f = pa.astype(jnp.float32)
    return jnp.concatenate(
        [pf[:6], pa_f[0:3], pf[6:7], pa_f[3:10]], axis=0)


def test_pallas_forward_matches_dense(rng):
    cam, grid, binned, pf, pa, (h, w) = _setup(rng)
    hp, wp = grid.padded_height, grid.padded_width
    out_p = blend_pallas.blend(pf, pa, binned.tile_starts, grid, hp, wp)
    out_d = blend_ref.blend_dense(
        _dense_payload(pf, pa), binned.sort_keys, binned.tile_starts, grid, hp, wp
    )
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_d), atol=3e-5, rtol=1e-4
    )
    # scene has real coverage
    assert np.asarray(out_p)[blend_ref.N_ACCUM].min() < 0.9


def test_pallas_forward_bf16_payload_close(rng):
    """bf16 rgb/quat/scale payload stays within bf16 rounding of the f32 path."""
    cam, grid, binned, pf, pa, (h, w) = _setup(rng, aux_dtype=jnp.bfloat16)
    hp, wp = grid.padded_height, grid.padded_width
    out_b = blend_pallas.blend(pf, pa, binned.tile_starts, grid, hp, wp)
    out_f = blend_pallas.blend(
        pf, pa.astype(jnp.float32), binned.tile_starts, grid, hp, wp)
    np.testing.assert_allclose(
        np.asarray(out_b), np.asarray(out_f), atol=2e-2, rtol=1e-2
    )


def test_pallas_backward_matches_dense(rng):
    cam, grid, binned, pf, pa, (h, w) = _setup(rng, n=150)
    hp, wp = grid.padded_height, grid.padded_width

    key = jax.random.key(1)
    dout_seed = jax.random.normal(key, (blend_ref.OUT_CHANNELS, hp, wp))

    def loss_p(pf, pa):
        out = blend_pallas.blend(pf, pa, binned.tile_starts, grid, hp, wp)
        return jnp.sum(out * dout_seed)

    def loss_d(pf, pa):
        out = blend_ref.blend_dense(
            _dense_payload(pf, pa), binned.sort_keys, binned.tile_starts,
            grid, hp, wp
        )
        return jnp.sum(out * dout_seed)

    gp_f, gp_a = jax.grad(loss_p, argnums=(0, 1))(pf, pa)
    gd_f, gd_a = jax.grad(loss_d, argnums=(0, 1))(pf, pa)
    for a, b, name in [(gp_f, gd_f, "f32"), (gp_a, gd_a, "aux")]:
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all()
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-5, err_msg=name)


def test_rasterize_pallas_backend_end_to_end(rng):
    h, w = 32, 128
    cam = make_camera(height=h, width=w)
    means, quats, scales, opac, shs = random_gaussians(rng, 120)
    bg = jnp.asarray([0.2, 0.1, 0.4])
    cfg_p = RasterizeConfig(backend="pallas", k_cap=K_CAP, payload_dtype="f32")
    cfg_d = RasterizeConfig(backend="dense", k_cap=K_CAP, payload_dtype="f32")
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


def test_rasterize_bf16_payload_end_to_end_close(rng):
    """Default (bf16) payload: image and grads near the f32 path; gradients
    tolerate one bf16 rounding of the rgb/quat/scale channels."""
    h, w = 32, 128
    cam = make_camera(height=h, width=w)
    means, quats, scales, opac, shs = random_gaussians(rng, 120)
    bg = jnp.asarray([0.2, 0.1, 0.4])
    cfg_b = RasterizeConfig(backend="pallas", k_cap=K_CAP, payload_dtype="bf16")
    cfg_f = RasterizeConfig(backend="pallas", k_cap=K_CAP, payload_dtype="f32")

    def loss(means, quats, scales, opac, shs, cfg):
        out = rasterize(means, quats, scales, opac, shs, cam, bg=bg, config=cfg)
        return jnp.mean(out.rgb**2) + jnp.mean(out.depth**2)

    lb = loss(means, quats, scales, opac, shs, cfg_b)
    lf = loss(means, quats, scales, opac, shs, cfg_f)
    np.testing.assert_allclose(float(lb), float(lf), rtol=2e-2)

    gb = jax.grad(loss, argnums=(0, 2))(means, quats, scales, opac, shs, cfg_b)
    gf = jax.grad(loss, argnums=(0, 2))(means, quats, scales, opac, shs, cfg_f)
    for a, b, name in zip(gb, gf, ["means", "scales"]):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-2, err_msg=name)


def test_pallas_chunk256_parity(rng):
    """chunk=256 (1 compute chunk per DMA superchunk) must match the golden
    dense blend in forward AND gradients exactly like the default chunk."""
    cam, grid, binned, pf, pa, (h, w) = _setup(rng, n=150)
    hp, wp = grid.padded_height, grid.padded_width
    out_p = blend_pallas.blend(pf, pa, binned.tile_starts, grid, hp, wp,
                               chunk=256)
    out_d = blend_ref.blend_dense(
        _dense_payload(pf, pa), binned.sort_keys, binned.tile_starts, grid,
        hp, wp)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_d), atol=3e-5, rtol=1e-4)

    key = jax.random.key(2)
    dout_seed = jax.random.normal(key, (blend_ref.OUT_CHANNELS, hp, wp))

    def loss_p(pf, pa):
        out = blend_pallas.blend(pf, pa, binned.tile_starts, grid, hp, wp,
                                 chunk=256)
        return jnp.sum(out * dout_seed)

    def loss_d(pf, pa):
        out = blend_ref.blend_dense(
            _dense_payload(pf, pa), binned.sort_keys, binned.tile_starts,
            grid, hp, wp)
        return jnp.sum(out * dout_seed)

    gp_f, gp_a = jax.grad(loss_p, argnums=(0, 1))(pf, pa)
    gd_f, gd_a = jax.grad(loss_d, argnums=(0, 1))(pf, pa)
    for a, b, name in [(gp_f, gd_f, "f32"), (gp_a, gd_a, "aux")]:
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all()
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-5, err_msg=name)


def test_rasterize_pallas_16x32_tiles_parity(rng):
    """16x32 tiles (the bench's production shape on v5e — wide tiles suit
    the 128-lane blend layout and cut the instance count ~10%) must match
    the dense golden in forward and gradients like the default 16x16."""
    h, w = 48, 160
    cam = make_camera(height=h, width=w)
    means, quats, scales, opac, shs = random_gaussians(rng, 150)
    bg = jnp.asarray([0.2, 0.1, 0.4])
    cfg_p = RasterizeConfig(backend="pallas", k_cap=K_CAP,
                            payload_dtype="f32", tile_h=16, tile_w=32)
    cfg_d = RasterizeConfig(backend="dense", k_cap=K_CAP,
                            payload_dtype="f32", tile_h=16, tile_w=32)
    out_p = rasterize(means, quats, scales, opac, shs, cam, bg=bg,
                      config=cfg_p)
    out_d = rasterize(means, quats, scales, opac, shs, cam, bg=bg,
                      config=cfg_d)
    np.testing.assert_allclose(
        np.asarray(out_p.rgb), np.asarray(out_d.rgb), atol=3e-5, rtol=1e-4)

    def loss(means, scales, cfg):
        out = rasterize(means, quats, scales, opac, shs, cam, bg=bg,
                        config=cfg)
        return jnp.mean(out.rgb ** 2) + jnp.mean(out.depth ** 2)

    gp = jax.grad(loss, argnums=(0, 1))(means, scales, cfg_p)
    gd = jax.grad(loss, argnums=(0, 1))(means, scales, cfg_d)
    for a, b, name in zip(gp, gd, ["means", "scales"]):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(a / scale, b / scale, atol=3e-4,
                                   err_msg=name)
