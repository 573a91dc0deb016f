"""Saturation-prepass (ops/satcull.py) correctness.

The cull must be LOSSLESS w.r.t. the blend spec: clipping each tile's
stream to its saturation prefix may not change any output pixel or any
gradient (culled instances sit behind every pixel's T < 1e-4 stop).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.utils import make_camera, random_gaussians
from vegs_tpu import geometry
from vegs_tpu.ops import binning, satcull
from vegs_tpu.ops.projection import project
from vegs_tpu.ops.rasterize import RasterizeConfig, rasterize

H, W = 32, 128
K = 1 << 13


def _scene(seed=0, n=900):
    rng = np.random.default_rng(seed)
    means, quats, scales, opac, shs = random_gaussians(
        rng, n, depth_range=(1.5, 10.0), xy_extent=3.0,
        scale_range=(0.1, 0.6), opacity_range=(0.5, 0.99))
    cam = make_camera(height=H, width=W, fovx=1.0, fovy=0.3)
    return cam, means, quats, scales, opac, shs


def test_satcount_kernel_matches_loop_oracle():
    cam, means, quats, scales, opac, shs = _scene()
    grid = binning.TileGrid.for_image(H, W)
    cov6 = geometry.cov6_from_scaling_rotation(scales, quats)
    proj = project(means, cov6, opac, shs, cam)
    rb = binning.bin_raw(proj.means2d, proj.depths, proj.radii_xy, grid, K,
                         conics=proj.conics, opacities=proj.opacities)
    n = means.shape[0]
    pay = jnp.concatenate(
        [proj.means2d, proj.conics, proj.opacities[:, None],
         proj.depths[:, None], jnp.zeros((n, 1), jnp.float32)], axis=1)
    pf_sorted = jnp.pad(pay, ((0, 1), (0, 0)))[rb.gidx_sorted]
    counts = np.asarray(satcull.satcount(pf_sorted.T, rb.raw_starts, grid))
    oracle = satcull.satcount_np(np.asarray(pf_sorted.T),
                                 np.asarray(rb.raw_starts), grid)
    np.testing.assert_array_equal(counts, oracle)
    raw_counts = np.diff(np.asarray(rb.raw_starts))
    assert counts.sum() < raw_counts.sum(), "scene saturates; cull must bite"


def test_satcull_outputs_and_grads_match_unculled():
    cam, means, quats, scales, opac, shs = _scene()
    bg = jnp.asarray([0.1, 0.2, 0.3])
    cfg_on = RasterizeConfig(backend="pallas", k_cap=K, payload_dtype="f32",
                             sat_cull=True)
    cfg_off = RasterizeConfig(backend="pallas", k_cap=K, payload_dtype="f32",
                              sat_cull=False)

    def run(cfg):
        def f(m, q, s, o, sh):
            out = rasterize(m, q, s, o, sh, cam, bg=bg, config=cfg)
            loss = (jnp.mean(out.rgb ** 2) + 0.05 * jnp.mean(out.depth ** 2)
                    + 0.02 * jnp.mean(out.cov_quat ** 2)
                    + 0.1 * jnp.mean(out.alpha))
            return loss, out
        (l, out), g = jax.value_and_grad(f, argnums=(0, 1, 2, 3, 4),
                                         has_aux=True)(
            means, quats, scales, opac, shs)
        return l, out, g

    l1, out1, g1 = run(cfg_on)
    l0, out0, g0 = run(cfg_off)
    assert int(out1.num_dropped) == 0 and int(out0.num_dropped) == 0
    # the cull must actually trim this saturating scene
    assert int(out1.num_needed) < int(out0.num_needed)
    for name in ("rgb", "depth", "alpha", "cov_quat", "cov_scale"):
        np.testing.assert_array_equal(
            np.asarray(getattr(out1, name)), np.asarray(getattr(out0, name)),
            err_msg=name)
    # gradients: equal up to f32 reduction-order noise (the compact backward
    # re-associates the segment reduce; test_satcull_compact_backward_exact
    # proves the machinery is EXACT for order-independent cotangents)
    for a, b in zip(g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5)


def test_satcull_compact_backward_exact():
    """The compacted (order, gauss_ends) backward must reduce EXACTLY the
    same instance set as the full-width one: with integer-valued payloads
    and cotangents zeroed on saturated-out slots (as the blend guarantees),
    the per-Gaussian gradients are order-independent integers — any
    mismatch is a real mis-mapping, not float noise."""
    from vegs_tpu.ops.rasterize import gather_expand

    cam, means, quats, scales, opac, shs = _scene()
    n = means.shape[0]
    grid = binning.TileGrid.for_image(H, W)
    cov6 = geometry.cov6_from_scaling_rotation(scales, quats)
    proj = project(means, cov6, opac, shs, cam)
    rb = binning.bin_raw(proj.means2d, proj.depths, proj.radii_xy, grid, K,
                         conics=proj.conics, opacities=proj.opacities)
    pay = jnp.concatenate(
        [proj.means2d, proj.conics, proj.opacities[:, None],
         proj.depths[:, None], jnp.zeros((n, 1), jnp.float32)], 1)
    pf_sorted = jnp.pad(pay, ((0, 1), (0, 0)))[rb.gidx_sorted]
    sat = satcull.satcount(pf_sorted.T, rb.raw_starts, grid)

    kw = dict(conics=proj.conics, opacities=proj.opacities)
    b_full = binning.bin_gaussians(proj.means2d, proj.depths, proj.radii_xy,
                                   grid, K, **kw)
    b_sat = binning.bin_gaussians(proj.means2d, proj.depths, proj.radii_xy,
                                  grid, K, **kw, rb=rb, sat_counts=sat)

    rng = np.random.default_rng(7)
    pf_t = jnp.asarray(rng.integers(-8, 8, size=(n + 1, 8)), jnp.float32)
    pa_t = jnp.asarray(rng.integers(-8, 8, size=(n + 1, 16)), jnp.float32)

    def sat_weight(b):
        kp = b.gidx.shape[0]
        slot = jnp.arange(kp)
        tile_of = jnp.cumsum(jnp.zeros(kp, jnp.int32).at[
            jnp.clip(b.tile_starts[1:-1], 0, kp - 1)].add(1, mode="drop"))
        rank = slot - b.tile_starts[tile_of]
        return ((b.gidx < n) & (rank < sat[tile_of])
                ).astype(jnp.float32)[:, None]

    def run(b):
        w = sat_weight(b)
        ends = jnp.concatenate([b.gauss_ends, b.gauss_ends[-1:]])

        def f(pf, pa):
            a, c = gather_expand(pf, pa, b.gidx, b.order, ends)
            return jnp.sum(a * w) * 2.0 + jnp.sum(c * w) * 3.0

        return jax.grad(f, argnums=(0, 1))(pf_t, pa_t)

    gf, ga = run(b_full)
    sf, sa = run(b_sat)
    np.testing.assert_array_equal(np.asarray(gf), np.asarray(sf))
    np.testing.assert_array_equal(np.asarray(ga), np.asarray(sa))


def test_satcull_with_kpad_exceeding_kcap():
    """k_pad > k_cap happens at real scales (per-tile padding exceeds the
    cull slack); the compact working set must bound by BOTH capacities."""
    cam, means, quats, scales, opac, shs = _scene(seed=5)
    bg = jnp.zeros(3)
    cfg_on = RasterizeConfig(backend="pallas", k_cap=K, k_pad=2 * K,
                             payload_dtype="f32", sat_cull=True)
    cfg_off = RasterizeConfig(backend="pallas", k_cap=K, k_pad=2 * K,
                              payload_dtype="f32", sat_cull=False)

    def f(cfg):
        def loss(m):
            out = rasterize(m, quats, scales, opac, shs, cam, bg=bg,
                            config=cfg)
            return jnp.mean(out.rgb ** 2), out
        (l, out), g = jax.value_and_grad(loss, has_aux=True)(means)
        return l, out, g

    l1, out1, g1 = f(cfg_on)
    l0, out0, g0 = f(cfg_off)
    np.testing.assert_array_equal(np.asarray(out1.rgb), np.asarray(out0.rgb))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=0, atol=1e-5)


def test_satcull_matches_dense_golden():
    cam, means, quats, scales, opac, shs = _scene(seed=3)
    bg = jnp.asarray([0.3, 0.1, 0.0])
    cfg_p = RasterizeConfig(backend="pallas", k_cap=K, payload_dtype="f32",
                            sat_cull=True)
    cfg_d = RasterizeConfig(backend="dense", k_cap=K, payload_dtype="f32")
    out_p = rasterize(means, quats, scales, opac, shs, cam, bg=bg,
                      config=cfg_p)
    out_d = rasterize(means, quats, scales, opac, shs, cam, bg=bg,
                      config=cfg_d)
    assert int(out_p.num_dropped) == 0 and int(out_d.num_dropped) == 0
    for name in ("rgb", "depth", "alpha", "cov_quat", "cov_scale"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_p, name)),
            np.asarray(getattr(out_d, name)), atol=2e-5, err_msg=name)
