"""Benchmark entry point (run by the driver on real TPU hardware).

Measures differentiable-rasterization throughput (forward+backward) at the
reference's canonical KITTI-360 workload shape — 376x1408 stereo resolution
(BASELINE.md: "Rendered Mpix/s fwd+bwd per chip") — on a synthetic scene
sized like a mid-training KITTI segment, at BOTH recorded scales:

  * 500k Gaussians — the historical bench default (the `value` field, for
    round-over-round comparability), and
  * 2,233,571 Gaussians — the reference's actual recorded mid-training
    shape (/root/reference/gaussian_renderer/__init__.py:116-118), emitted
    as `ref_scale_mpixs` so the reference-scale number is driver-captured
    every round instead of living in prose.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N,
   "ref_scale_mpixs": N, "ref_scale_vs_baseline": N}

vs_baseline is relative to NOMINAL_BASELINE_MPIXS, a documented assumption for
the CUDA reference (the reference repo publishes no numbers, BASELINE.md): a
single modern GPU runs the 3DGS fwd+bwd at roughly 10 Mpix/s on scenes of
this scale.

VEGS_BENCH_N overrides to a SINGLE scale (no second measurement) for A/B
experiments.
"""

import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

NOMINAL_BASELINE_MPIXS = 10.0

H, W = 376, 1408
DEFAULT_N = 500_000
REF_SCALE_N = 2_233_571
# Tile-shape A/B (perf experiments; production default is 16x16):
TILE_H = int(os.environ.get("VEGS_TILE_H", "16"))
TILE_W = int(os.environ.get("VEGS_TILE_W", "16"))
# Validate before building the config: an incompatible tile shape would
# otherwise surface as a deep Mosaic compile error (the Pallas blend packs
# 8 adjacent tiles into one (tile_h, 8*tile_w) block whose lane dim must
# tile the 128-lane registers).
if TILE_H <= 0 or TILE_W <= 0 or (8 * TILE_W) % 128 != 0:
    raise SystemExit(
        f"VEGS_TILE_H/W=({TILE_H},{TILE_W}) invalid: tile_h must be "
        "positive and tile_w a positive multiple of 16 (the blend kernel "
        "packs 8 tiles into one 128-lane-aligned block)")
TIMING_ITERS = 8


def measure(n_gaussians: int) -> float:
    """Rasterizer fwd+bwd throughput (Mpix/s) at `n_gaussians` scale."""
    import jax
    import jax.numpy as jnp

    from tests.utils import make_camera, random_gaussians
    from vegs_tpu.ops.rasterize import RasterizeConfig, rasterize

    # Probe capacity: must stay under binning's 2^23 cull-compact packing
    # gate so the probe measures the same (post-cull) totals the sized run
    # will see.
    probe_cap = 1 << 21 if n_gaussians <= 1_000_000 else (1 << 23) - 512

    cam = make_camera(height=H, width=W, fovx=1.2, fovy=0.4)
    rng = np.random.default_rng(0)
    means, quats, scales, opac, shs = random_gaussians(
        rng, n_gaussians, depth_range=(2.0, 60.0), xy_extent=40.0,
        scale_range=(0.002, 0.025))
    # Distribute the cloud across the view frustum so (like a trained scene)
    # nearly every Gaussian is visible: z in [2, 60], x/y filling the image.
    z = np.asarray(rng.uniform(2.0, 60.0, n_gaussians), np.float32)
    u = rng.uniform(-0.95, 0.95, n_gaussians)
    v = rng.uniform(-0.95, 0.95, n_gaussians)
    means = jnp.asarray(np.stack([
        z * np.tan(0.6) * u, z * np.tan(0.2) * v, z], axis=1, dtype=np.float32))
    # Auto-size the instance capacity (every binning/gather/sort stage is
    # O(k_cap), not O(actual instances)): probe the scene once at a generous
    # cap, then use the real padded-layout requirement + 5% headroom, like
    # the trainer's adaptive bucket logic would settle to.
    from vegs_tpu.ops import binning as _binning
    from vegs_tpu import geometry as _geometry
    from vegs_tpu.ops.projection import project as _project

    _grid = _binning.TileGrid.for_image(H, W, TILE_H, TILE_W)
    _cov6 = _geometry.cov6_from_scaling_rotation(scales, quats)
    _proj = _project(means, _cov6, opac, shs, cam)
    _probe = _binning.bin_gaussians(
        _proj.means2d, _proj.depths, _proj.radii_xy, _grid, probe_cap,
        conics=_proj.conics, opacities=_proj.opacities)
    # Size the TWO capacities independently (binning's k_cap/k_pad split):
    # the raw stream must hold every assigned slot (post-cull totals under
    # the cull-compact path — rb.total), the padded layout needs
    # tile_starts[-1] slots (kept + per-tile PAD_ALIGN rounding). At 500k
    # the padding exceeds the residual cull slack so k_pad > k_cap; sizing
    # one capacity by the max of both wastes ~15% of every raw-stage sort/
    # gather (and at 2.23M, sizing by the padded need alone dropped ~557k
    # real instances — measured 2026-08-20).
    # VEGS_COMPACT: "1" force on, "0" force off, unset = auto (the
    # production n-gated default, binning.COMPACT_MAX_N)
    _ce = os.environ.get("VEGS_COMPACT", "auto")
    _compact = None if _ce == "auto" else (_ce != "0")
    _rb = _binning.bin_raw(
        _proj.means2d, _proj.depths, _proj.radii_xy, _grid, probe_cap,
        conics=_proj.conics, opacities=_proj.opacities, compact=_compact)
    # VEGS_SATCULL: "1"/"0" force the saturation prepass; unset = the
    # library's auto gate (deep mean instance depth only — at 500k nothing
    # saturates and the prepass is pure overhead, measured).
    from vegs_tpu.ops.rasterize import SAT_MIN_SLOTS_PER_TILE
    _se = os.environ.get("VEGS_SATCULL", "auto")
    _k_raw_est = min(probe_cap, (int(int(_rb.total) * 1.05) + 511)
                     // 512 * 512)
    if _se == "auto":
        _sat_on = _k_raw_est >= SAT_MIN_SLOTS_PER_TILE * _grid.num_tiles
    else:
        _sat_on = _se != "0"
    if _sat_on:
        # k_pad is sized by the SATCULLED padded need — the saturation
        # prepass clips each tile to its contributing prefix, so the padded
        # layout (and every downstream stage) shrinks accordingly.
        import jax.numpy as jnp
        from vegs_tpu.ops import satcull as _satcull
        from vegs_tpu.ops.rasterize import build_payload as _bp
        from vegs_tpu import geometry as _geo

        _qn = _geo.quat_standardize(_geo.quat_normalize(quats))
        _pf, _ = _bp(_proj, _qn, scales, jnp.bfloat16)
        _pf_sorted = jnp.pad(_pf, ((0, 1), (0, 0)))[_rb.gidx_sorted]
        _sat = _satcull.satcount(_pf_sorted.T, _rb.raw_starts, _grid)
        _probe = _binning.bin_gaussians(
            _proj.means2d, _proj.depths, _proj.radii_xy, _grid, probe_cap,
            conics=_proj.conics, opacities=_proj.opacities,
            rb=_rb, sat_counts=_sat)
    _need_raw = int(_rb.total)
    _need_pad = int(_probe.tile_starts[-1])
    _r512 = lambda v: (int(v * 1.05) + 511) // 512 * 512
    k_cap = min(probe_cap, _r512(_need_raw))
    k_pad = min(probe_cap, _r512(_need_pad))
    print(f"# [{n_gaussians}] auto k_cap: raw need {_need_raw} -> {k_cap}, "
          f"padded need {_need_pad} -> {k_pad} (satcull={_sat_on})",
          file=sys.stderr)
    # Honesty guard: verify nothing is dropped at the auto-sized caps.
    _check = _binning.bin_gaussians(
        _proj.means2d, _proj.depths, _proj.radii_xy, _grid, k_cap,
        conics=_proj.conics, opacities=_proj.opacities, k_pad=k_pad,
        compact=_compact,
        sat_counts=(_sat if _sat_on else None))
    _nd = int(_check.num_dropped)
    assert _nd == 0, f"bench caps drop {_nd} instances — size by need"

    cfg = RasterizeConfig(
        backend="pallas", k_cap=k_cap, k_pad=k_pad,
        tile_h=TILE_H, tile_w=TILE_W,
        cull_compact="auto" if _compact is None else _compact,
        sat_cull=_sat_on,
        blend_chunk=int(os.environ.get("VEGS_BLEND_CHUNK", "256")))
    bg = jnp.zeros(3)

    @functools.partial(jax.jit, static_argnums=(5,))
    def fwdbwd_loop(means, quats, scales, opac, shs, iters):
        def loss(m, q, s, o, sh):
            out = rasterize(m, q, s, o, sh, cam, bg=bg, config=cfg)
            return jnp.mean(out.rgb ** 2) + 0.01 * jnp.mean(out.depth ** 2)

        def body(i, acc):
            m = means + jnp.sin(acc) * 1e-20  # genuine loop dependency
            l, g = jax.value_and_grad(loss)(m, quats, scales, opac, shs)
            return acc + l + jnp.sum(g) * 1e-9

        return jax.lax.fori_loop(0, iters, body, 0.0)

    args = (means, quats, scales, opac, shs)
    # Warm both trace-cache entries, then difference 1-iter vs (1+K)-iter
    # timings to cancel dispatch latency (the remote-TPU tunnel adds ~40ms
    # per call and block_until_ready does not truly sync).
    float(fwdbwd_loop(*args, 1))
    t0 = time.time(); float(fwdbwd_loop(*args, 1)); t1 = time.time()
    float(fwdbwd_loop(*args, 1 + TIMING_ITERS))
    t2 = time.time(); float(fwdbwd_loop(*args, 1 + TIMING_ITERS)); t3 = time.time()
    per_iter = ((t3 - t2) - (t1 - t0)) / TIMING_ITERS
    return H * W / per_iter / 1e6


def main():
    override = os.environ.get("VEGS_BENCH_N")
    if override is not None:
        mpixs = measure(int(override))
        print(json.dumps({
            "metric": "rasterize_fwd_bwd_throughput",
            "value": round(mpixs, 3),
            "unit": "Mpix/s",
            "vs_baseline": round(mpixs / NOMINAL_BASELINE_MPIXS, 4),
            "n_gaussians": int(override),
        }))
        return

    mpixs = measure(DEFAULT_N)
    ref_mpixs = measure(REF_SCALE_N)
    print(json.dumps({
        "metric": "rasterize_fwd_bwd_throughput",
        "value": round(mpixs, 3),
        "unit": "Mpix/s",
        "vs_baseline": round(mpixs / NOMINAL_BASELINE_MPIXS, 4),
        "ref_scale_mpixs": round(ref_mpixs, 3),
        "ref_scale_vs_baseline": round(ref_mpixs / NOMINAL_BASELINE_MPIXS, 4),
    }))


if __name__ == "__main__":
    main()
