"""Saturation prepass: per-tile kept-instance counts for the sorted stream.

At the reference scale (2.23M Gaussians, 376x1408) the per-pixel oracle
shows 91% of sorted instances contribute NOTHING — every pixel of their
tile has already crossed the blend spec's T < 1e-4 stop before they are
reached (perf/r09_satcull_analysis.py: 87.5% are a pure per-tile suffix,
83.7% at 256-superchunk granularity). The Pallas blend kernels already
skip those superchunks (their while-loops exit once every pixel crossed),
but every XLA stream stage — padded relayout, payload gather, blend DMA
layout, cotangent gather, segment reduce — still pays O(k) for them.

This module computes, per tile, how many leading instances of the RAW
(tile,depth)-sorted stream can possibly contribute, at PAD_ALIGN
superchunk granularity. `bin_gaussians` clips each tile's count with it
before the padded relayout, so every downstream stage runs at the
compacted size (the static caps shrink via the usual probe/adapter
auto-sizing).

Safety: the walk replays the blend spec's exact per-pixel crossing rule
(alpha clamp/skip, stop when T*(1-alpha) < T_EPS — blend_ref.py) on the
exact f32 payload, with TWO conservative twists:

  * the crossing test uses T_EPS * SAFETY (0.5): chunk-boundary
    association differs between this kernel and the blend kernel (the
    prepass walks 256-aligned windows of the raw stream, the blend walks
    padded per-tile ranges), so the f32 prefix sums can differ by ulps —
    the 2x transmittance margin means a pixel the blend considers crossed
    is at worst *kept* here, never culled on a knife edge;
  * counts round UP to the superchunk containing the final crossing.

Culled instances therefore contribute exactly zero in the blend (every
pixel of their tile has crossed before them) and receive exactly zero
gradients — removing them is lossless w.r.t. the compositing spec.

Everything here is stop-gradient (cull decisions are non-differentiable,
like binning).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import PAD_ALIGN, TileGrid
from .blend_ref import ALPHA_CLAMP, ALPHA_MIN, T_EPS

TILES_PER_PROG = 8
NEG_CAP = -80.0
SAFETY = 0.5          # cull threshold = T_EPS * SAFETY (see module docstring)


def _pixel_monomials(tile_h: int, tile_w: int) -> jax.Array:
    p = jax.lax.broadcasted_iota(jnp.int32, (tile_h * tile_w, 1), 0)
    y = (p // tile_w).astype(jnp.float32)
    x = (p % tile_w).astype(jnp.float32)
    one = jnp.ones_like(x)
    return jnp.concatenate([one, x, y, x * x, y * y, x * y], axis=1)


def _satcount_kernel(starts_ref, pf_hbm, out_ref, buf, sems,
                     *, ntx: int, tile_h: int, tile_w: int):
    """Grid (nty, ntx / TILES_PER_PROG); each program walks 8 tiles' raw
    ranges in 256-aligned windows and writes per-tile kept counts."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    p = tile_h * tile_w
    f32 = jnp.float32
    mono = _pixel_monomials(tile_h, tile_w)
    jc = jax.lax.broadcasted_iota(jnp.int32, (p, PAD_ALIGN), 1)
    tril_s = (jax.lax.broadcasted_iota(jnp.int32, (PAD_ALIGN, PAD_ALIGN), 0)
              < jax.lax.broadcasted_iota(
                  jnp.int32, (PAD_ALIGN, PAD_ALIGN), 1)).astype(f32)

    def window_dma(slot, w0, sc):
        off = pl.multiple_of(w0 + sc * PAD_ALIGN, PAD_ALIGN)
        return pltpu.make_async_copy(
            pf_hbm.at[:, pl.ds(off, PAD_ALIGN)], buf.at[slot], sems.at[slot])

    def tile_body(jt, _):
        tile_id = i * ntx + j * TILES_PER_PROG + jt
        start = starts_ref[tile_id]
        end = starts_ref[tile_id + 1]
        w0 = (start // PAD_ALIGN) * PAD_ALIGN
        nsc = jax.lax.div(end - w0 + PAD_ALIGN - 1, PAD_ALIGN)
        ox = ((j * TILES_PER_PROG + jt) * tile_w).astype(f32)
        oy = (i * tile_h).astype(f32)

        @pl.when(nsc > 0)
        def _():
            window_dma(0, w0, 0).start()

        def cond(state):
            sc, carry, crossed = state
            return (sc < nsc) & (jnp.min(crossed) < 1.0)

        def body(state):
            sc, carry, crossed = state
            slot = jax.lax.rem(sc, 2)

            @pl.when(sc + 1 < nsc)
            def _():
                window_dma(jax.lax.rem(sc + 1, 2), w0, sc + 1).start()

            window_dma(slot, w0, sc).wait()
            cf = buf[slot]                                  # [8, PAD_ALIGN]
            g0 = w0 + sc * PAD_ALIGN
            in_range = (g0 + jc >= start) & (g0 + jc < end)  # [P, C]

            mx = cf[0:1, :] - ox
            my = cf[1:2, :] - oy
            ca, cb, cc, op = cf[2:3, :], cf[3:4, :], cf[4:5, :], cf[5:6, :]
            q = jnp.concatenate(
                [
                    -0.5 * ca * mx * mx - 0.5 * cc * my * my - cb * mx * my,
                    ca * mx + cb * my,
                    cc * my + cb * mx,
                    -0.5 * ca,
                    -0.5 * cc,
                    -cb,
                ],
                axis=0,
            )
            power = jax.lax.dot_general(
                mono, q, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)
            alpha_raw = op * jnp.exp(jnp.minimum(power, 0.0))
            valid = ((power <= 0.0) & (alpha_raw >= ALPHA_MIN)
                     & in_range & (crossed == 0.0))
            alpha = jnp.where(valid, jnp.minimum(alpha_raw, ALPHA_CLAMP), 0.0)

            L = jnp.log1p(-alpha)
            S = jax.lax.dot_general(L, tril_s, (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)
            logT = jnp.maximum(carry + S, NEG_CAP)
            T1 = jnp.exp(logT)
            crossing = ((T1 * (1.0 - alpha) < T_EPS * SAFETY)
                        & (alpha > 0.0)).astype(f32)
            idx = jax.lax.broadcasted_iota(jnp.int32, alpha.shape, 1)
            cpos = jnp.min(jnp.where(crossing > 0.0, idx, PAD_ALIGN),
                           axis=1, keepdims=True)
            include = (alpha > 0.0) & (idx < cpos)
            new_carry = jnp.maximum(
                carry + jnp.sum(jnp.where(include, L, 0.0), axis=1,
                                keepdims=True), NEG_CAP)
            new_crossed = jnp.maximum(
                crossed, jnp.max(crossing, axis=1, keepdims=True))
            return sc + 1, new_carry, new_crossed

        state = (jnp.int32(0), jnp.zeros((p, 1), f32), jnp.zeros((p, 1), f32))
        sc_e, _, _ = jax.lax.while_loop(cond, body, state)

        # Early exit leaves the prefetched window un-awaited: drain it.
        @pl.when(sc_e < nsc)
        def _():
            window_dma(jax.lax.rem(sc_e, 2), w0, sc_e).wait()

        # Kept = every instance through the exit superchunk (clamped to the
        # tile's range). Exit-at-nsc (never fully crossed) keeps everything.
        kept = jnp.clip(w0 + sc_e * PAD_ALIGN - start, 0, end - start)
        out_ref[tile_id] = kept  # SMEM scalar store: no lane alignment
        return 0

    jax.lax.fori_loop(0, TILES_PER_PROG, tile_body, 0)


def satcount(pf_cm: jax.Array, raw_starts: jax.Array, grid: TileGrid
             ) -> jax.Array:
    """Per-tile kept counts for a (tile,depth)-sorted raw stream.

    pf_cm: [8, k] channel-major f32, rows 0..5 = (mx, my, conic a, b, c,
    opacity) in SORTED order (rows 6..7 ignored); raw_starts:
    [num_tiles + 1] (raw, unpadded ranges). Returns [num_tiles] int32.
    k must be a multiple of PAD_ALIGN. Runs in interpret mode off-TPU.
    """
    assert pf_cm.shape[1] % PAD_ALIGN == 0
    nty, njg = grid.nty, grid.ntx // TILES_PER_PROG
    kernel = functools.partial(
        _satcount_kernel, ntx=grid.ntx, tile_h=grid.tile_h,
        tile_w=grid.tile_w)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nty, njg),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[
                pltpu.VMEM((2, 8, PAD_ALIGN), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((grid.num_tiles,), jnp.int32),
        interpret=jax.default_backend() != "tpu",
    )(raw_starts, pf_cm)
    return out


def satcount_np(pf_cm, raw_starts, grid: TileGrid) -> np.ndarray:
    """Trusted python-loop oracle of the kernel semantics (tests only)."""
    pf = np.asarray(pf_cm, np.float32)
    starts = np.asarray(raw_starts)
    counts = np.zeros(grid.num_tiles, np.int32)
    for t in range(grid.num_tiles):
        s, e = int(starts[t]), int(starts[t + 1])
        counts[t] = e - s
        if e <= s:
            continue
        tx = (t % grid.ntx) * grid.tile_w
        ty = (t // grid.ntx) * grid.tile_h
        pxs, pys = np.meshgrid(np.arange(grid.tile_w), np.arange(grid.tile_h))
        px = (pxs.reshape(-1) + tx).astype(np.float32)
        py = (pys.reshape(-1) + ty).astype(np.float32)
        carry = np.zeros(px.shape[0], np.float32)
        crossed = np.zeros(px.shape[0], bool)
        w0 = (s // PAD_ALIGN) * PAD_ALIGN
        nsc = -(-(e - w0) // PAD_ALIGN)
        done_sc = nsc
        for sc in range(nsc):
            g0 = w0 + sc * PAD_ALIGN
            logT = carry.copy()
            first_cross = np.full(px.shape[0], PAD_ALIGN, np.int32)
            alphas = np.zeros((PAD_ALIGN, px.shape[0]), np.float32)
            for c in range(PAD_ALIGN):
                gi = g0 + c
                if gi < s or gi >= e:
                    continue
                mx, my, ca, cb, cc, op = pf[:6, gi]
                dx, dy = px - mx, py - my
                power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
                araw = op * np.exp(np.minimum(power, 0.0))
                valid = (power <= 0) & (araw >= ALPHA_MIN) & ~crossed
                alphas[c] = np.where(valid, np.minimum(araw, ALPHA_CLAMP), 0.0)
            # vector semantics: crossing from the unmasked trajectory
            L = np.log1p(-alphas)
            S = np.cumsum(L, axis=0) - L
            logT_m = np.maximum(carry[None, :] + S, NEG_CAP)
            T1 = np.exp(logT_m)
            crossing = (T1 * (1 - alphas) < T_EPS * SAFETY) & (alphas > 0)
            cpos = np.where(crossing.any(axis=0),
                            crossing.argmax(axis=0), PAD_ALIGN)
            include = (alphas > 0) & (np.arange(PAD_ALIGN)[:, None] < cpos)
            carry = np.maximum(
                carry + np.sum(np.where(include, L, 0.0), axis=0), NEG_CAP)
            crossed |= crossing.any(axis=0)
            if crossed.all():
                done_sc = sc + 1
                break
        kept = min(max(w0 + done_sc * PAD_ALIGN - s, 0), e - s)
        counts[t] = kept
    return counts
