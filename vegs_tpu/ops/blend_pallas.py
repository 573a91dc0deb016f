"""Pallas TPU kernels for tile-based alpha compositing (forward + backward).

TPU-native replacement for the CUDA per-tile blend kernels (SURVEY.md §2.3
item 1): instead of one thread per pixel walking Gaussians with shared-memory
staging and atomics, each grid program owns a (16, 128) pixel block (= 8
adjacent 16x16 tiles) and walks each tile's depth-sorted instance list in
512-instance SUPERCHUNKS, double-buffered HBM→VMEM DMA hiding the copy behind
compute, processing fixed-size instance chunks (production default 256, set
by RasterizeConfig.blend_chunk; the kernel-level CHUNK=128 default only
applies to direct blend() callers) whose math is all MXU matmuls:

  * the quadratic splat exponent is a [P,6]x[6,M] contraction against pixel
    monomials (1, x, y, x^2, y^2, xy) in tile-local coordinates,
  * the sequential front-to-back transmittance recurrence becomes a prefix
    sum of log(1 - alpha) over the chunk via a triangular-matrix matmul
    (T_i = exp(carry + cumsum_excl L)), with a per-pixel scalar carry across
    chunks,
  * channel accumulation is a [P,M]x[M,11] matmul.

The payload arrives as TWO channel-major arrays (rasterize.py round-2 mixed
precision rework): `payload_f32 [8, K]` (mx, my, conic a/b/c, opacity, depth)
and `payload_aux [16, K]` (rgb, quat, scale) in bf16 or f32 — 64 B/instance
of DMA instead of 96, both slices aligned to their dtype's native tiling.

The CUDA early-exit (stop when T < 1e-4) is reproduced exactly with ONE
prefix pass: the unmasked trajectory locates each pixel's first crossing,
and since every surviving instance precedes that crossing, the same
trajectory is already exact on the inclusion set — exclusion is an iota
compare against the row-min crossing position and the cross-chunk log-T
carry is a row sum (see the derivation comment in _chunk_common; an earlier
literal second prefix pass was removed as algebraically redundant). Whole
superchunks ARE skipped once every pixel in the tile has crossed
(lax.while_loop with DMA drain).

The backward pass needs no atomics: binning's superchunk-aligned layout gives
every 512-instance superchunk to exactly one tile, so per-instance gradients
are written to disjoint HBM slices (double-buffered write DMA); the custom
VJP of the payload gather (rasterize.gather_expand) reduces instance grads
onto Gaussians with a presorted segment reduction. The suffix sums of the
compositing backward are rewritten as (global - inclusive prefix), and the
per-pixel global G = sum_i w_i dw_i is algebraically the dot of the forward
OUTPUT with its cotangent (G = sum_c dout_c * out_c), so the backward is a
SINGLE forward-walking sweep seeded from the forward result carried as a
residual — no reverse traversal, no stored trajectories, no G-sweep.

Semantics match vegs_tpu.ops.blend_ref exactly (the golden spec).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import PAD_ALIGN, TileGrid
from .blend_ref import ALPHA_CLAMP, ALPHA_MIN, N_ACCUM, OUT_CHANNELS, T_EPS

CHUNK = 128                    # default instances per compute chunk
F32_ROWS = 8                   # payload_f32 rows
AUX_ROWS = 16                  # payload_aux rows
TILES_PER_PROG = 8             # 8 adjacent 16x16 tiles = one (16,128) block
NEG_CAP = -80.0                # clamp for log-transmittance


def _tri(strict: bool, chunk: int = CHUNK,
         dtype=jnp.float32) -> jax.Array:
    """[chunk, chunk] f32: M[j, i] = 1 where j < i (strict) or j <= i.
    Used as X @ M to compute prefix sums over the instance axis."""
    j = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    i = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return ((j < i) if strict else (j <= i)).astype(dtype)


def _pixel_monomials(tile_h: int, tile_w: int) -> jax.Array:
    """[P, 6] tile-local pixel monomials (1, x, y, x^2, y^2, xy)."""
    p = jax.lax.broadcasted_iota(jnp.int32, (tile_h * tile_w, 1), 0)
    y = (p // tile_w).astype(jnp.float32)
    x = (p % tile_w).astype(jnp.float32)
    one = jnp.ones_like(x)
    return jnp.concatenate([one, x, y, x * x, y * y, x * y], axis=1)


def _chan_matrix(cf, aux):
    """[11, C] accumulation channels (rgb, depth, quat, scale) from the f32
    chunk (depth = row 6) and upcast aux chunk (rgb rows 0-2, quat 3-6,
    scale 7-9), in the blend_ref payload-row order 6..16."""
    a = aux.astype(jnp.float32)
    return jnp.concatenate([a[0:3], cf[6:7], a[3:10]], axis=0)


def _chunk_common(cf, ox, oy, mono, carry_logT, carry_crossed,
                  inc_ref, ti_ref, ainc_ref):
    """Shared fwd/bwd per-chunk compute (see module docstring).

    cf: [F32_ROWS, CHUNK] payload rows; mono: [P, 6]; carries: [P, 1].
    Pixel-major ([P, CHUNK]) keeps the instance axis on VPU lanes.

    The early-exit (T < 1e-4) semantics cost ONE triangular-prefix matmul:
    the unmasked trajectory locates each pixel's first crossing and is
    already exact on the inclusion set (see the derivation comment below).
    Results (include, Ti, alpha_inc) are staged through the scratch refs
    for the callers.
    """
    f32 = jnp.float32
    mx = cf[0:1, :] - ox            # [1, C] tile-local
    my = cf[1:2, :] - oy
    ca = cf[2:3, :]
    cb = cf[3:4, :]
    cc = cf[4:5, :]
    op = cf[5:6, :]

    chunk = cf.shape[1]
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
    )  # [6, C]
    power = jax.lax.dot_general(
        mono, q, (((1,), (0,)), ((), ())), preferred_element_type=f32
    )  # [P, C]

    # Clamp the exponent BEFORE exp: invalid instances (power > 0, excluded
    # by `valid` below) can overflow exp to inf, and inf * their zero
    # gradient mask = NaN in the backward — which then poisons every
    # Gaussian downstream of them through the segment-reduce cumsum.
    expp = jnp.exp(jnp.minimum(power, 0.0))
    alpha_raw = op * expp
    notclamped = alpha_raw < ALPHA_CLAMP
    valid = (power <= 0.0) & (alpha_raw >= ALPHA_MIN) & (carry_crossed == 0.0)
    alpha = jnp.where(valid, jnp.minimum(alpha_raw, ALPHA_CLAMP), 0.0)

    tril_s = _tri(strict=True, chunk=chunk)

    # Pass 1: unmasked trajectory locates the first crossing per pixel.
    L = jnp.log1p(-alpha)
    S = jax.lax.dot_general(L, tril_s, (((1,), (0,)), ((), ())),
                            preferred_element_type=f32)
    logT = jnp.maximum(carry_logT + S, NEG_CAP)
    T1 = jnp.exp(logT)
    crossing = ((T1 * (1.0 - alpha) < T_EPS) & (alpha > 0.0)).astype(f32)

    # The early-exit "pass 2" is ALGEBRAIC, not a second prefix: every
    # included instance sits strictly BEFORE its pixel's first crossing, and
    # no exclusion can precede the first crossing, so the pass-1 trajectory
    # T1 is already exact on the inclusion set. Inclusion reduces to an iota
    # compare against the row-min crossing position, and the next chunk's
    # log-T carry is a row SUM of the included log terms. (This replaced an
    # earlier literal second pass — a bf16 strict-prefix matmul of `crossing`
    # plus a second f32 triangular prefix — removing ~2/3 of the forward's
    # MXU FLOPs with bit-identical semantics. Excluded positions get a stale
    # T1, which is harmless: every consumer multiplies by alpha_inc or
    # include, both zero there.)
    idx = jax.lax.broadcasted_iota(jnp.int32, alpha.shape, 1)
    cpos = jnp.min(jnp.where(crossing > 0.0, idx, chunk), axis=1,
                   keepdims=True)
    include = (alpha > 0.0) & (idx < cpos)
    alpha_inc = jnp.where(include, alpha, 0.0)
    inc_ref[:] = include.astype(f32)
    ti_ref[:] = T1
    ainc_ref[:] = alpha_inc

    new_logT = jnp.maximum(
        carry_logT + jnp.sum(jnp.where(include, L, 0.0), axis=1,
                             keepdims=True), NEG_CAP)
    new_crossed = jnp.maximum(
        carry_crossed, jnp.max(crossing, axis=1, keepdims=True))
    geom = (mx, my, ca, cb, cc, op)
    return expp, notclamped, new_logT, new_crossed, geom


def _payload_dmas(pf_hbm, pa_hbm, buf_f, buf_a, sems, slot, start, sc):
    off = pl.multiple_of(start + sc * PAD_ALIGN, PAD_ALIGN)
    cf = pltpu.make_async_copy(
        pf_hbm.at[:, pl.ds(off, PAD_ALIGN)], buf_f.at[slot], sems.at[slot, 0])
    ca = pltpu.make_async_copy(
        pa_hbm.at[:, pl.ds(off, PAD_ALIGN)], buf_a.at[slot], sems.at[slot, 1])
    return cf, ca


def _start_payload(pf_hbm, pa_hbm, buf_f, buf_a, sems, slot, start, sc):
    cf, ca = _payload_dmas(pf_hbm, pa_hbm, buf_f, buf_a, sems, slot, start, sc)
    cf.start()
    ca.start()


def _wait_payload(pf_hbm, pa_hbm, buf_f, buf_a, sems, slot, start, sc):
    cf, ca = _payload_dmas(pf_hbm, pa_hbm, buf_f, buf_a, sems, slot, start, sc)
    cf.wait()
    ca.wait()


def _fwd_kernel(starts_ref, pf_hbm, pa_hbm, out_ref, buf_f, buf_a,
                acc_scratch, inc_ref, ti_ref, ainc_ref, sems,
                *, ntx: int, tile_h: int, tile_w: int, chunk: int = CHUNK):
    super_ = PAD_ALIGN // chunk
    i = pl.program_id(0)
    j = pl.program_id(1)
    p = tile_h * tile_w
    mono = _pixel_monomials(tile_h, tile_w)

    def tile_body(jt, _):
        tile_id = i * ntx + j * TILES_PER_PROG + jt
        start = starts_ref[tile_id]
        end = starts_ref[tile_id + 1]
        nsc = (end - start) // PAD_ALIGN
        ox = ((j * TILES_PER_PROG + jt) * tile_w).astype(jnp.float32)
        oy = (i * tile_h).astype(jnp.float32)

        @pl.when(nsc > 0)
        def _():
            _start_payload(pf_hbm, pa_hbm, buf_f, buf_a, sems, 0, start, 0)

        def cond(state):
            sc, acc, logT, crossed = state
            return (sc < nsc) & (jnp.min(crossed) < 1.0)

        def body(state):
            sc, acc, logT, crossed = state
            slot = jax.lax.rem(sc, 2)

            @pl.when(sc + 1 < nsc)
            def _():
                _start_payload(pf_hbm, pa_hbm, buf_f, buf_a, sems,
                               jax.lax.rem(sc + 1, 2), start, sc + 1)

            _wait_payload(pf_hbm, pa_hbm, buf_f, buf_a, sems, slot, start, sc)
            for s in range(super_):
                cf = buf_f[slot, :, s * chunk:(s + 1) * chunk]
                aux = buf_a[slot, :, s * chunk:(s + 1) * chunk]
                _, _, logT, crossed, _ = _chunk_common(
                    cf, ox, oy, mono, logT, crossed, inc_ref, ti_ref, ainc_ref)
                w = ainc_ref[:] * ti_ref[:]  # [P, C]
                chan = _chan_matrix(cf, aux)  # [11, C]
                acc = acc + jax.lax.dot_general(
                    w, chan, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            return sc + 1, acc, logT, crossed

        state = (
            jnp.int32(0),
            jnp.zeros((p, N_ACCUM), jnp.float32),
            jnp.zeros((p, 1), jnp.float32),
            jnp.zeros((p, 1), jnp.float32),
        )
        sc_e, acc, logT, _ = jax.lax.while_loop(cond, body, state)

        # Early exit leaves the prefetched superchunk un-awaited: drain it.
        @pl.when(sc_e < nsc)
        def _():
            _wait_payload(pf_hbm, pa_hbm, buf_f, buf_a, sems,
                          jax.lax.rem(sc_e, 2), start, sc_e)

        # Dynamic-lane stores are not provably 128-aligned; stage per-tile
        # results in scratch (leading-dim dynamic index is fine) and copy out
        # with static offsets after the loop.
        acc_scratch[jt] = jnp.concatenate([acc, jnp.exp(logT)], axis=1)
        return 0

    jax.lax.fori_loop(0, TILES_PER_PROG, tile_body, 0)
    for jt in range(TILES_PER_PROG):
        block = acc_scratch[jt].reshape(tile_h, tile_w, OUT_CHANNELS)
        out_ref[:, :, jt * tile_w:(jt + 1) * tile_w] = jnp.transpose(block, (2, 0, 1))


def _bwd_kernel(starts_ref, pf_hbm, pa_hbm, dout_ref, out_ref, dpf_hbm,
                dpa_hbm, buf_f, buf_a, dgrad_f, dgrad_a, dpix_scratch,
                tail_scratch, inc_ref, ti_ref, ainc_ref, sems, wr_sems,
                *, ntx: int, tile_h: int, tile_w: int, chunk: int = CHUNK):
    super_ = PAD_ALIGN // chunk
    i = pl.program_id(0)
    j = pl.program_id(1)
    p = tile_h * tile_w
    f32 = jnp.float32
    mono = _pixel_monomials(tile_h, tile_w)
    tri_full = _tri(strict=False, chunk=chunk)

    # Pre-stage per-tile cotangents pixel-major (static lane offsets here;
    # inside tile_body only the leading dim is dynamically indexed), plus the
    # per-pixel suffix total `tail`.  The former sweep A computed
    # G = sum_i w_i dw_i by replaying every chunk; but
    # G[p] = sum_i w_i (dout . chan_i) = dout . (sum_i w_i chan_i)
    #      = sum_c dout[p, c] * out[p, c] over the accumulation channels,
    # and the final-transmittance term T_fin * dT_fin is channel N_ACCUM of
    # the same dot — so `tail` is one elementwise dot of the forward OUTPUT
    # with its cotangent, and the whole first sweep is unnecessary.
    for jt_s in range(TILES_PER_PROG):
        dblock = dout_ref[:, :, jt_s * tile_w:(jt_s + 1) * tile_w]
        dpix = jnp.transpose(dblock, (1, 2, 0)).reshape(p, OUT_CHANNELS)
        dpix_scratch[jt_s] = dpix
        oblock = out_ref[:, :, jt_s * tile_w:(jt_s + 1) * tile_w]
        opix = jnp.transpose(oblock, (1, 2, 0)).reshape(p, OUT_CHANNELS)
        tail_scratch[jt_s] = jnp.sum(dpix * opix, axis=1, keepdims=True)

    def grad_write_dmas(slot, start, sc):
        off = pl.multiple_of(start + sc * PAD_ALIGN, PAD_ALIGN)
        wf = pltpu.make_async_copy(
            dgrad_f.at[slot], dpf_hbm.at[:, pl.ds(off, PAD_ALIGN)],
            wr_sems.at[slot, 0])
        wa = pltpu.make_async_copy(
            dgrad_a.at[slot], dpa_hbm.at[:, pl.ds(off, PAD_ALIGN)],
            wr_sems.at[slot, 1])
        return wf, wa

    def tile_body(jt, _):
        tile_id = i * ntx + j * TILES_PER_PROG + jt
        start = starts_ref[tile_id]
        end = starts_ref[tile_id + 1]
        nsc = (end - start) // PAD_ALIGN
        ox = ((j * TILES_PER_PROG + jt) * tile_w).astype(f32)
        oy = (i * tile_h).astype(f32)

        dpix = dpix_scratch[jt]               # [P, 12]
        dout_acc = dpix[:, :N_ACCUM]
        tail = tail_scratch[jt]               # [P, 1]

        # ---- Single sweep: per-instance gradients -------------------------
        @pl.when(nsc > 0)
        def _():
            _start_payload(pf_hbm, pa_hbm, buf_f, buf_a, sems, 0, start, 0)

        def condB(state):
            sc, cum, logT, crossed = state
            return (sc < nsc) & (jnp.min(crossed) < 1.0)

        def bodyB(state):
            sc, cum, logT, crossed = state
            slot = jax.lax.rem(sc, 2)

            @pl.when(sc + 1 < nsc)
            def _():
                _start_payload(pf_hbm, pa_hbm, buf_f, buf_a, sems,
                               jax.lax.rem(sc + 1, 2), start, sc + 1)

            _wait_payload(pf_hbm, pa_hbm, buf_f, buf_a, sems, slot, start, sc)

            # The write buffers for this slot may still be in flight from two
            # superchunks ago: wait before overwriting.
            @pl.when(sc >= 2)
            def _():
                wf, wa = grad_write_dmas(slot, start, sc - 2)
                wf.wait()
                wa.wait()

            for s in range(super_):
                cf = buf_f[slot, :, s * chunk:(s + 1) * chunk]
                aux = buf_a[slot, :, s * chunk:(s + 1) * chunk]
                expp, notclamped, logT, crossed, geom = _chunk_common(
                    cf, ox, oy, mono, logT, crossed,
                    inc_ref, ti_ref, ainc_ref)
                mx, my, ca, cb, cc, op = geom
                inc_f = inc_ref[:]
                Ti = ti_ref[:]
                alpha_inc = ainc_ref[:]
                w = alpha_inc * Ti
                chan = _chan_matrix(cf, aux)
                dw = jax.lax.dot_general(
                    dout_acc, chan, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
                wdw = w * dw
                cum_incl = cum + jax.lax.dot_general(
                    wdw, tri_full, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
                dL = tail - cum_incl
                dalpha = (Ti * dw - dL / (1.0 - alpha_inc)) * inc_f
                ncl = notclamped.astype(f32) * inc_f
                dpower = dalpha * alpha_inc * ncl
                dop_col = dalpha * expp * ncl

                dq = jax.lax.dot_general(
                    mono, dpower, (((0,), (0,)), ((), ())),
                    preferred_element_type=f32)  # [6, C]
                dq1, dqx, dqy = dq[0:1], dq[1:2], dq[2:3]
                dqxx, dqyy, dqxy = dq[3:4], dq[4:5], dq[5:6]
                dmx = dq1 * (-ca * mx - cb * my) + dqx * ca + dqy * cb
                dmy = dq1 * (-cc * my - cb * mx) + dqx * cb + dqy * cc
                dca = dq1 * (-0.5 * mx * mx) + dqx * mx - 0.5 * dqxx
                dcb = dq1 * (-mx * my) + dqx * my + dqy * mx - dqxy
                dcc = dq1 * (-0.5 * my * my) + dqy * my - 0.5 * dqyy
                dop = jax.lax.dot_general(
                    jnp.ones((1, p), f32), dop_col, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
                dchan = jax.lax.dot_general(
                    dout_acc, w, (((0,), (0,)), ((), ())),
                    preferred_element_type=f32)  # [11, C]

                # Split per-instance grads back into the two payload layouts:
                # f32 (dmx, dmy, dconic, dop, ddepth) / aux (drgb, dquat, dscale).
                dgrad_f[slot, :, s * chunk:(s + 1) * chunk] = jnp.concatenate(
                    [dmx, dmy, dca, dcb, dcc, dop, dchan[3:4],
                     jnp.zeros((1, chunk), f32)], axis=0)
                dgrad_a[slot, :, s * chunk:(s + 1) * chunk] = jnp.concatenate(
                    [dchan[0:3], dchan[4:11],
                     jnp.zeros((AUX_ROWS - 10, chunk), f32)],
                    axis=0).astype(dgrad_a.dtype)
                cum = cum + jnp.sum(wdw, axis=1, keepdims=True)

            wf, wa = grad_write_dmas(slot, start, sc)
            wf.start()
            wa.start()
            return sc + 1, cum, logT, crossed

        sc_stop, _, _, _ = jax.lax.while_loop(
            condB, bodyB,
            (jnp.int32(0), jnp.zeros((p, 1), f32), jnp.zeros((p, 1), f32),
             jnp.zeros((p, 1), f32)))

        # Early exit leaves the prefetched payload superchunk un-awaited:
        # drain it (an un-awaited DMA wedges the device on a later call).
        @pl.when(sc_stop < nsc)
        def _():
            _wait_payload(pf_hbm, pa_hbm, buf_f, buf_a, sems,
                          jax.lax.rem(sc_stop, 2), start, sc_stop)

        # Drain outstanding gradient writes.
        @pl.when(sc_stop >= 2)
        def _():
            wf, wa = grad_write_dmas(jax.lax.rem(sc_stop - 2, 2), start, sc_stop - 2)
            wf.wait()
            wa.wait()

        @pl.when(sc_stop >= 1)
        def _():
            wf, wa = grad_write_dmas(jax.lax.rem(sc_stop - 1, 2), start, sc_stop - 1)
            wf.wait()
            wa.wait()

        # Superchunks beyond sc_stop (all pixels crossed early) still hold real
        # instances that need zero gradients written.
        def bodyZ(sc, _):
            slot = jax.lax.rem(sc, 2)
            dgrad_f[slot] = jnp.zeros((F32_ROWS, PAD_ALIGN), f32)
            dgrad_a[slot] = jnp.zeros((AUX_ROWS, PAD_ALIGN), dgrad_a.dtype)
            wf, wa = grad_write_dmas(slot, start, sc)
            wf.start()
            wa.start()
            wf.wait()
            wa.wait()
            return 0

        jax.lax.fori_loop(sc_stop, nsc, bodyZ, 0)
        return 0

    jax.lax.fori_loop(0, TILES_PER_PROG, tile_body, 0)


def _grid_dims(grid: TileGrid):
    assert grid.ntx % TILES_PER_PROG == 0
    return grid.nty, grid.ntx // TILES_PER_PROG


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _blend_fwd_impl(payload_f32, payload_aux, tile_starts, grid: TileGrid,
                    hp: int, wp: int, chunk: int = CHUNK):
    nty, njg = _grid_dims(grid)
    aux_dtype = payload_aux.dtype
    kernel = functools.partial(
        _fwd_kernel, ntx=grid.ntx, tile_h=grid.tile_h, tile_w=grid.tile_w,
        chunk=chunk)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nty, njg),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (OUT_CHANNELS, grid.tile_h, TILES_PER_PROG * grid.tile_w),
                lambda i, j, *refs: (0, i, j),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, F32_ROWS, PAD_ALIGN), jnp.float32),
                pltpu.VMEM((2, AUX_ROWS, PAD_ALIGN), aux_dtype),
                pltpu.VMEM(
                    (TILES_PER_PROG, grid.tile_h * grid.tile_w, OUT_CHANNELS),
                    jnp.float32),
                pltpu.VMEM((grid.tile_h * grid.tile_w, chunk), jnp.float32),
                pltpu.VMEM((grid.tile_h * grid.tile_w, chunk), jnp.float32),
                pltpu.VMEM((grid.tile_h * grid.tile_w, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((OUT_CHANNELS, hp, wp), jnp.float32),
        interpret=_use_interpret(),
    )(tile_starts, payload_f32, payload_aux)


def _blend_bwd_impl(payload_f32, payload_aux, tile_starts, out, dout,
                    grid: TileGrid, chunk: int = CHUNK):
    nty, njg = _grid_dims(grid)
    k_cap = payload_f32.shape[1]
    aux_dtype = payload_aux.dtype
    p = grid.tile_h * grid.tile_w
    kernel = functools.partial(
        _bwd_kernel, ntx=grid.ntx, tile_h=grid.tile_h, tile_w=grid.tile_w,
        chunk=chunk)
    pix_spec = pl.BlockSpec(
        (OUT_CHANNELS, grid.tile_h, TILES_PER_PROG * grid.tile_w),
        lambda i, j, *refs: (0, i, j),
        memory_space=pltpu.VMEM,
    )
    dpf, dpa = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nty, njg),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # payload f32
                pl.BlockSpec(memory_space=pl.ANY),  # payload aux
                pix_spec,                           # dout
                pix_spec,                           # out (forward result)
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, F32_ROWS, PAD_ALIGN), jnp.float32),
                pltpu.VMEM((2, AUX_ROWS, PAD_ALIGN), aux_dtype),
                pltpu.VMEM((2, F32_ROWS, PAD_ALIGN), jnp.float32),
                pltpu.VMEM((2, AUX_ROWS, PAD_ALIGN), aux_dtype),
                pltpu.VMEM((TILES_PER_PROG, p, OUT_CHANNELS), jnp.float32),
                pltpu.VMEM((TILES_PER_PROG, p, 1), jnp.float32),
                pltpu.VMEM((p, chunk), jnp.float32),
                pltpu.VMEM((p, chunk), jnp.float32),
                pltpu.VMEM((p, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((F32_ROWS, k_cap), jnp.float32),
            jax.ShapeDtypeStruct((AUX_ROWS, k_cap), aux_dtype),
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_use_interpret(),
    )(tile_starts, payload_f32, payload_aux, dout, out)
    # Slots past the last tile boundary were never written by any program —
    # zero them (their gidx is the dummy column anyway, but keep them clean).
    k = jnp.arange(k_cap, dtype=jnp.int32)
    live = k[None, :] < tile_starts[-1]
    return (jnp.where(live, dpf, 0.0),
            jnp.where(live, dpa, jnp.zeros((), aux_dtype)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _blend_cv(payload_f32, payload_aux, tile_starts, grid: TileGrid,
              hp: int, wp: int, chunk: int):
    return _blend_fwd_impl(payload_f32, payload_aux, tile_starts, grid,
                           hp, wp, chunk)


def _blend_vjp_fwd(payload_f32, payload_aux, tile_starts, grid, hp, wp,
                   chunk):
    out = _blend_fwd_impl(payload_f32, payload_aux, tile_starts, grid,
                          hp, wp, chunk)
    # The forward output is a residual: tail[p] = sum_c dout[p,c]*out[p,c]
    # replaces the backward's former whole first sweep (see _bwd_kernel).
    return out, (payload_f32, payload_aux, tile_starts, out)


def _blend_vjp_bwd(grid, hp, wp, chunk, residuals, dout):
    payload_f32, payload_aux, tile_starts, out = residuals
    dpf, dpa = _blend_bwd_impl(
        payload_f32, payload_aux, tile_starts, out, dout, grid, chunk)
    return dpf, dpa, None


_blend_cv.defvjp(_blend_vjp_fwd, _blend_vjp_bwd)


def blend(payload_f32, payload_aux, tile_starts, grid: TileGrid,
          hp: int, wp: int, chunk: int = CHUNK):
    """Composite sorted instances into a [12, hp, wp] image (spec: blend_ref).

    `chunk` (128 or 256; must divide binning.PAD_ALIGN) sets the per-compute-
    chunk instance count: larger chunks halve while-loop iterations but
    double the triangular-prefix MXU FLOPs."""
    assert PAD_ALIGN % chunk == 0
    return _blend_cv(payload_f32, payload_aux, tile_starts, grid, hp, wp,
                     chunk)
