"""Pallas TPU segment-sum: reduce K per-instance gradient rows onto
per-Gaussian rows (the reduction half of gather_expand's custom VJP,
rasterize.py).

The CUDA reference scatter-adds per-Gaussian gradients with atomics inside
its blend backward [inferred; SURVEY.md §2.3 item 1]. The TPU has no atomics;
round-2 used pure-XLA blocked cumsum + boundary gather + row diff (~14 ms at
the bench workload — the boundary gather of n rows from the [K, 24] cumsum
table is a latency-bound random-access path). This kernel replaces all of it
with ONE streaming pass:

  * Columns arrive in RAW (Gaussian-grouped) order: Gaussian g owns the
    contiguous column range [starts[g], ends[g]) — binning's expansion order.
  * Output-stationary grid: program p owns Gaussians [p*GB, (p+1)*GB) and
    streams exactly its own column span [starts[p*GB], ends[(p+1)*GB-1]) in
    RC-column chunks (double-buffered manual DMA — the spans are ragged, so
    BlockSpec pipelining cannot address them).
  * Per chunk, the membership matrix M[r, i] = 1{starts[i] <= abs_col(r) <
    ends[i]} is built from one iota + two compares against the block's
    starts/ends (each column belongs to exactly ONE segment, so over-reads
    from chunk alignment are masked for free), and the partial sums are one
    MXU contraction vals @ M — exact (M is 0/1; the f32 rows use HIGHEST
    matmul precision, the bf16-upcast rows are exact at the default).

The input is CHANNEL-MAJOR [C, K] f32 (C <= 24 here): instance axis on
lanes, so chunk DMAs slice 128-aligned lane ranges and each chunk needs
exactly one matmul per precision class — the row-major [K, 16]-int32 variant
needed 8 row-group slices x tiny 256-deep matmuls and was MXU-latency-bound
(11.8 ms vs this layout's target ~3 ms at the bench shape).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GB = 512          # Gaussians (segments) per output block
RC = 2048         # instance columns per DMA chunk
F32_ROWS_HI = 8   # leading rows reduced at HIGHEST matmul precision


def _kernel(bounds_ref, starts_ref, ends_ref, cols_hbm, out_ref,
            buf0, buf1, sems, *, k_cols: int, n_rows: int):
    # Two STATIC double-buffer refs (a stacked (2, ...) scratch indexed by a
    # runtime slot trips Mosaic's "slice minor dim must be 128-aligned").
    p = pl.program_id(0)
    r0 = bounds_ref[p]
    r1 = bounds_ref[p + 1]
    c0 = (r0 // 128) * 128                   # 128-aligned chunk origin
    nch = jnp.maximum((r1 - c0 + RC - 1) // RC, 0)

    def dma(slot, off, buf):
        off = pl.multiple_of(jnp.minimum(off, k_cols - RC), 128)
        return pltpu.make_async_copy(
            cols_hbm.at[:, pl.ds(off, RC)], buf, sems.at[slot])

    def dma_start(c):
        off = c0 + c * RC

        @pl.when(jax.lax.rem(c, 2) == 0)
        def _():
            dma(0, off, buf0).start()

        @pl.when(jax.lax.rem(c, 2) == 1)
        def _():
            dma(1, off, buf1).start()

    def dma_wait(c):
        off = c0 + c * RC

        @pl.when(jax.lax.rem(c, 2) == 0)
        def _():
            dma(0, off, buf0).wait()

        @pl.when(jax.lax.rem(c, 2) == 1)
        def _():
            dma(1, off, buf1).wait()

    @pl.when(nch > 0)
    def _():
        dma_start(0)

    starts = starts_ref[0]                   # [1, GB] int32
    ends = ends_ref[0]

    def body(c, acc):
        @pl.when(c + 1 < nch)
        def _():
            dma_start(c + 1)

        dma_wait(c)
        chunk = jnp.where(jax.lax.rem(c, 2) == 0,
                          buf0[...], buf1[...])   # [n_rows, RC] f32
        off = jnp.minimum(c0 + c * RC, k_cols - RC)
        abs_i = jax.lax.broadcasted_iota(jnp.int32, (RC, 1), 0) + off
        member = ((abs_i >= starts) & (abs_i < ends)).astype(jnp.float32)
        # f32 gradient rows need HIGHEST (3-pass bf16) matmul precision — the
        # default single pass truncates the VALUES to bf16. The upcast-bf16
        # rows are exact at the default (0/1 weights, bf16-representable
        # values).
        acc_f = jax.lax.dot_general(
            chunk[:F32_ROWS_HI], member, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        acc_a = jax.lax.dot_general(
            chunk[F32_ROWS_HI:], member, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc + jnp.concatenate([acc_f, acc_a], axis=0)

    acc = jax.lax.fori_loop(
        0, nch, body, jnp.zeros((n_rows, GB), jnp.float32))
    out_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def segment_reduce_cols(cols: jax.Array, starts: jax.Array,
                        ends: jax.Array, interpret: bool | None = None):
    """Sum raw-order columns into per-segment totals.

    cols:    [C, K] f32 channel-major — rows 0:8 reduced at HIGHEST matmul
             precision (put precision-critical channels first), the rest at
             the MXU default (exact for bf16-representable values).
    starts:  [NG] int32 — first raw column of each segment (monotone).
    ends:    [NG] int32 — exclusive end (monotone, <= K). Empty segments OK.
    Returns [C, NG] f32.

    NG must be a multiple of GB, K a multiple of 128 and >= RC (callers pad;
    padded segments must be empty, i.e. starts == ends == ends[-1]).
    """
    n_rows, k_cols = cols.shape
    ng = starts.shape[0]
    assert ng % GB == 0 and k_cols % 128 == 0 and k_cols >= RC
    n_blocks = ng // GB
    # Per-program column bounds: program p streams [bounds[p], bounds[p+1]).
    bounds = jnp.concatenate([starts[::GB], ends[-1:]])
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_kernel, k_cols=k_cols, n_rows=n_rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1, GB), lambda p, *_: (p, 0, 0)),  # starts
            pl.BlockSpec((1, 1, GB), lambda p, *_: (p, 0, 0)),  # ends
            pl.BlockSpec(memory_space=pl.ANY),             # cols (manual)
        ],
        out_specs=pl.BlockSpec((n_rows, GB), lambda p, *_: (0, p)),
        scratch_shapes=[
            pltpu.VMEM((n_rows, RC), jnp.float32),
            pltpu.VMEM((n_rows, RC), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, ng), jnp.float32),
        interpret=interpret,
    )(bounds, starts.reshape(n_blocks, 1, GB), ends.reshape(n_blocks, 1, GB),
      cols)
