"""Round-2 microbenchmarks: candidate replacements for the XLA glue that
dominates the rasterization step (NOTES_PERF.md roadmap items 1-4).

Methodology: in-jit fori_loop with a genuine data dependency, differencing a
1-iter run against a (1+K)-iter run to cancel the ~40ms tunnel dispatch cost
(block_until_ready does not truly sync through the axon tunnel).

Run: python perf/micro_r02.py [name ...]
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(name, make_fn, iters=8):
    """make_fn() -> (step, args) where step(args, acc) -> (args', scalar)."""
    step, args = make_fn()

    @functools.partial(jax.jit, static_argnums=(1,))
    def loop(args, n):
        def body(i, carry):
            args, acc = carry
            a2, s = step(args, acc)
            return a2, acc + s * 1e-20
        return jax.lax.fori_loop(0, n, body, (args, 0.0))[1]

    float(loop(args, 1))
    t0 = time.time(); float(loop(args, 1)); t1 = time.time()
    float(loop(args, 1 + iters))
    t2 = time.time(); float(loop(args, 1 + iters)); t3 = time.time()
    ms = ((t3 - t2) - (t1 - t0)) / iters * 1e3
    print(f"{name:55s} {ms:9.2f} ms")
    return ms


K = 1 << 21         # instance count (matches bench workload @ k_cap 2M)
N = 500_000         # gaussian count
C = 24              # padded payload columns

rng = np.random.default_rng(0)
PERM = jnp.asarray(rng.permutation(K).astype(np.int32))
GIDX = jnp.asarray(np.sort(rng.integers(0, N, K)).astype(np.int32))  # sorted
GIDX_RAND = jnp.asarray(rng.integers(0, N, K).astype(np.int32))
ROWS_K = jnp.asarray(rng.standard_normal((K, C), dtype=np.float32))
ROWS_N = jnp.asarray(rng.standard_normal((N, C), dtype=np.float32))


def dep(x, acc):
    """Perturb x by acc so the loop has a data dependency."""
    return x + jnp.sin(acc) * 1e-20


# ---------------------------------------------------------------- gathers
def g_row8x3_2m():
    def step(args, acc):
        rows, idx = args
        out = jnp.concatenate(
            [rows[:, i*8:(i+1)*8][idx] for i in range(3)], axis=1)
        return (dep(rows, acc), idx), jnp.sum(out[0])
    return step, (ROWS_K, PERM)


def g_row24_2m():
    def step(args, acc):
        rows, idx = args
        return (dep(rows, acc), idx), jnp.sum(rows[idx][0])
    return step, (ROWS_K, PERM)


def g_row16_bf16_2m():
    rows = ROWS_K[:, :16].astype(jnp.bfloat16)
    def step(args, acc):
        rows, idx = args
        out = rows[idx]
        return (dep(rows, acc.astype(jnp.bfloat16)), idx), jnp.sum(out[0]).astype(jnp.float32)
    return step, (rows, PERM)


def g_row8_bf16x2_2m():
    rows = ROWS_K[:, :16].astype(jnp.bfloat16)
    def step(args, acc):
        rows, idx = args
        out = jnp.concatenate([rows[:, :8][idx], rows[:, 8:][idx]], axis=1)
        return (dep(rows, acc.astype(jnp.bfloat16)), idx), jnp.sum(out[0]).astype(jnp.float32)
    return step, (rows, PERM)


def g_from_small_table():
    # forward payload expansion: K gathers from an N-row table
    def step(args, acc):
        rows, idx = args
        out = jnp.concatenate(
            [rows[:, i*8:(i+1)*8][idx] for i in range(3)], axis=1)
        return (dep(rows, acc), idx), jnp.sum(out[0])
    return step, (ROWS_N, GIDX_RAND)


def g_from_small_table_sorted_idx():
    def step(args, acc):
        rows, idx = args
        out = jnp.concatenate(
            [rows[:, i*8:(i+1)*8][idx] for i in range(3)], axis=1)
        return (dep(rows, acc), idx), jnp.sum(out[0])
    return step, (ROWS_N, GIDX)


def g_take_axis0():
    def step(args, acc):
        rows, idx = args
        return (dep(rows, acc), idx), jnp.sum(jnp.take(rows, idx, axis=0)[0])
    return step, (ROWS_K, PERM)


# ------------------------------------------------------------- reductions
def r_current_segment_reduce():
    """The full current _gpr_bwd path at 2M (sort + gather + cumsum + ...)."""
    def step(args, acc):
        g, gidx = args
        k = g.shape[0]
        order = jnp.arange(k, dtype=jnp.int32)
        gidx_s, order_s = jax.lax.sort((gidx, order), num_keys=1)
        g_sorted = jnp.concatenate(
            [g[:, i*8:(i+1)*8][order_s] for i in range(3)], axis=1)
        block = 512
        x = g_sorted.reshape(k // block, block, C)
        inner = jnp.cumsum(x, axis=1)
        tot = inner[:, -1]
        prefix = jnp.cumsum(tot, axis=0) - tot
        cum = (inner + prefix[:, None, :]).reshape(k, C)
        cum = jnp.concatenate([jnp.zeros((1, C), cum.dtype), cum], axis=0)
        ends = jnp.searchsorted(gidx_s, jnp.arange(N, dtype=jnp.int32),
                                side="right", method="sort").astype(jnp.int32)
        starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), ends[:-1]])
        ga = lambda t, i: jnp.concatenate(
            [t[:, j*8:(j+1)*8][i] for j in range(3)], axis=1)
        d = ga(cum, ends) - ga(cum, starts)
        return (dep(g, acc), gidx), jnp.sum(d[0])
    return step, (ROWS_K, GIDX_RAND)


def r_presorted_segment_reduce():
    """Same but ids pre-sorted (order precomputed forward-side): no sort, no
    permutation gather, no searchsorted — cumsum + boundary gathers only."""
    ends0 = jnp.searchsorted(GIDX, jnp.arange(N, dtype=jnp.int32),
                             side="right").astype(jnp.int32)
    def step(args, acc):
        g_sorted, ends = args
        k = g_sorted.shape[0]
        block = 512
        x = g_sorted.reshape(k // block, block, C)
        inner = jnp.cumsum(x, axis=1)
        tot = inner[:, -1]
        prefix = jnp.cumsum(tot, axis=0) - tot
        cum = (inner + prefix[:, None, :]).reshape(k, C)
        cum = jnp.concatenate([jnp.zeros((1, C), cum.dtype), cum], axis=0)
        starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), ends[:-1]])
        ga = lambda t, i: jnp.concatenate(
            [t[:, j*8:(j+1)*8][i] for j in range(3)], axis=1)
        d = ga(cum, ends) - ga(cum, starts)
        return (dep(g_sorted, acc), ends), jnp.sum(d[0])
    return step, (ROWS_K, ends0)


def r_jax_segment_sum_sorted():
    def step(args, acc):
        g, gidx = args
        d = jax.ops.segment_sum(g, gidx, num_segments=N,
                                indices_are_sorted=True)
        return (dep(g, acc), gidx), jnp.sum(d[0])
    return step, (ROWS_K, GIDX)


def s_sort_pairs_2m():
    def step(args, acc):
        keys, vals = args
        ks, vs = jax.lax.sort((keys, vals), num_keys=1)
        return (dep_i(keys, acc), vals), jnp.sum(ks[:1] + vs[:1]).astype(jnp.float32)
    return step, (GIDX_RAND, PERM)


def dep_i(x, acc):
    return x + (acc * 1e-20).astype(x.dtype)


def sc_unique_scatter():
    """Scatter rows at N unique positions into a K-row zero table."""
    pos = jnp.asarray(np.sort(rng.choice(K, N, replace=False)).astype(np.int32))
    def step(args, acc):
        rows, pos = args
        z = jnp.zeros((K, C), jnp.float32)
        out = z.at[pos].set(rows, mode="drop", unique_indices=True,
                            indices_are_sorted=True)
        return (dep(rows, acc), pos), jnp.sum(out[0])
    return step, (ROWS_N, pos)


def g_row4_int32_2m():
    rows = jnp.asarray(rng.integers(0, 1 << 20, (K, 4)).astype(np.int32))
    def step(args, acc):
        rows, idx = args
        out = rows[idx]
        return (dep_i(rows, acc), idx), jnp.sum(out[0]).astype(jnp.float32)
    return step, (rows, PERM)


def g_mixed_f8_bf16_2m():
    """Candidate production gather: f32 row-8 + bf16 row-16 of the same rows."""
    rows_f = ROWS_K[:, :8]
    rows_b = ROWS_K[:, 8:].astype(jnp.bfloat16)
    def step(args, acc):
        rf, rb, idx = args
        a = rf[idx]
        b = rb[idx]
        return (dep(rf, acc), rb, idx), jnp.sum(a[0]) + jnp.sum(b[0]).astype(jnp.float32)
    return step, (rows_f, rows_b, PERM)


ALL = {
    "gather_row8x3_f32_2M_perm": g_row8x3_2m,
    "gather_row24_f32_2M_perm": g_row24_2m,
    "gather_row16_bf16_2M_perm": g_row16_bf16_2m,
    "gather_row8x2_bf16_2M_perm": g_row8_bf16x2_2m,
    "gather_row8x3_f32_2M_from_500k": g_from_small_table,
    "gather_row8x3_f32_2M_from_500k_sortedidx": g_from_small_table_sorted_idx,
    "take_axis0_row24_2M": g_take_axis0,
    "segment_reduce_current_full": r_current_segment_reduce,
    "segment_reduce_presorted": r_presorted_segment_reduce,
    "jax_segment_sum_sorted": r_jax_segment_sum_sorted,
    "sort_int32_pairs_2M": s_sort_pairs_2m,
    "scatter_unique_sorted_500k_rows": sc_unique_scatter,
    "gather_row4_int32_2M": g_row4_int32_2m,
    "gather_mixed_f32x8+bf16x16_2M": g_mixed_f8_bf16_2m,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    for nm in names:
        try:
            bench(nm, ALL[nm])
        except Exception as e:  # noqa: BLE001
            print(f"{nm:55s} FAILED: {type(e).__name__}: {e}")
