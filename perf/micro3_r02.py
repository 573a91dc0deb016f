"""Micros 3: honest transpose costs (pallas-sum consumer), scalar scatters,
pallas transpose kernel, counting-merge searchsorted replacement."""

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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 1 << 21
N = 500_000

rng = np.random.default_rng(0)
A8 = jnp.asarray(rng.standard_normal((K, 8), dtype=np.float32))
A16 = jnp.asarray(
    rng.standard_normal((K, 16), dtype=np.float32)).astype(jnp.bfloat16)
GIDX = jnp.asarray(rng.integers(0, N, K).astype(np.int32))
TBL8 = jnp.asarray(rng.standard_normal((N + 1, 8), dtype=np.float32))
TBL16 = jnp.asarray(
    rng.standard_normal((N + 1, 16), dtype=np.float32)).astype(jnp.bfloat16)


def timeit(name, fn, args, iters=8):
    @functools.partial(jax.jit, static_argnums=(1,))
    def loop(args, n):
        def body(i, carry):
            args, acc = carry
            a2, s = fn(args, acc)
            return a2, acc + s * 1e-20
        return jax.lax.fori_loop(0, n, body, (args, 0.0))[1]

    float(loop(args, 1))
    t0 = time.time(); float(loop(args, 1)); t1 = time.time()
    float(loop(args, 1 + iters))
    t2 = time.time(); float(loop(args, 1 + iters)); t3 = time.time()
    ms = ((t3 - t2) - (t1 - t0)) / iters * 1e3
    print(f"{name:55s} {ms:9.2f} ms")
    return ms


def dep(x, acc):
    return x + (jnp.sin(acc) * 1e-20).astype(x.dtype)


# Pallas "sum consumer" forces a materialized layout at the interface.
def _sum_kernel(x_ref, o_ref):
    o_ref[0, 0] = jnp.sum(x_ref[:].astype(jnp.float32))


def psum_consume(x):
    blk = 1 << 17
    if x.shape[0] > x.shape[1]:  # row-major [K, C]
        grid = (x.shape[0] // blk,)
        spec = pl.BlockSpec((blk, x.shape[1]), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    else:
        grid = (x.shape[1] // blk,)
        spec = pl.BlockSpec((x.shape[0], blk), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    parts = pl.pallas_call(
        _sum_kernel,
        grid=grid,
        in_specs=[spec],
        out_specs=pl.BlockSpec((1, 1), lambda i: (i, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((grid[0], 1), jnp.float32),
    )(x)
    return jnp.sum(parts)


def t_gather_rowmajor():
    def step(args, acc):
        t8, t16, idx = args
        a = dep(t8, acc)[idx]
        b = t16[idx]
        return args, psum_consume(a) + psum_consume(b)
    return step, (TBL8, TBL16, GIDX)


def t_gather_transposed():
    def step(args, acc):
        t8, t16, idx = args
        a = dep(t8, acc)[idx].T + 0.0
        b = t16[idx].T
        return args, psum_consume(a) + psum_consume(b)
    return step, (TBL8, TBL16, GIDX)


def t_xla_transpose_only():
    def step(args, acc):
        a8, a16 = args
        return args, psum_consume(dep(a8, acc).T) + psum_consume(a16.T)
    return step, (A8, A16)


# --- Pallas transpose kernel: [K, C] -> [C, K] ---------------------------
def _tr_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:].T


def pallas_transpose(x, blk=1 << 14):
    k, c = x.shape
    return pl.pallas_call(
        _tr_kernel,
        grid=(k // blk,),
        in_specs=[pl.BlockSpec((blk, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((c, blk), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, k), x.dtype),
    )(x)


def t_pallas_transpose():
    def step(args, acc):
        a8, a16 = args
        return args, (psum_consume(pallas_transpose(dep(a8, acc))) +
                      psum_consume(pallas_transpose(a16)))
    return step, (A8, A16)


# --- scalar unique sorted scatter ----------------------------------------
def t_scatter_scalar_unique():
    pos = jnp.asarray(np.sort(rng.choice(K, N, replace=False)).astype(np.int32))
    vals = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    def step(args, acc):
        pos, vals = args
        z = jnp.zeros((K,), jnp.float32)
        out = z.at[pos].set(dep(vals, acc), mode="drop", unique_indices=True,
                            indices_are_sorted=True)
        return args, jnp.sum(out[:8])
    return step, (pos, vals)


def t_scatter_int_unique():
    pos = jnp.asarray(np.sort(rng.choice(K, N, replace=False)).astype(np.int32))
    vals = jnp.asarray(rng.integers(0, 1000, N).astype(np.int32))
    def step(args, acc):
        pos, vals = args
        z = jnp.zeros((K,), jnp.int32)
        out = z.at[pos].set(vals + (acc * 1e-20).astype(jnp.int32),
                            mode="drop", unique_indices=True,
                            indices_are_sorted=True)
        return args, jnp.cumsum(out)[-1].astype(jnp.float32)
    return step, (pos, vals)


# --- counting-merge searchsorted (iota queries into sorted cum) ----------
CUM = jnp.asarray(np.sort(rng.integers(0, K, N)).astype(np.int32))


def t_merge_searchsorted():
    def step(args, acc):
        cum, = args
        cum = cum + (acc * 1e-20).astype(jnp.int32)
        keys = jnp.concatenate([cum * 2, jnp.arange(K, dtype=jnp.int32) * 2 + 1])
        tags = jnp.concatenate([
            jnp.zeros((N,), jnp.int32), jnp.ones((K,), jnp.int32)])
        sk, st = jax.lax.sort((keys, tags), num_keys=1)
        isq = st
        rankq = jnp.cumsum(isq) - isq
        res = jnp.arange(N + K, dtype=jnp.int32) - rankq
        ck = jnp.where(isq == 1, rankq, jnp.int32(K + N))
        _, res_sorted = jax.lax.sort((ck, res), num_keys=1)
        out = res_sorted[:K]
        return args, jnp.sum(out[:8]).astype(jnp.float32)
    return step, (CUM,)


def t_xla_searchsorted_control():
    slot = jnp.arange(K, dtype=jnp.int32)
    def step(args, acc):
        cum, = args
        g = jnp.searchsorted(cum + (acc * 1e-20).astype(jnp.int32), slot,
                             side="right", method="sort")
        return args, jnp.sum(g[:8]).astype(jnp.float32)
    return step, (CUM,)


ALL = {
    "gather_mixed_rowmajor_psum": t_gather_rowmajor,
    "gather_mixed_transposed_psum": t_gather_transposed,
    "xla_transpose_only_psum": t_xla_transpose_only,
    "pallas_transpose_both": t_pallas_transpose,
    "scatter_scalar_unique_sorted_500k_2M": t_scatter_scalar_unique,
    "scatter_int_unique_sorted_500k_2M": t_scatter_int_unique,
    "merge_searchsorted_iota_queries": t_merge_searchsorted,
    "xla_searchsorted_control": t_xla_searchsorted_control,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    for nm in names:
        try:
            timeit(nm, *[(ALL[nm]())][0])
        except Exception as e:  # noqa: BLE001
            print(f"{nm:55s} FAILED: {type(e).__name__}: {e}")
