"""Micro-measurements for the round-2 binning/gather redesign."""

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

K = 1 << 21
N = 500_000


def timeit(name, fn, args, iters=8):
    @functools.partial(jax.jit, static_argnums=(1,))
    def loop(args, n):
        def body(i, carry):
            args, acc = carry
            s = fn(args, acc)
            return args, acc + s * 1e-20
        return jax.lax.fori_loop(0, n, body, (args, 0.0))[1]

    float(loop(args, 1))
    t0 = time.time(); float(loop(args, 1)); t1 = time.time()
    float(loop(args, 1 + iters))
    t2 = time.time(); float(loop(args, 1 + iters)); t3 = time.time()
    ms = ((t3 - t2) - (t1 - t0)) / iters * 1e3
    print(f"{name:55s} {ms:9.2f} ms", flush=True)
    return ms


def dep(x, acc):
    return x + (jnp.sin(acc) * 1e-20).astype(x.dtype)


def depi(x, acc):
    # acc is a runtime float; & 1 of its int cast cannot be constant-folded.
    return x + (acc.astype(jnp.int32) & 1)


def main():
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(K).astype(np.int32))
    vals = jnp.asarray(rng.integers(0, K, K).astype(np.int32))
    xf = jnp.asarray(rng.normal(size=(K, 8)).astype(np.float32))
    xa = jnp.asarray(rng.normal(size=(K, 16)).astype(np.float32)).astype(jnp.bfloat16)
    cf = jnp.asarray(rng.normal(size=(8, K)).astype(np.float32))
    ca = jnp.asarray(rng.normal(size=(16, K)).astype(np.float32)).astype(jnp.bfloat16)

    # transposes
    timeit("transpose [K,8]f32 -> [8,K]", lambda a, acc: jnp.sum(dep(a[0], acc).T * cf),
           (xf,))
    timeit("transpose [8,K]f32 -> [K,8]", lambda a, acc: jnp.sum(dep(a[0], acc).T * xf),
           (cf,))
    timeit("transpose [16,K]bf16 -> [K,16]",
           lambda a, acc: jnp.sum((dep(a[0].astype(jnp.float32), acc).astype(jnp.bfloat16).T * xa).astype(jnp.float32)),
           (ca,))

    # unique unsorted scatter: invert a permutation
    def inv_scatter(a, acc):
        p = depi(a[0], acc)
        out = jnp.zeros((K,), jnp.int32).at[p].set(
            jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)[:, 0],
            unique_indices=True, mode="drop")
        return jnp.sum(out).astype(jnp.float32)
    # timeit("unique unsorted scatter-set int32 K->K", inv_scatter, (perm,))  # pathological: hangs/serializes

    # unique SORTED scatter (boundary deltas): 500k sorted unique positions
    pos = jnp.asarray(np.sort(rng.choice(K, N, replace=False)).astype(np.int32))
    deltas8 = jnp.asarray(rng.normal(size=(N, 8)).astype(np.float32))

    def bnd_scatter8(a, acc):
        d = dep(a[0], acc)
        z = jnp.zeros((K, 8), jnp.float32).at[pos].add(
            d, unique_indices=True, indices_are_sorted=True, mode="drop")
        return jnp.sum(z)
    timeit("sorted unique scatter-add [N,8] -> [K,8]", bnd_scatter8, (deltas8,))

    def bnd_scatter1(a, acc):
        d = dep(a[0], acc)
        z = jnp.zeros((K,), jnp.float32).at[pos].add(
            d[:, 0], unique_indices=True, indices_are_sorted=True, mode="drop")
        return jnp.sum(z)
    timeit("sorted unique scatter-add [N] -> [K]", bnd_scatter1, (deltas8,))

    # row cumsum int32 [K, 8]
    xi = jnp.asarray(rng.integers(0, 3, (K, 8)).astype(np.int32))
    def cums(a, acc):
        x = a[0]
        xb = x.reshape(K // 512, 512, 8)
        inner = jnp.cumsum(xb, axis=1)
        tot = inner[:, -1]
        prefix = jnp.cumsum(tot, axis=0) - tot
        return jnp.sum(inner + prefix[:, None, :]).astype(jnp.float32) + acc * 0
    timeit("blocked cumsum [K,8] int32", cums, (xi,))

    # real-cotangent reorder gather (rows8 f32 + rows16 bf16)
    def reorder(a, acc):
        f, b = a
        f = dep(f, acc)
        return jnp.sum(f[perm]) + jnp.sum(b[perm].astype(jnp.float32))
    timeit("reorder gather rows8 f32 + rows16 bf16 [K]", reorder, (xf, xa))

    # 2- vs 3-operand sort
    def sort2(a, acc):
        k, v = a
        k = depi(k, acc)
        ks, vs = jax.lax.sort((k, v), num_keys=1)
        return (jnp.sum(ks) + jnp.sum(vs)).astype(jnp.float32)
    timeit("lax.sort 2-operand [K]", sort2, (vals, perm))

    def sort3(a, acc):
        k, v = a
        k = depi(k, acc)
        ks, vs, ws = jax.lax.sort((k, v, v), num_keys=1)
        return (jnp.sum(ks) + jnp.sum(vs) + jnp.sum(ws)).astype(jnp.float32)
    timeit("lax.sort 3-operand [K]", sort3, (vals, perm))

    # searchsorted method='sort' (the current slot->gaussian map)
    cum = jnp.asarray(np.sort(rng.integers(0, K, N)).astype(np.int32))
    slot = jnp.arange(K, dtype=jnp.int32)
    def ss(a, acc):
        c = depi(a[0], acc)
        r = jnp.searchsorted(c, slot, side="right", method="sort")
        return jnp.sum(r).astype(jnp.float32)
    timeit("searchsorted 'sort' N-table K-queries", ss, (cum,))

    # row-8 gather [N rows from K-table] (the rec gather replacement target)
    tbl = jnp.asarray(rng.normal(size=(N, 8)).astype(np.float32))
    gidx = jnp.asarray(rng.integers(0, N, K).astype(np.int32))
    def recg(a, acc):
        t = dep(a[0], acc)
        return jnp.sum(t[gidx])
    timeit("row8 gather K rows from [N,8]", recg, (tbl,))


if __name__ == "__main__":
    main()
